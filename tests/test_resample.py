"""Resampler: rational ratio math, sine fidelity, streaming == offline."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.resample import (
    Resampler,
    compute_simple_fraction,
    input_resampler_48k_to_16k,
    make_resampler,
    output_resampler_24k_to_48k,
    rational_rate_ratio,
)


def test_simple_fraction_matches_reference_behavior():
    # Stern-Brocot with numer/denom < 1000 (resample.h:25-46)
    assert compute_simple_fraction(48000 / 16000) == (3, 1)
    assert compute_simple_fraction(48000 / 44100) == (160, 147)
    assert compute_simple_fraction(44100 / 48000) == (147, 160)
    n, d = compute_simple_fraction(np.pi)
    assert n < 1000 and d < 1000
    assert abs(n / d - np.pi) < 1e-4


def test_rational_rate_ratio():
    assert rational_rate_ratio(48000, 16000) == (1, 3)
    assert rational_rate_ratio(24000, 48000) == (2, 1)
    assert rational_rate_ratio(44100, 48000) == (160, 147)


def _sine(rate, freq, seconds, dtype=np.float32):
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * freq * t).astype(dtype)


def _check_sine_through(rs: Resampler, rate_in, rate_out, freq, tol_amp=0.02):
    x = _sine(rate_in, freq, 0.5)
    y = np.asarray(rs.apply_offline(jnp.asarray(x)))
    # compare against an ideal sine at the output rate (skip filter edges)
    t = (np.arange(len(y)) + rs.offline_time_offset) / rate_out
    ideal = np.sin(2 * np.pi * freq * t)
    skip = rs.taps * 4
    err = y[skip:-skip] - ideal[skip:len(y) - skip]
    assert np.max(np.abs(err)) < tol_amp, np.max(np.abs(err))


def test_downsample_48k_to_16k_sine():
    _check_sine_through(input_resampler_48k_to_16k(), 48000, 16000, 440.0)


def test_upsample_24k_to_48k_sine():
    _check_sine_through(output_resampler_24k_to_48k(), 24000, 48000, 1000.0)


def test_fractional_44100_to_48000_sine():
    rs = make_resampler(44100, 48000, in_block=147 * 4)
    _check_sine_through(rs, 44100, 48000, 440.0)


def test_antialiasing_attenuates_out_of_band():
    # 7 kHz tone must be strongly attenuated when downsampling to 16 kHz
    # ... 7 kHz < 8k Nyquist; use 10 kHz which must alias-cut to ~0
    rs = input_resampler_48k_to_16k()
    x = _sine(48000, 10000.0, 0.25)
    y = np.asarray(rs.apply_offline(jnp.asarray(x)))
    assert np.max(np.abs(y[200:-200])) < 0.05


def test_streaming_equals_offline():
    rs = input_resampler_48k_to_16k()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 480 * 20)).astype(np.float32)
    state = rs.init_state((2,))
    outs = []
    for b in range(20):
        y, state = rs.apply_block(jnp.asarray(x[:, b * 480:(b + 1) * 480]), state)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs, axis=1)
    big = Resampler(rs.L, rs.M, 480 * 20, rs.taps, rs.cutoff)
    whole, _ = big.apply_block(jnp.asarray(x), big.init_state((2,)))
    np.testing.assert_allclose(stream, np.asarray(whole), rtol=1e-5, atol=1e-5)


def test_block_shapes():
    rs = input_resampler_48k_to_16k(n_frames=2)
    assert rs.in_block == 960 and rs.out_block == 320
    ru = output_resampler_24k_to_48k(n_frames=2)
    assert ru.in_block == 480 and ru.out_block == 960


def test_roundtrip_16k_contract():
    """48k in -> 16k model rate -> (identity model) -> 24k? Full contract is
    exercised in the engine tests; here check 480 -> 160 and 240 -> 480."""
    rs_in = input_resampler_48k_to_16k()
    rs_out = output_resampler_24k_to_48k()
    x = jnp.zeros((3, 480))
    y, _ = rs_in.apply_block(x, rs_in.init_state((3,)))
    assert y.shape == (3, 160)
    z, _ = rs_out.apply_block(jnp.zeros((3, 240)), rs_out.init_state((3,)))
    assert z.shape == (3, 480)


def test_dense_chunking_matches_monolithic_matrix():
    """Large blocks chunk the dense matmul into shift-invariant sub-block
    windows (compile-request size cliff at frames_per_tick>1); outputs
    and history must match the monolithic banded matrix."""
    import jax.numpy as jnp

    from beatrice_vst_tpu.ops.resample import (Resampler,
                                               input_resampler_48k_to_16k,
                                               output_resampler_24k_to_48k)

    rng = np.random.default_rng(0)
    for mk in (input_resampler_48k_to_16k, output_resampler_24k_to_48k):
        rs = mk(25)
        sub = rs._dense_sub_block()
        assert sub > 0 and rs.in_block % sub == 0 and sub % rs.M == 0
        x = jnp.asarray(rng.standard_normal((2, rs.in_block)) * 0.1,
                        jnp.float32)
        h = jnp.asarray(rng.standard_normal((2, rs.history_len)) * 0.1,
                        jnp.float32)
        y_chunked, h_chunked = rs.apply_block(x, h)
        old = Resampler._DENSE_CHUNK_MAX
        Resampler._DENSE_CHUNK_MAX = 10 ** 9
        try:
            y_big, h_big = rs.apply_block(x, h)
        finally:
            Resampler._DENSE_CHUNK_MAX = old
        np.testing.assert_allclose(np.asarray(y_chunked), np.asarray(y_big),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(h_chunked),
                                      np.asarray(h_big))
    # the serving tick's fpt=1 path must stay monolithic (no chunking)
    assert input_resampler_48k_to_16k(1)._dense_sub_block() == 0
