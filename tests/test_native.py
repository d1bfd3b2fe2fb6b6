"""Native host-edge library vs NumPy fallback vs the JAX resampler."""

import subprocess
import sys
import threading
import os

import numpy as np
import pytest

from beatrice_vst_tpu.native import (
    HostResampler,
    Reblocker,
    SpscRing,
    native_available,
)

NATIVE = native_available()


def _build_if_missing():
    if not NATIVE:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["make", "-C", os.path.join(root, "native")], check=False)


_build_if_missing()


@pytest.mark.parametrize("force_numpy", [True] + ([False] if NATIVE else []))
def test_resampler_sine(force_numpy):
    rs = HostResampler(44100, 48000, force_numpy=force_numpy)
    assert (rs.L, rs.M) == (160, 147)
    t = np.arange(22050) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = []
    for i in range(0, len(x), 441):
        out.append(rs.process(x[i:i + 441]))
    y = np.concatenate(out)
    assert abs(len(y) - len(x) * 160 / 147) < 4
    # skip edges, compare against ideal (the stream is delayed by
    # k_fwd * L / M output samples)
    delay = 0
    ty = (np.arange(len(y)) - delay) / 48000
    ideal = np.sin(2 * np.pi * 440 * (ty - _stream_delay(rs)))
    err = np.abs(y[2000:-2000] - ideal[2000:-2000])
    assert err.max() < 0.02, err.max()


def _stream_delay(rs):
    # native + numpy paths share the design: k_fwd input samples of delay
    from beatrice_vst_tpu.ops.resample import design_polyphase

    _, _, k_fwd = design_polyphase(rs.L, rs.M, 16, 0.99)
    return k_fwd / 44100


@pytest.mark.skipif(not NATIVE, reason="native library not built")
def test_native_matches_numpy_resampler():
    rn = HostResampler(48000, 16000, force_numpy=False)
    rp = HostResampler(48000, 16000, force_numpy=True)
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.standard_normal(480).astype(np.float32)
        yn = rn.process(x)
        yp = rp.process(x)
        assert len(yn) == len(yp)
        np.testing.assert_allclose(yn, yp, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not NATIVE, reason="native library not built")
def test_native_matches_jax_resampler():
    """The native edge resampler and the TPU-side JAX one implement the
    same filter design; a 48k->16k stream must agree closely."""
    import jax.numpy as jnp
    from beatrice_vst_tpu.ops.resample import input_resampler_48k_to_16k

    rs_jax = input_resampler_48k_to_16k()
    rn = HostResampler(48000, 16000, force_numpy=False)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4800).astype(np.float32)
    state = rs_jax.init_state(())
    jax_out = []
    for b in range(10):
        y, state = rs_jax.apply_block(jnp.asarray(x[b * 480:(b + 1) * 480]), state)
        jax_out.append(np.asarray(y))
    yj = np.concatenate(jax_out)
    yn = rn.process(x)
    n = min(len(yj), len(yn))
    np.testing.assert_allclose(yn[:n], yj[:n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("force_numpy", [True] + ([False] if NATIVE else []))
def test_reblocker(force_numpy):
    rb = Reblocker(480, force_numpy=force_numpy)
    x = np.arange(1000, dtype=np.float32)
    out1 = rb.push(x[:300])
    assert len(out1) == 0
    out2 = rb.push(x[300:700])
    assert len(out2) == 480
    np.testing.assert_array_equal(out2, x[:480])
    out3 = rb.push(x[700:1000])
    assert len(out3) == 480
    np.testing.assert_array_equal(out3, x[480:960])


@pytest.mark.parametrize("force_numpy", [True] + ([False] if NATIVE else []))
def test_spsc_ring_threaded(force_numpy):
    ring = SpscRing(1 << 12, force_numpy=force_numpy)
    n = 100_000
    src = np.arange(n, dtype=np.float32)
    got = []

    def producer():
        i = 0
        while i < n:
            w = ring.write(src[i:i + 1024])
            i += w

    def consumer():
        total = 0
        while total < n:
            out = ring.read(1024)
            if len(out):
                got.append(out)
                total += len(out)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    result = np.concatenate(got)
    np.testing.assert_array_equal(result, src)
