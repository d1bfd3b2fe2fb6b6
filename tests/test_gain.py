"""Gain ramp: closed form must match the reference's sample-by-sample walk
(gain.h:41-71), reimplemented here in NumPy as the oracle."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.gain import gain_process, gain_init_state


def reference_gain(x, current_db, target_db, sample_rate):
    """Scalar NumPy port of Gain::Process (float64)."""
    db_per_ms = 2.0
    target_amp = 10.0 ** (target_db * 0.05)
    cur = 10.0 ** (current_db * 0.05)
    out = np.empty_like(x, dtype=np.float64)
    i = 0
    n = len(x)
    if cur < target_amp:
        ratio = 10.0 ** ((db_per_ms / (sample_rate * 0.001)) * 0.05)
        while i < n and cur < target_amp:
            cur = min(cur * ratio, target_amp)
            out[i] = x[i] * cur
            i += 1
    elif cur > target_amp:
        ratio = 10.0 ** ((-db_per_ms / (sample_rate * 0.001)) * 0.05)
        while i < n and cur > target_amp:
            cur = max(cur * ratio, target_amp)
            out[i] = x[i] * cur
            i += 1
    while i < n:
        out[i] = x[i] * cur
        i += 1
    return out, 20.0 * np.log10(cur)


def test_matches_reference_rising_and_falling():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2000).astype(np.float32)
    for cur_db, tgt_db in [(-12.0, 0.0), (6.0, -20.0), (0.0, 0.0), (-60.0, 20.0)]:
        ref, ref_db = reference_gain(x, cur_db, tgt_db, 48000.0)
        y, new_db = gain_process(
            jnp.asarray(x), jnp.asarray(cur_db, jnp.float32),
            jnp.asarray(tgt_db, jnp.float32), 48000.0,
        )
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(new_db), ref_db, atol=1e-3)


def test_batched_and_stateful_across_blocks():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 960)).astype(np.float32)
    cur = jnp.asarray([-10.0, 0.0, 5.0, -3.0], jnp.float32)
    tgt = jnp.asarray([0.0, -10.0, 5.0, 12.0], jnp.float32)
    # two blocks == one double-length block
    y1, s1 = gain_process(jnp.asarray(x[:, :480]), cur, tgt, 48000.0)
    y2, s2 = gain_process(jnp.asarray(x[:, 480:]), s1, tgt, 48000.0)
    yfull, sfull = gain_process(jnp.asarray(x), cur, tgt, 48000.0)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1),
        np.asarray(yfull), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sfull), atol=1e-4)


def test_init_state():
    s = gain_init_state((3,), -6.0)
    assert s.shape == (3,)
    assert np.allclose(np.asarray(s), -6.0)
