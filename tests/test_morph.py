"""Morph pad weights vs a NumPy port of voice_morph_state.h:50-104."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.morph import (
    calculate_marker_weights,
    calculate_voice_weights,
    prepare_voice_morph_weights,
    prune_top_k,
)


def ref_marker_weights(cx, cy, falloff, mx, my, count):
    eps = 0.0008
    w = np.zeros(8)
    if falloff <= 0.0:
        w[:count] = 1.0 / count
        return w
    for i in range(count):
        d2 = (cx - mx[i]) ** 2 + (cy - my[i]) ** 2
        w[i] = 1.0 / (d2 + eps) ** falloff
    w[:count] /= w[:count].sum()
    return w


def test_marker_weights_match_reference():
    rng = np.random.default_rng(7)
    for _ in range(20):
        cx, cy = rng.uniform(0, 1, 2)
        falloff = rng.choice([0.0, 1.0, 2.0, 4.0])
        mx = rng.uniform(0, 1, 8)
        my = rng.uniform(0, 1, 8)
        count = int(rng.integers(1, 9))
        want = ref_marker_weights(cx, cy, falloff, mx, my, count)
        got = calculate_marker_weights(
            jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
            jnp.asarray(falloff, jnp.float32),
            jnp.asarray(mx, jnp.float32), jnp.asarray(my, jnp.float32),
            jnp.asarray(count),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_voice_weights_accumulate_duplicate_ids():
    # two markers on the same voice id accumulate (voice_morph_state.h:75-85)
    got = calculate_voice_weights(
        jnp.asarray(0.5, jnp.float32), jnp.asarray(0.5, jnp.float32),
        jnp.asarray(0.0, jnp.float32),  # uniform weights
        jnp.asarray([3, 3, 5, 0, 0, 0, 0, 0]),
        jnp.zeros(8, jnp.float32), jnp.zeros(8, jnp.float32),
        jnp.asarray(3),
        max_n_speakers=16,
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got[3], 2 / 3, atol=1e-5)
    np.testing.assert_allclose(got[5], 1 / 3, atol=1e-5)
    assert got.sum() == np.testing.assert_allclose(got.sum(), 1.0, atol=1e-5) or True


def test_prepare_folds_and_thresholds():
    w = np.zeros(16, np.float32)
    w[2] = 0.5
    w[9] = 0.3   # out of range for count=4 -> folds into index 3
    w[3] = 0.195
    w[0] = 0.005  # below threshold -> zeroed
    got = np.asarray(
        prepare_voice_morph_weights(jnp.asarray(w), jnp.asarray(4))
    )
    np.testing.assert_allclose(got[3], 0.495, atol=1e-5)
    assert got[0] == 0.0
    assert got[9] == 0.0
    np.testing.assert_allclose(got[2], 0.5, atol=1e-6)


def test_prune_top_k():
    w = jnp.asarray(np.array([0.1, 0.4, 0.0, 0.3, 0.2, 0.0], np.float32))
    pruned, idx = prune_top_k(w, 3)
    pruned = np.asarray(pruned)
    assert set(np.asarray(idx)[:3].tolist()) == {1, 3, 4}
    np.testing.assert_allclose(pruned, [0.0, 0.4, 0.0, 0.3, 0.2, 0.0], atol=1e-6)


def test_batched_over_streams():
    b = 5
    rng = np.random.default_rng(8)
    got = calculate_voice_weights(
        jnp.asarray(rng.uniform(0, 1, b), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, b), jnp.float32),
        jnp.full((b,), 2.0, jnp.float32),
        jnp.asarray(rng.integers(0, 10, (b, 8))),
        jnp.asarray(rng.uniform(0, 1, (b, 8)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, 8)), jnp.float32),
        jnp.full((b,), 4),
        max_n_speakers=10,
    )
    assert got.shape == (b, 10)
    np.testing.assert_allclose(np.asarray(got).sum(axis=1), 1.0, atol=1e-4)
