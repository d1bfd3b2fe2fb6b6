"""Shared-bank VQ == per-stream-gather VQ (exact same selection)."""

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.models.phone_extractor import vq_knn_smooth, vq_knn_smooth_bank


def test_bank_vq_matches_gather_vq():
    rng = np.random.default_rng(0)
    s, k, c, b, t = 5, 64, 32, 6, 3
    bank = jnp.asarray(rng.standard_normal((s, k, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    phone = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    n = jnp.asarray(rng.integers(0, 9, b), jnp.int32)

    gathered = bank[idx]  # [B, K, C]
    want = vq_knn_smooth(phone, gathered, n)
    got = vq_knn_smooth_bank(phone, bank, idx, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_bank_vq_bf16_inputs():
    rng = np.random.default_rng(1)
    bank = jnp.asarray(rng.standard_normal((3, 32, 16)), jnp.bfloat16)
    idx = jnp.asarray([0, 2], jnp.int32)
    phone = jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32)
    out = vq_knn_smooth_bank(phone, bank, idx, jnp.asarray([4, 0]))
    assert out.shape == (2, 1, 16)
    assert bool(jnp.all(jnp.isfinite(out)))
    # n=0 stream passes through
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(phone[1]), atol=1e-6)
