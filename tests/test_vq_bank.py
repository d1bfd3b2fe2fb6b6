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


def test_shared_vq_matches_gather_vq():
    from beatrice_vst_tpu.models.phone_extractor import vq_knn_smooth_shared

    rng = np.random.default_rng(2)
    s, k, c, b = 5, 64, 32, 6
    bank = jnp.asarray(rng.standard_normal((s, k, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    phone = jnp.asarray(rng.standard_normal((b, 1, c)), jnp.float32)
    n = jnp.asarray(rng.integers(0, 9, b), jnp.int32)

    want = vq_knn_smooth(phone, bank[idx], n)
    got = vq_knn_smooth_shared(phone, bank, idx, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shared_vq_int8_scales_match_gather_int8():
    from beatrice_vst_tpu.models.layers import quantize_rows
    from beatrice_vst_tpu.models.phone_extractor import vq_knn_smooth_shared

    rng = np.random.default_rng(3)
    s, k, c, b = 4, 64, 32, 8
    bank_f = jnp.asarray(rng.standard_normal((s, k, c)), jnp.float32)
    q, scale = quantize_rows(bank_f)
    idx = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    phone = jnp.asarray(rng.standard_normal((b, 1, c)), jnp.float32)
    n = jnp.asarray(rng.integers(0, 9, b), jnp.int32)

    want = vq_knn_smooth(phone, q[idx], n, codebook_scale=scale[idx])
    got = vq_knn_smooth_shared(phone, q, idx, n, codebook_scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_shared_vq_zero_neighbors_passthrough():
    from beatrice_vst_tpu.models.phone_extractor import vq_knn_smooth_shared

    rng = np.random.default_rng(4)
    bank = jnp.asarray(rng.standard_normal((3, 32, 16)), jnp.bfloat16)
    phone = jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32)
    out = vq_knn_smooth_shared(phone, bank, jnp.asarray([0, 2], jnp.int32),
                               jnp.asarray([4, 0]))
    assert out.shape == (2, 1, 16)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(phone[1]),
                               atol=1e-6)


def test_shared_vq_int8_query_matches_when_margins_clear():
    """int8_query only re-quantizes the *ranking* inputs; with clear
    nearest-neighbor margins the selection (and thus the output, up to
    the shared int8-bank rounding) is identical to the bf16 ranking."""
    from beatrice_vst_tpu.models.layers import quantize_rows
    from beatrice_vst_tpu.models.phone_extractor import vq_knn_smooth_shared

    rng = np.random.default_rng(6)
    s, k, c, b = 3, 32, 16, 6
    bank_f = jnp.asarray(rng.standard_normal((s, k, c)) * 2.0, jnp.float32)
    q, scale = quantize_rows(bank_f)
    idx = jnp.asarray(rng.integers(0, s, b), jnp.int32)
    # queries sit right next to specific entries: margins >> quantization
    target = rng.integers(0, k, b)
    phone = bank_f[idx, target][:, None, :] * 1.02
    n = jnp.asarray([1, 2, 3, 1, 2, 0], jnp.int32)

    base = vq_knn_smooth_shared(phone, q, idx, n, codebook_scale=scale)
    got = vq_knn_smooth_shared(phone, q, idx, n, codebook_scale=scale,
                               int8_query=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-2, atol=1e-2)
