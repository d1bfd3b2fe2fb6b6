"""Model chain: shapes, streaming step==chunk equivalence, determinism,
version variants, VQ smoothing semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import V20A2, V20B1, V20RC0
from beatrice_vst_tpu.models import chain, phone_extractor
from beatrice_vst_tpu.models.chain import VoiceConverterConfig

B, T = 2, 6


def make(spec, seed=0):
    cfg = VoiceConverterConfig.for_version(spec)
    params = chain.init(jax.random.PRNGKey(seed), cfg)
    state = chain.init_state(cfg, (B,))
    cond = chain.default_cond(cfg, (B,))
    if spec.has_kv:
        cond["kv"] = jax.random.normal(jax.random.PRNGKey(1), (B, spec.kv_length, spec.kv_channels)) * 0.1
        cond["codebook"] = jax.random.normal(jax.random.PRNGKey(2), (B, spec.codebook_size, spec.phone_channels))
    cond["speaker_embedding"] = jax.random.normal(jax.random.PRNGKey(3), (B, 256)) * 0.1
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((B, T * 160)) * 0.1, jnp.float32)
    return cfg, params, state, cond, audio


@pytest.mark.parametrize("spec", [V20A2, V20RC0], ids=["20a2", "20rc0"])
def test_shapes_and_finiteness(spec):
    cfg, params, state, cond, audio = make(spec)
    out, new_state = chain.apply(params, cfg, audio, state, cond)
    assert out.shape == (B, T * 240)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(jnp.abs(out) <= 1.0))
    # state shapes preserved
    jax.tree_util.tree_map(
        lambda a, b_: (_ for _ in ()).throw(AssertionError((a.shape, b_.shape)))
        if a.shape != b_.shape else None,
        state, new_state,
    )


@pytest.mark.parametrize("spec", [V20A2, V20RC0], ids=["20a2", "20rc0"])
def test_step_equals_chunk(spec):
    """Frame-by-frame streaming must equal whole-chunk processing
    (SURVEY.md test strategy #3)."""
    cfg, params, state, cond, audio = make(spec)
    chunk_out, chunk_state = chain.apply(params, cfg, audio, state, cond)
    # per-frame loop through the same state
    outs = []
    st = state
    for i in range(T):
        o, st = chain.apply(params, cfg, audio[:, i * 160:(i + 1) * 160], st, cond)
        outs.append(np.asarray(o))
    step_out = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(step_out, np.asarray(chunk_out), rtol=2e-4, atol=2e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(chunk_state), jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("spec", [V20A2, V20RC0], ids=["20a2", "20rc0"])
def test_ring_step_equals_chunk(spec):
    """The ring-buffer conv-state convention (t_index, used by the serving
    engine) must produce the same audio as the linear chunk path from the
    same zero init -- the state layouts differ but outputs must match."""
    cfg, params, state, cond, audio = make(spec)
    chunk_out, chunk_state = chain.apply(params, cfg, audio, state, cond)
    outs = []
    st = chain.init_state(cfg, (B,), ring=True)  # hop-ring audio history
    for i in range(T):
        o, st = chain.apply(
            params, cfg, audio[:, i * 160:(i + 1) * 160], st, cond,
            t_index=jnp.uint32(i),
        )
        outs.append(np.asarray(o))
    ring_out = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(ring_out, np.asarray(chunk_out), rtol=2e-4, atol=2e-5)
    # and the ring must keep working past one full revolution of the
    # longest ring (24 rows for the d=8 phone block)
    st_lin = chunk_state
    for i in range(30):
        frame = audio[:, (i % T) * 160:((i % T) + 1) * 160]
        o_ring, st = chain.apply(params, cfg, frame, st, cond,
                                 t_index=jnp.uint32(T + i))
        o_lin, st_lin = chain.apply(params, cfg, frame, st_lin, cond)
        # ring vs linear are the same math but differently fused programs;
        # tolerance covers f32 accumulation-order drift over 30 frames
        np.testing.assert_allclose(
            np.asarray(o_ring), np.asarray(o_lin), rtol=2e-4, atol=6e-5
        )


def test_scan_equals_chunk():
    cfg, params, state, cond, audio = make(V20RC0)
    chunk_out, _ = chain.apply(params, cfg, audio, state, cond)
    scan_out, _ = chain.scan_frames(params, cfg, audio, state, cond)
    np.testing.assert_allclose(
        np.asarray(scan_out), np.asarray(chunk_out), rtol=2e-4, atol=2e-5
    )


def test_deterministic():
    cfg, params, state, cond, audio = make(V20RC0)
    o1, _ = chain.apply(params, cfg, audio, state, cond)
    o2, _ = chain.apply(params, cfg, audio, state, cond)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_b1_matches_a2_structure():
    """20b1 is a symbol-renamed clone of 20a2 in the reference
    (SURVEY.md 2.2); our configs must agree on dims."""
    c_a = VoiceConverterConfig.for_version(V20A2)
    c_b = VoiceConverterConfig.for_version(V20B1)
    assert c_a.phone == c_b.phone and c_a.pitch == c_b.pitch and c_a.wg == c_b.wg


def test_vq_knn_smoothing():
    rng = np.random.default_rng(5)
    cb = jnp.asarray(rng.standard_normal((1, 16, 8)), jnp.float32)
    phone = cb[:, 3:4, :][:, :, :] + 0.01  # [1,1,8] near entry 3
    # n=1 -> snaps to the nearest codebook entry
    out1 = phone_extractor.vq_knn_smooth(phone, cb, jnp.asarray([1]), max_neighbors=4)
    np.testing.assert_allclose(np.asarray(out1)[0, 0], np.asarray(cb)[0, 3], atol=1e-5)
    # n=0 -> passthrough
    out0 = phone_extractor.vq_knn_smooth(phone, cb, jnp.asarray([0]), max_neighbors=4)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(phone), atol=1e-6)
    # n=4 -> mean of 4 nearest, differs from both
    out4 = phone_extractor.vq_knn_smooth(phone, cb, jnp.asarray([4]), max_neighbors=4)
    assert not np.allclose(np.asarray(out4), np.asarray(out1))


def test_pitch_range_masking():
    cfg, params, state, cond, audio = make(V20RC0)
    cond["min_q"] = jnp.asarray([100, 1])
    cond["max_q"] = jnp.asarray([110, 447])
    from beatrice_vst_tpu.models import pitch_estimator
    qp, feats, _ = pitch_estimator.apply(
        params["pitch"], cfg.pitch, audio, state["pitch"],
        cond["min_q"], cond["max_q"],
    )
    qp = np.asarray(qp)
    assert qp.shape == (B, T) and feats.shape == (B, T, 4)
    assert np.all(qp[0] >= 100) and np.all(qp[0] <= 110)


def test_phase_continuity_across_frames():
    """The harmonic source phase must be continuous at frame joins: no
    sample-to-sample jump larger than within-frame steps."""
    cfg, params, state, cond, audio = make(V20RC0)
    cond["pitch_correction"] = jnp.zeros(B)
    out, _ = chain.apply(params, cfg, audio, state, cond)
    d = np.abs(np.diff(np.asarray(out), axis=1))
    # join samples (multiples of 240) shouldn't be outliers vs global max
    joins = d[:, 239::240]
    assert joins.max() <= d.max() * 1.5 + 1e-3


def test_ring_rmajor_layout_equals_chunk(monkeypatch):
    """BEATRICE_RING_LAYOUT=rmajor stores ring conv states [R, B, C] with
    leading-axis row writes; same audio as the linear chunk path."""
    from beatrice_vst_tpu.models import layers

    monkeypatch.setenv("BEATRICE_RING_LAYOUT", "rmajor")
    layers._ring_layout.cache_clear()
    try:
        cfg, params, state, cond, audio = make(V20RC0)
        chunk_out, _ = chain.apply(params, cfg, audio, state, cond)
        st = chain.init_state(cfg, (B,), ring=True)
        assert st["phone"]["blocks"][3].shape == (24, B, cfg.phone.hidden)
        assert st["wg"]["up"][0].shape[0] == 2  # stage-0 ring, ring-leading
        outs = []
        for i in range(T):
            o, st = chain.apply(
                params, cfg, audio[:, i * 160:(i + 1) * 160], st, cond,
                t_index=jnp.uint32(i),
            )
            outs.append(np.asarray(o))
        ring_out = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(ring_out, np.asarray(chunk_out),
                                   rtol=2e-4, atol=2e-5)
        # past a full revolution of the longest (24-row) ring
        for i in range(28):
            frame = audio[:, (i % T) * 160:((i % T) + 1) * 160]
            o, st = chain.apply(params, cfg, frame, st, cond,
                                t_index=jnp.uint32(T + i))
            assert np.isfinite(np.asarray(o)).all()
    finally:
        layers._ring_layout.cache_clear()
