"""KV projection cache: cached attention == on-the-fly attention, and the
engine refreshes the cache on speaker-control events."""

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import chain, waveform_generator
from beatrice_vst_tpu.models.chain import VoiceConverterConfig
from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
from beatrice_vst_tpu.speakers import bank as bank_mod


def test_cached_equals_uncached_chain():
    cfg = VoiceConverterConfig.for_version(V20RC0)
    params = chain.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 4
    audio = jnp.asarray(rng.standard_normal((b, t * 160)) * 0.1, jnp.float32)
    cond = chain.default_cond(cfg, (b,))
    kv = jnp.asarray(rng.standard_normal((b, 384, 128)) * 0.1, jnp.float32)
    cond["kv"] = kv
    cond["codebook"] = jnp.asarray(rng.standard_normal((b, 512, 128)), jnp.float32)
    out_raw, _ = chain.apply(params, cfg, audio, chain.init_state(cfg, (b,)), cond)

    cond2 = dict(cond)
    del cond2["kv"]
    cache = waveform_generator.project_kv(params["wg"], cfg.wg, kv)
    cond2["kv_cache"] = cache
    out_cached, _ = chain.apply(params, cfg, audio, chain.init_state(cfg, (b,)), cond2)
    np.testing.assert_allclose(
        np.asarray(out_cached), np.asarray(out_raw), rtol=1e-5, atol=1e-6
    )

    # int8-quantized cache stays close to the f32 path (per-row scales)
    from beatrice_vst_tpu.models.layers import quantize_rows

    qcache = {}
    for name in ("k", "v"):
        q, s = quantize_rows(cache[name])
        qcache[name] = q
        qcache[f"{name}_scale"] = s
    cond3 = dict(cond2)
    cond3["kv_cache"] = qcache
    out_q, _ = chain.apply(params, cfg, audio, chain.init_state(cfg, (b,)), cond3)
    err = np.abs(np.asarray(out_q) - np.asarray(out_raw))
    assert err.max() < 0.05, err.max()  # bounded quantization deviation


def test_slots_attention_equals_cached():
    """cross_attention_slots == cross_attention_cached with gathered K/V."""
    from beatrice_vst_tpu.models import layers

    rng = np.random.default_rng(5)
    b, t, hdim, z, ell, a = 6, 1, 32, 7, 24, 16
    p = layers.cross_attention_init(jax.random.PRNGKey(0), hdim, 16, a)
    x = jnp.asarray(rng.standard_normal((b, t, hdim)), jnp.float32)
    k_z = jnp.asarray(rng.standard_normal((z, ell, a)), jnp.float32)
    v_z = jnp.asarray(rng.standard_normal((z, ell, a)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, z, b), jnp.int32)
    onehot = jax.nn.one_hot(slot, z, dtype=jnp.float32)

    want = layers.cross_attention_cached(p, x, k_z[slot], v_z[slot])
    got = layers.cross_attention_slots(p, x, k_z, v_z, onehot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_engine_slots_mode_equals_per_stream_mode():
    """Whole-engine equivalence: slots mode == per-stream cache mode for
    direct speakers AND a morphing stream with an available slot."""
    cap = 4
    params = chain.init(jax.random.PRNGKey(0), EngineConfig.realtime(cap, V20RC0).model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((cap, 480)) * 0.1, jnp.float32)

    outs = {}
    for mode in ("per_stream", "slots"):
        cfg = EngineConfig.realtime(cap, V20RC0)
        import dataclasses
        cfg = dataclasses.replace(cfg, kv_cache_mode=mode, n_morph_slots=2)
        eng = StreamEngine(cfg, params, bank, jit=False)
        for _ in range(cap):
            eng.admit()
        eng.set_control(0, "target_speaker", np.int32(1))
        eng.set_control(1, "target_speaker", np.int32(2))
        # stream 2: morph mode over speakers 0/1
        w = np.zeros(256, np.float32)
        w[0], w[1] = 0.6, 0.4
        eng.set_control(2, "morph_weights", w)
        eng.set_control(2, "morph_top_idx",
                        np.asarray([0, 1, 0, 0, 0, 0, 0, 0], np.int32))
        eng.set_control(2, "target_speaker", np.int32(3))  # == n -> morph
        out = eng.tick(x)
        out = eng.tick(x)
        outs[mode] = np.asarray(out)
    np.testing.assert_allclose(outs["slots"], outs["per_stream"],
                               rtol=1e-4, atol=1e-5)


def test_slot_exhaustion_falls_back_to_dominant_speaker():
    import dataclasses
    cap = 3
    cfg = EngineConfig.realtime(cap, V20RC0)
    cfg = dataclasses.replace(cfg, kv_cache_mode="slots", n_morph_slots=1)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 3)
    eng = StreamEngine(cfg, params, bank, jit=False)
    for _ in range(cap):
        eng.admit()
    w = np.zeros(256, np.float32)
    w[1], w[2] = 0.7, 0.3
    for s in (0, 1):
        eng.set_control(s, "morph_weights", w)
        eng.set_control(s, "morph_top_idx",
                        np.asarray([1, 2, 0, 0, 0, 0, 0, 0], np.int32))
        eng.set_control(s, "target_speaker", np.int32(3))
    eng.flush_controls()
    slots = np.asarray(eng.state["controls"]["kv_slot"])
    n = 3
    # first morph stream got the only slot; second fell back to dominant
    # morph speaker (base slot 1)
    assert slots[0] == n + 0, slots
    assert slots[1] == 1, slots
    # leaving morph mode releases the slot for others
    eng.set_control(0, "target_speaker", np.int32(1))
    eng.set_control(1, "target_speaker", np.int32(3))
    eng.flush_controls()
    slots = np.asarray(eng.state["controls"]["kv_slot"])
    assert slots[1] == n + 0, slots


def test_engine_refreshes_cache_on_speaker_change():
    import dataclasses
    cap = 2
    cfg = EngineConfig.realtime(cap, V20RC0)
    cfg = dataclasses.replace(cfg, kv_cache_mode="per_stream")
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 4)
    eng = StreamEngine(cfg, params, bank, jit=False)
    idx = eng.admit()
    eng.flush_controls()
    k0 = np.asarray(eng.state["kv_cache"]["k"][idx])
    assert np.abs(k0).max() > 0  # admit primed the cache
    # changing speaker refreshes the slot with different projections
    eng.set_control(idx, "target_speaker", np.int32(2))
    eng.flush_controls()
    k1 = np.asarray(eng.state["kv_cache"]["k"][idx])
    assert not np.allclose(k0, k1)
    # the other slot (never admitted) stays zero
    other = 1 - idx
    assert np.abs(np.asarray(eng.state["kv_cache"]["k"][other])).max() == 0


def test_slots_q8_close_to_slots_f32():
    """int8 slot attention (int8 bank + int8 MXU dots) stays within the
    quantization envelope of the exact slots path."""
    from beatrice_vst_tpu.models import layers
    from beatrice_vst_tpu.models.layers import quantize_rows

    rng = np.random.default_rng(7)
    b, t, hdim, z, ell, a = 8, 1, 64, 5, 48, 32
    p = layers.cross_attention_init(jax.random.PRNGKey(2), hdim, 16, a)
    x = jnp.asarray(rng.standard_normal((b, t, hdim)), jnp.float32)
    k_z = jnp.asarray(rng.standard_normal((z, ell, a)), jnp.float32)
    v_z = jnp.asarray(rng.standard_normal((z, ell, a)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, z, b), jnp.int32)
    onehot = jax.nn.one_hot(slot, z, dtype=jnp.float32)

    want = np.asarray(layers.cross_attention_slots(p, x, k_z, v_z, onehot))
    k8, ks = quantize_rows(k_z)
    v8, vs = quantize_rows(v_z)
    got = np.asarray(
        layers.cross_attention_slots_q8(p, x, k8, ks, v8, vs, onehot)
    )
    # attention output enters via a residual add; bound the deviation of
    # the residual contribution relative to its own magnitude
    resid_want = want - np.asarray(x)
    resid_got = got - np.asarray(x)
    denom = max(np.abs(resid_want).max(), 1e-6)
    assert np.abs(resid_got - resid_want).max() / denom < 0.05


def test_engine_quantized_slots_close_to_exact_slots():
    """Whole-engine: bf16 + int8 slot bank ~= bf16 exact slot bank,
    including a morph stream writing a leased int8 slot."""
    import dataclasses

    cap = 3
    base_cfg = EngineConfig.realtime(cap, V20RC0, compute_dtype="bfloat16")
    params = chain.init(jax.random.PRNGKey(0), base_cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((cap, 480)) * 0.1, jnp.float32)

    outs = {}
    for quant in (False, True):
        cfg = dataclasses.replace(base_cfg, quantize_kv_cache=quant,
                                  n_morph_slots=2)
        eng = StreamEngine(cfg, params, bank, jit=False)
        for _ in range(cap):
            eng.admit()
        eng.set_control(0, "target_speaker", np.int32(1))
        w = np.zeros(256, np.float32)
        w[0], w[1] = 0.5, 0.5
        eng.set_control(1, "morph_weights", w)
        eng.set_control(1, "morph_top_idx",
                        np.asarray([0, 1, 0, 0, 0, 0, 0, 0], np.int32))
        eng.set_control(1, "target_speaker", np.int32(3))
        out = eng.tick(x)
        out = eng.tick(x)
        outs[quant] = np.asarray(out)
    assert np.isfinite(outs[True]).all()
    err = np.abs(outs[True] - outs[False]).max()
    ref = np.abs(outs[False]).max()
    assert err < 0.1 * max(ref, 1e-3), (err, ref)
