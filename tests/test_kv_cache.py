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


def test_engine_refreshes_cache_on_speaker_change():
    cap = 2
    cfg = EngineConfig.realtime(cap, V20RC0)
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
