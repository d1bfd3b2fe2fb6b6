"""Component-level profiling of the engine tick on the real chip.

Times each stage of the tick as its own jitted computation (sync-mode
measurement per .claude/skills/verify/SKILL.md: flip the relay to
synchronous execution with a tiny read first, then time with
block_until_ready).  Stage sums exceed the fused tick (each stage pays the
relay round trip and loses fusion), so treat the numbers as *relative*
weights plus an estimate of the per-dispatch overhead:

    overhead ~= sum(stage walls) - (n_stages - 1) * relay_rt - fused_tick
"""

import functools
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import chain, phone_extractor, pitch_estimator, waveform_generator
from beatrice_vst_tpu.ops.gain import gain_process
from beatrice_vst_tpu.ops.resample import input_resampler_48k_to_16k, output_resampler_24k_to_48k
from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
from beatrice_vst_tpu.runtime.engine import _build_cond, init_engine_state, cast_bank
from beatrice_vst_tpu.speakers import bank as bank_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])  # sync mode
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:34s} {best*1e3:8.3f} ms")
    return best, out


def main():
    spec = V20RC0
    cfg = EngineConfig.realtime(B, spec, compute_dtype="bfloat16")
    eng, _ = None, None
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 16)
    engine = StreamEngine(cfg, params, bank)
    for _ in range(B):
        engine.admit()
    state = engine.state
    bankc = engine.bank
    paramsc = engine.params
    rng = np.random.default_rng(0)
    x48 = jnp.asarray(rng.standard_normal((B, 480)) * 0.1, jnp.float32)

    # full tick (reference point; non-donating jit so state survives)
    from beatrice_vst_tpu.runtime.engine import engine_tick
    tick = jax.jit(functools.partial(engine_tick, cfg=cfg))
    t_tick, _ = timeit("full tick", tick, paramsc, bankc, state, x48)

    # empty dispatch (relay round trip)
    noop = jax.jit(lambda a: a + 1.0)
    t_noop, _ = timeit("noop dispatch (relay rt)", noop, jnp.zeros((8,), jnp.float32))

    # stages
    rs_in = input_resampler_48k_to_16k(1)
    rs_out = output_resampler_24k_to_48k(1)

    gain = jax.jit(lambda a, g, t: gain_process(a, g, t, 48000.0))
    timeit("gain ramp (in)", gain, x48, state["gain_in_db"],
           state["controls"]["input_gain_db"])

    rin = jax.jit(rs_in.apply_block)
    t_r, (x16, _) = timeit("resample 48k->16k", rin, x48, state["rs_in"])

    bc = jax.jit(lambda b, s, p: _build_cond(cfg, b, s, p))
    t_cond, cond = timeit("build_cond (gathers+lottery)", bc, bankc, state,
                          paramsc)

    pcfg = cfg.model.phone
    pe = jax.jit(lambda p, a, s: phone_extractor.apply(
        p, pcfg, a, s, compute_dtype=jnp.bfloat16))
    t_pe, (phone, _) = timeit(
        "phone extractor", pe, paramsc["phone"], x16, state["model"]["phone"])

    if "codebook_bank" in cond:
        vqf = jax.jit(lambda ph, cb, i, n, cs: phone_extractor.vq_knn_smooth_shared(
            ph, cb, i, n, codebook_scale=cs))
        t_vq, phone_s = timeit(
            "vq knn smooth (shared bank)", vqf, phone, cond["codebook_bank"],
            cond["codebook_idx"], cond["vq_num_neighbors"],
            cond.get("codebook_bank_scale"))
    elif "codebook_scale" in cond:
        vqf = jax.jit(lambda ph, cb, cs, n: phone_extractor.vq_knn_smooth(
            ph, cb, n, codebook_scale=cs))
        t_vq, phone_s = timeit("vq knn smooth", vqf, phone, cond["codebook"],
                               cond["codebook_scale"], cond["vq_num_neighbors"])
    else:
        vqf = jax.jit(phone_extractor.vq_knn_smooth)
        t_vq, phone_s = timeit("vq knn smooth", vqf, phone, cond["codebook"],
                               cond["vq_num_neighbors"])

    icfg = cfg.model.pitch
    pit = jax.jit(lambda p, a, s: pitch_estimator.apply(
        p, icfg, a, s, compute_dtype=jnp.bfloat16))
    t_pit, (qp, feats, _) = timeit(
        "pitch estimator", pit, paramsc["pitch"], x16, state["model"]["pitch"])

    wcfg = cfg.model.wg
    wg = jax.jit(lambda p, ph, q, f, spk, s, kvc: waveform_generator.apply(
        p, wcfg, ph, q, f, spk, s, None, kvc, compute_dtype=jnp.bfloat16))
    if "kv_cache" in cond:
        t_wg, (y24, _) = timeit(
            "waveform generator", wg, paramsc["wg"], phone_s,
            jnp.clip(qp, 0, wcfg.pitch_bins - 1), feats,
            cond["speaker_embedding"], state["model"]["wg"], cond["kv_cache"])
    else:
        wg = jax.jit(lambda p, ph, q, f, spk, s, kb, ks:
                     waveform_generator.apply(
                         p, wcfg, ph, q, f, spk, s, None, None,
                         compute_dtype=jnp.bfloat16, kv_bank=kb, kv_slot=ks))
        t_wg, (y24, _) = timeit(
            "waveform generator (slots)", wg, paramsc["wg"], phone_s,
            jnp.clip(qp, 0, wcfg.pitch_bins - 1), feats,
            cond["speaker_embedding"], state["model"]["wg"],
            cond["kv_bank"], cond["kv_slot"])

    rout = jax.jit(rs_out.apply_block)
    timeit("resample 24k->48k", rout, y24, state["rs_out"])

    print(f"\nnoop-adjusted stage sums vs tick: "
          f"tick={t_tick*1e3:.3f}ms  relay_rt~{t_noop*1e3:.3f}ms")


if __name__ == "__main__":
    main()
