"""Run the BASELINE.json evaluation configs on the available hardware.

  #1 Single-utterance offline voice conversion, one target speaker
  #2 Streaming frame-by-frame conversion, single stream, latency check
  #3 Pitch/formant-shift control sweep (per-frame conditioning)
  #4 Batched multi-speaker conversion: 256 concurrent streams
  #5 Multi-host: covered by scripts/multihost_smoke.py + the driver's
     dryrun_multichip (no multi-chip hardware in this environment)

Prints one JSON report.  Runs on whatever backend is default (real TPU
under axon; CPU with JAX_PLATFORMS=cpu).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beatrice_vst_tpu.constants import V20RC0
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.runtime import (
        ConversionSettings,
        EngineConfig,
        StreamEngine,
        convert_utterance,
    )
    from beatrice_vst_tpu.speakers import bank as bank_mod

    on_tpu = jax.default_backend() != "cpu"
    dtype = "bfloat16" if on_tpu else None
    report = {"device": str(jax.devices()[0])}

    cfg = chain.VoiceConverterConfig.for_version(V20RC0)
    params = chain.init(jax.random.PRNGKey(0), cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 16)

    # --- #1 offline conversion (first call compiles; second is the number) ---
    sr = 48000
    t = np.arange(sr * 2) / sr
    utt = (0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    settings1 = ConversionSettings(target_speaker=3, vq_num_neighbors=4)
    t0 = time.perf_counter()
    out = convert_utterance(params, cfg, bank, utt, sr, settings1)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = convert_utterance(params, cfg, bank, utt, sr, settings1)
    dt = time.perf_counter() - t0
    report["config1_offline"] = {
        "audio_seconds": 2.0,
        "wall_seconds": round(dt, 3),
        "compile_seconds": round(compile_s, 1),
        "speedup_vs_realtime": round(2.0 / dt, 1),
        "finite": bool(np.isfinite(out).all()),
    }

    # --- #2 single-stream streaming latency ---
    ecfg = EngineConfig.realtime(64 if on_tpu else 2, V20RC0, compute_dtype=dtype)
    eng = StreamEngine(ecfg, params, bank)
    idx = eng.admit()
    x = jnp.asarray(np.tile(utt[:480], (ecfg.capacity, 1)))
    o = eng.tick(x)
    jax.block_until_ready(o)
    if on_tpu:
        _ = np.asarray(o[0, :1])  # sync-execution mode (see bench.py notes)
    for _ in range(20):  # settle
        o = eng.tick(x)
    jax.block_until_ready(o)
    times = []
    for _ in range(100):
        t0 = time.perf_counter()
        o = eng.tick(x)
        jax.block_until_ready(o)
        times.append(time.perf_counter() - t0)
    # amortized rate (dispatch overlapped) alongside isolated-tick latency;
    # on the dev relay the isolated number is dominated by a ~25 ms
    # network round trip per dispatch (PCIe-attached chips: ~0.1 ms)
    t0 = time.perf_counter()
    for _ in range(100):
        o = eng.tick(x)
    jax.block_until_ready(o)
    amortized = (time.perf_counter() - t0) / 100
    report["config2_stream_latency"] = {
        "p50_ms": round(float(np.percentile(times, 50)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(times, 99)) * 1e3, 3),
        "amortized_tick_ms": round(amortized * 1e3, 3),
        "frame_budget_ms": 10.0,
        "under_budget": bool(amortized < 0.010),
        "note": "isolated p50/p99 include the dev relay round trip per dispatch",
    }

    # --- #3 pitch/formant control sweep ---
    sweep = []
    base = np.asarray(convert_utterance(
        params, cfg, bank, utt[: sr // 2], sr, ConversionSettings(target_speaker=1)))
    for shift, formant in ((6.0, 0.0), (-6.0, 0.0), (0.0, 1.5), (12.0, -2.0)):
        y = np.asarray(convert_utterance(
            params, cfg, bank, utt[: sr // 2], sr,
            ConversionSettings(target_speaker=1, pitch_shift=shift,
                               formant_shift=formant)))
        sweep.append({
            "pitch_shift": shift, "formant_shift": formant,
            "finite": bool(np.isfinite(y).all()),
            "differs_from_neutral": bool(np.abs(y - base).max() > 1e-3),
        })
    report["config3_control_sweep"] = sweep

    # --- #4 256 concurrent streams ---
    cap = 256
    ecfg4 = EngineConfig.realtime(cap, V20RC0, compute_dtype=dtype)
    eng4 = StreamEngine(ecfg4, params, bank)
    for i in range(cap):
        s = eng4.admit()
        eng4.set_control(s, "target_speaker", np.int32(i % 16))
        eng4.set_control(s, "pitch_shift", np.float32((i % 24) - 12))
    x4 = jnp.asarray(np.tile(utt[:480], (cap, 1)))
    o = eng4.tick(x4)
    jax.block_until_ready(o)
    if on_tpu:
        _ = np.asarray(o[0, :1])
    n = 100 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(n):
        o = eng4.tick(x4)
    jax.block_until_ready(o)
    tick = (time.perf_counter() - t0) / n
    report["config4_256_streams"] = {
        "tick_ms": round(tick * 1e3, 3),
        "realtime": bool(tick < 0.010),
        "audio_sec_per_s": round(cap * 0.01 / tick, 1),
    }

    report["config5_multihost"] = (
        "see scripts/multihost_smoke.py (2-process jax.distributed, sharded "
        "tick + global collectives) and __graft_entry__.dryrun_multichip"
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
