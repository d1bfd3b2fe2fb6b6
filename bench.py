"""Benchmark: real-time voice-conversion throughput on one TPU chip.

Measures the batched streaming engine (20rc0 full chain, bf16 compute,
jitted 10 ms ticks with donated state) at increasing stream capacities and
reports audio-seconds generated per wall second per chip, i.e. how many
real-time streams one chip sustains (value == concurrent real-time streams
x 0.01 s / tick time).

Baseline: BASELINE.json's north-star target of >=2000 concurrent real-time
streams on a v5p-16 (8 chips) == 250 audio-sec/s/chip; vs_baseline is
measured against that.  Prints ONE JSON line.
"""

import json
import time

import numpy as np


def bench_capacity(capacity: int, n_ticks: int = 50, spec=None):
    import jax
    import jax.numpy as jnp

    from beatrice_vst_tpu.constants import V20RC0
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
    from beatrice_vst_tpu.speakers import bank as bank_mod

    spec = spec or V20RC0
    cfg = EngineConfig.realtime(capacity, spec, compute_dtype="bfloat16")
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 16)
    eng = StreamEngine(cfg, params, bank)
    for i in range(capacity):
        eng.admit()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((capacity, 480)) * 0.1, jnp.float32)
    x = jax.device_put(x)

    # warmup + compile
    out = eng.tick(x)
    jax.block_until_ready(out)
    out = eng.tick(x)
    jax.block_until_ready(out)

    times = []
    for _ in range(n_ticks):
        t0 = time.perf_counter()
        out = eng.tick(x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))
    p99 = float(np.percentile(times, 99))
    return {
        "capacity": capacity,
        "p50_tick_ms": p50 * 1e3,
        "p99_tick_ms": p99 * 1e3,
        "audio_sec_per_s": capacity * 0.010 / p50,
        "realtime": p99 < 0.010,
    }


def main():
    import jax

    results = []
    best = None
    for capacity in (256, 512, 1024, 2048, 4096):
        try:
            r = bench_capacity(capacity)
        except Exception as e:  # OOM or compile failure at large capacity
            results.append({"capacity": capacity, "error": str(e)[:200]})
            break
        results.append(r)
        if best is None or r["audio_sec_per_s"] > best["audio_sec_per_s"]:
            best = r
        # once past real-time, bigger batches only help throughput if they
        # still meet the frame budget; keep going while throughput grows
        if not r["realtime"] and best and r["audio_sec_per_s"] < best["audio_sec_per_s"]:
            break

    realtime_best = max(
        (r for r in results if r.get("realtime")),
        key=lambda r: r["capacity"],
        default=None,
    )
    value = best["audio_sec_per_s"] if best else 0.0
    out = {
        "metric": "audio-seconds/s/chip",
        "value": round(value, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / 250.0, 3),
        "device": str(jax.devices()[0]),
        "p50_tick_ms": round(best["p50_tick_ms"], 3) if best else None,
        "realtime_streams": realtime_best["capacity"] if realtime_best else 0,
        "sweep": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
