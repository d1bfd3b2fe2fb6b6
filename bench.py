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
import os
import sys
import time

import numpy as np

CAPACITIES = tuple(
    int(c) for c in os.environ.get("BENCH_CAPACITIES", "1024,1536,2048").split(",")
)


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs skip the slow
    (remote) compile entirely."""
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_beatrice")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache unsupported on this backend: proceed
        log(f"bench: compilation cache unavailable: {e}")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_capacity(capacity: int, n_ticks: int = 30, spec=None):
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

    # warmup + compile, then force a full settle (async-dispatch backends
    # can make per-call block_until_ready timings misleading; total wall
    # time over many ticks with a final host materialization is ground
    # truth).
    out = eng.tick(x)
    _ = np.asarray(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = eng.tick(x)
        _ = np.asarray(o)
        return (time.perf_counter() - t0) / n

    run(5)  # settle
    # long chunks amortize the final D2H materialization (which costs
    # ~100 ms through this dev tunnel but ~0.1 ms over PCIe); the per-tick
    # number is the device-side steady state.
    chunk = max(100, n_ticks)
    samples = [run(chunk) for _ in range(3)]
    steady = float(np.mean(samples))
    worst = float(np.max(samples))
    # one-off: host transfer cost of a tick's output block
    t0 = time.perf_counter()
    _ = np.asarray(eng.tick(x))
    d2h = time.perf_counter() - t0
    return {
        "capacity": capacity,
        "steady_tick_ms": steady * 1e3,
        "worst_chunk_tick_ms": worst * 1e3,
        "d2h_ms": d2h * 1e3,
        "audio_sec_per_s": capacity * 0.010 / steady,
        "realtime": worst < 0.010 * 0.95,  # 5% scheduling headroom
    }


def main():
    _enable_compile_cache()
    import jax

    results = []
    best = None
    for capacity in CAPACITIES:
        log(f"bench: capacity {capacity} ...")
        try:
            t0 = time.perf_counter()
            r = bench_capacity(capacity)
            log(f"bench: capacity {capacity} done in {time.perf_counter()-t0:.1f}s: {r}")
        except Exception as e:  # OOM or compile failure at large capacity
            results.append({"capacity": capacity, "error": str(e)[:200]})
            log(f"bench: capacity {capacity} failed: {e}")
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
    # headline: real-time audio-seconds/s/chip (== concurrent real-time
    # streams x 10 ms frames delivered on schedule); raw max throughput is
    # reported alongside.
    value = realtime_best["audio_sec_per_s"] if realtime_best else 0.0
    out = {
        "metric": "audio-seconds/s/chip",
        "value": round(value, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / 250.0, 3),
        "device": str(jax.devices()[0]),
        "realtime_streams": realtime_best["capacity"] if realtime_best else 0,
        "steady_tick_ms": round(realtime_best["steady_tick_ms"], 3) if realtime_best else None,
        "max_throughput_audio_sec_per_s": round(best["audio_sec_per_s"], 1) if best else 0.0,
        "sweep": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
