"""Second r4 chip pass: ring-slot-stride A/B + capacity ladder.

Runs AFTER scripts/r4_final_tpu.py (separate process = new chip claim):
the stride feature landed after that driver started, so its in-process
modules predate it.  One process, fault-isolated rows, merged into
docs/BENCH_AB_R4.json:

  1. merged-ring baseline at 19968 / 20480 (control for this claim)
  2. BEATRICE_RING_SLOT_STRIDE=256 at 19968 / 20480 (ROOFLINE fat #4:
     lane-aligned slot writes vs a wider ring-read matmul)
  3. if the stride wins at 20480, a confirmation re-sample of both

The knob flip uses layers.clear_env_knob_caches() (the r3c stale-cache
lesson) and every config is built fresh via scripts.bench_ab.measure.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.bench_ab as ab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "BENCH_AB_R4.json")


def measure_row(tag, cap, env, results):
    for k, v in env.items():
        os.environ[k] = v
    t0 = time.time()
    try:
        ms = ab.measure(cap, "dot", "1", "1")
        row = {"config": tag, "capacity": cap,
               "steady_tick_ms": round(ms, 3), "realtime": ms < 9.5,
               "build_s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001 - keep the claim alive
        traceback.print_exc()
        row = {"config": tag, "capacity": cap,
               "error": f"{type(e).__name__}: {e}"}
    finally:
        for k in env:
            os.environ.pop(k, None)
    results[f"{tag}@{cap}"] = row
    print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    return row


def main():
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except (json.JSONDecodeError, OSError):
            results = {}
    rows = {}
    for cap in (19968, 20480):
        rows[("base", cap)] = measure_row("stride_base", cap, {}, results)
    for cap in (19968, 20480):
        rows[("s256", cap)] = measure_row(
            "stride_256", cap, {"BEATRICE_RING_SLOT_STRIDE": "256"}, results)

    def ok(r):
        return r is not None and "steady_tick_ms" in r

    b, s = rows.get(("base", 20480)), rows.get(("s256", 20480))
    if ok(b) and ok(s) and s["steady_tick_ms"] < b["steady_tick_ms"]:
        # confirmation resample before any default flip
        measure_row("stride_base_confirm", 20480, {}, results)
        measure_row("stride_256_confirm", 20480,
                    {"BEATRICE_RING_SLOT_STRIDE": "256"}, results)
    print("done; decide the default from", OUT, flush=True)


if __name__ == "__main__":
    main()
