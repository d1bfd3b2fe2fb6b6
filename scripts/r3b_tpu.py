"""Round-3 follow-up chip pass (single process, claim-friendly).

The first r3 pass measured merged_ring@{19456,20480} but (a) crashed on
the split-ring control legs (stale _stream_axes lru entry across a
mid-process BEATRICE_MERGED_MEL_RING flip -- fixed in engine.py) and
(b) ran the TPU soak right after that crash, hitting a 27.8 s relay
stall that starved every client.  This pass runs the soak FIRST in a
clean process, then completes the A/B: split_ring control legs plus a
merged@20480 re-sample.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phase(name, fn):
    print(f"=== {name} ===", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"=== {name} done in {time.time() - t0:.0f}s ===", flush=True)
    except SystemExit as e:
        print(f"=== {name} exited {e.code} in {time.time() - t0:.0f}s ===",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"=== {name} FAILED in {time.time() - t0:.0f}s ===", flush=True)


def soak():
    import scripts.serve_soak as ss

    os.environ.setdefault("SOAK_FPT", "25")
    os.environ.setdefault("SOAK_QUIET_S", "25")  # ride out one relay stall
    sys.argv = ["serve_soak.py", "4", "16"]
    ss.main()


def bench_rest():
    import scripts.bench_ab as ab

    ab.CONFIGS = [("split_ring", "dot", "1", "0"),
                  ("merged_ring", "dot", "1", "1")]

    # split control at both caps, then one more merged@20480 sample
    sys.argv = ["bench_ab.py", "19456", "20480"]
    caps_by_config = {"split_ring": [19456, 20480], "merged_ring": [20480]}
    import json
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "BENCH_AB_R3.json")
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path))
        except Exception:
            results = {}
    for name, src_mode, pin, merged in ab.CONFIGS:
        for cap in caps_by_config[name]:
            t0 = time.time()
            try:
                ms = ab.measure(cap, src_mode, pin, merged)
                row = {"config": name, "capacity": cap,
                       "steady_tick_ms": round(ms, 3),
                       "realtime": ms < 9.5,
                       "build_s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                traceback.print_exc()
                row = {"config": name, "capacity": cap,
                       "error": f"{type(e).__name__}: {e}"}
            key = f"{name}@{cap}"
            if key in results:  # keep every sample from every pass
                key = f"{name}@{cap}#2"
            results[key] = row
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    phase("soak", soak)
    phase("bench_rest", bench_rest)
