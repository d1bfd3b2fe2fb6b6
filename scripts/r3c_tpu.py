"""Third r3 chip pass: squeeze the 20480 gate (one process, one claim).

merged_ring@20480 measured 9.516/9.500 ms against the 9.5 real-time
gate.  CLAUDE.md's ring lore says ring (read,write) modes must be
re-A/B'd after big tick changes -- the merged mel ring is one -- and a
19968 capacity probe checks whether the headline can rise between
19456 and 20480 regardless.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.bench_ab as ab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    # (tag, capacity, extra_env)
    ("baseline#3", 20480, {}),
    ("ring_dus_select", 20480, {"BEATRICE_RING_MODE": "dus,select"}),
    ("cap_probe", 19968, {}),
    ("cap_probe", 20224, {}),
]


def main():
    out_path = os.path.join(REPO, "docs", "BENCH_AB_R3.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for tag, cap, env in ROWS:
        for k, v in env.items():
            os.environ[k] = v
        t0 = time.time()
        try:
            ms = ab.measure(cap, "dot", "1", "1")
            row = {"config": f"merged_ring/{tag}", "capacity": cap,
                   "steady_tick_ms": round(ms, 3), "realtime": ms < 9.5,
                   "build_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            row = {"config": f"merged_ring/{tag}", "capacity": cap,
                   "error": f"{type(e).__name__}: {e}"}
        for k in env:
            del os.environ[k]
        key = f"{tag}@{cap}"
        results[key] = row
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
