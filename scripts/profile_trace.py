"""One-command tick profiling: trace on-chip, rank fusions, map to source.

Runs the bench tick under jax.profiler at the given capacity, aggregates
the device-track events, and annotates each hot fusion with the HLO
op/shape and the Python source line it came from (compiled with the same
code, so fusion names match).  This is the loop that found every major
win this framework shipped -- the defensive-copy DUS, the duplicated
full-rate sin/cos, the minor-axis concat rewrites; see CLAUDE.md
"Performance facts learned".

Usage: python scripts/profile_trace.py [capacity] [top_n]
"""

import collections
import glob
import gzip
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
TOP = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def main():
    prof_dir = tempfile.mkdtemp(prefix="beatrice_prof_")
    env = dict(os.environ)
    env["BENCH_PROFILE"] = prof_dir
    env["BENCH_CAPACITIES"] = str(CAP)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(f"profiling capacity {CAP} ...", file=sys.stderr)
    subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)

    # HLO text for fusion -> source mapping (compile-cache hit: fast)
    import bench  # noqa: E402

    eng, x = bench.make_engine(CAP)
    hlo = eng._tick.lower(eng.params, eng.bank, eng.state, x).compile().as_text()

    trace = sorted(glob.glob(os.path.join(
        prof_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(trace) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = [p for p, n in names.items() if "TPU" in n]
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1

    def describe(nm):
        m = re.search(
            r"^\s*%?" + re.escape(nm) + r" = (\S+).*?metadata=\{op_name=\""
            r"[^\"]*?/([^\"]*)\" source_file=\"([^\"]*)\" source_line=(\d+)",
            hlo, re.M)
        if not m:
            m2 = re.search(r"^\s*%?" + re.escape(nm) + r" = (\S+)", hlo, re.M)
            return (m2.group(1)[:40] + " ?") if m2 else "?"
        shape, op, f, line = m.groups()
        return f"{shape[:34]:34s} {op[:26]:26s} {f.split('/')[-1]}:{line}"

    for name, us in agg.most_common(TOP):
        per = us / cnt[name] / 1e3
        if name.startswith("jit__"):
            print(f"TOTAL  {per:7.3f} ms/tick")
            continue
        print(f"{per:7.3f}  {name[:28]:28s} {describe(name)}")


if __name__ == "__main__":
    main()
