"""Single-process driver for the round's remaining on-chip work.

The dev relay's chip claim takes ~10-15 minutes to recycle between
processes, so everything that needs the chip runs here sequentially in
one process: quality eval -> bench A/B -> TPU serving soak -> distill
parity study.  Each phase is fault-isolated; a failure skips to the next.
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


def quality():
    import scripts.quality_eval as qe

    sys.argv = ["quality_eval.py", "--pairs-per-utt", "4"]
    qe.main()


def bench_ab():
    import scripts.bench_ab as ab

    sys.argv = ["bench_ab.py"]
    ab.main()


def soak():
    import scripts.serve_soak as ss

    os.environ.setdefault("SOAK_FPT", "25")
    sys.argv = ["serve_soak.py", "4", "16"]
    ss.main()


def parity():
    import scripts.distill_parity as dp

    sys.argv = ["distill_parity.py", "--steps-per-module", "600",
                "--e2e-steps", "300"]
    dp.main()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn in [("quality", quality), ("bench_ab", bench_ab),
                     ("soak", soak), ("parity", parity)]:
        if only and name not in only:
            continue
        phase(name, fn)
