"""Second r5 chip pass: quality + OOD refresh after the manual promotion.

The r5 driver's promote phase gates on MCD alone; the r5 flagship burst
traded +0.11 dB MCD (within the eval's pair-to-pair spread) for a 16%
converted-F0 improvement (506.8 -> 424.5 cents) and one fewer
worse-than-do-nothing pair -- the round-5 priority metric (CLAUDE.md:
"targeting F0 RMSE < 150").  The promotion itself (file moves + guard
test) happens on the host BEFORE this script; this script re-runs the
two chip evals against the promoted model in one claim:

  1. scripts/quality_eval.py --model models_demo/klatt8 (merge-preserving;
     rewrites the summary/pairs sections, keeps ood)
  2. scripts/ood_eval.py (noise/F0-register rows + the klatt6 held-out
     rows, klatt6 now carrying its first GAN phase from the r5 driver)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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

    rep_path = os.path.join(REPO, "docs", "QUALITY_REPORT.json")
    # read the PRE-eval metrics as the promotion baseline before qe.main()
    # overwrites the summary (ADVICE r4: the first version hardcoded the
    # r5 numbers, so any later rerun stamped stale provenance)
    with open(rep_path) as f:
        old = json.load(f)
    prev_mcd = old["summary"]["converted"]["mcd_db"]
    prev_f0 = old["summary"]["converted"]["f0_rmse_cents"]
    prev_promo = old.get("promotion")

    sys.argv = ["quality_eval.py",
                "--model", os.path.join(REPO, "models_demo", "klatt8"),
                "--pairs-per-utt", "6"]
    qe.main()
    with open(rep_path) as f:
        rep = json.load(f)
    rep["promotion"] = {
        "previous_mcd_db": prev_mcd,
        "new_mcd_db": rep["summary"]["converted"]["mcd_db"],
        "previous_f0_rmse_cents": prev_f0,
        "new_f0_rmse_cents": rep["summary"]["converted"]["f0_rmse_cents"],
        "recipe": (prev_promo or {}).get("recipe",
                                         "re-eval of the shipped model")}
    with open(rep_path, "w") as f:
        json.dump(rep, f, indent=1)


def ood():
    import scripts.ood_eval as oe

    sys.argv = ["ood_eval.py"]
    oe.main()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn in [("quality", quality), ("ood", ood)]:
        if only and name not in only:
            continue
        phase(name, fn)
    print("=== r5b complete ===", flush=True)
