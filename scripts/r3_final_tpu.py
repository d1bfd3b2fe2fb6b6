"""Single-process driver for round 3's on-chip work.

The dev relay's chip claim takes ~10-15 minutes to recycle between
processes, so everything that needs the chip runs here sequentially in
one process.  Each phase is fault-isolated; a failure skips to the next.

Phases (pass names as argv to run a subset):
  train     resume the flagship klatt8 run to 30k distill + 3k GAN steps
  quality   scripts/quality_eval.py on the trained model
  diagnose  scripts/diagnose_pitch.py on the trained model (TPU)
  train6    6-speaker held-out model for the OOD protocol (klatt6)
  ood       scripts/ood_eval.py (noise/F0 rows + held-out rows)
  bench_ab  merged-vs-split mel-ring tick A/B at 19456/20480
  parity    distill-parity study against the TRAINED teacher
  soak      TPU serving soak (fpt=25, fleet-shaped prewarm)
"""

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


def train():
    import scripts.train_real_model as tr

    sys.argv = ["train_real_model.py", "--steps", str(int(os.environ.get("R3_STEPS", "24000"))),
                "--gan-steps", str(int(os.environ.get("R3_GAN_STEPS", "2500"))), "--f0-weight", "2.0",
                "--ckpt-dir", "/tmp/beatrice_train_ckpt_r3", "--resume"]
    tr.main()


def quality():
    import scripts.quality_eval as qe

    sys.argv = ["quality_eval.py", "--pairs-per-utt", "6"]
    qe.main()


def diagnose():
    import scripts.diagnose_pitch as dp

    sys.argv = ["diagnose_pitch.py", "--tpu", "--utts", "45", "46", "47",
                "--pairs-per-utt", "4"]
    dp.main()


def train6():
    import scripts.train_real_model as tr

    sys.argv = ["train_real_model.py", "--steps", str(int(os.environ.get("R3_K6_STEPS", "10000"))),
                "--gan-steps", "800", "--f0-weight", "2.0",
                "--speakers", "0", "1", "2", "3", "4", "5",
                "--out", os.path.join(REPO, "models_demo", "klatt6"),
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_OOD_REPORT.json"),
                "--ckpt-dir", "/tmp/beatrice_train_ckpt_r3_k6"]
    tr.main()


def ood():
    import scripts.ood_eval as oe

    sys.argv = ["ood_eval.py"]
    oe.main()


def bench_ab():
    import scripts.bench_ab as ab

    sys.argv = ["bench_ab.py"]
    ab.main()


def parity():
    import scripts.distill_parity as dp

    sys.argv = ["distill_parity.py", "--teacher",
                os.path.join(REPO, "models_demo", "klatt8"),
                "--steps-per-module", "3000", "--e2e-steps", "1000"]
    dp.main()


def soak():
    import scripts.serve_soak as ss

    os.environ.setdefault("SOAK_FPT", "25")
    sys.argv = ["serve_soak.py", "4", "16"]
    ss.main()


PHASES = [("train", train), ("quality", quality), ("diagnose", diagnose),
          ("train6", train6), ("ood", ood), ("bench_ab", bench_ab),
          ("parity", parity), ("soak", soak)]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn in PHASES:
        if only and name not in only:
            continue
        phase(name, fn)
