"""Single-process driver for round 5's on-chip work.

One chip claim, sequential fault-isolated phases (claim recycling costs
10-15 min -- CLAUDE.md lore), with a HARD deadline so the claim is
released in time for the end-of-round bench run.  Round-5 priorities
(CLAUDE.md roadmap): (1) another flagship fine-tune burst (the r4
recipe, promoted at MCD 19.67, was still descending) targeting the
507-cent converted-F0 gap; (2) klatt6 catch-up (distill + its first GAN
phase) so the held-out OOD rows are meaningful; (3) OOD refresh; (4) the
never-executed soft-mode distill-parity row.

Phases (pass names as argv to run a subset):
  train     flagship burst: copy shipped klatt8 -> klatt8_r5, fine-tune
            (distill + GAN, soft-pitch, f0-weight 4, cosine LR)
  promote   quality-eval klatt8_r5; promote over shipped klatt8 if it
            wins on MCD (merge-preserving QUALITY_REPORT update)
  train6    klatt6 in place: more distill + first GAN phase
  ood       scripts/ood_eval.py (noise/F0-register/held-out rows)
  parity    distill-parity vs the trained teacher, small step budget --
            executes the end_to_end_error_soft row on-chip
"""

import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CORPUS = "/tmp/beatrice_corpus"
STAGING = os.path.join(REPO, "models_demo", "klatt8_r5")
SHIPPED = os.path.join(REPO, "models_demo", "klatt8")

T0 = time.time()
DEADLINE_S = float(os.environ.get("R5_DEADLINE_S", "2280"))  # 38 min


def remaining():
    return DEADLINE_S - (time.time() - T0)


def phase(name, fn, est_s):
    if remaining() < est_s:
        print(f"=== {name} SKIPPED (remaining {remaining():.0f}s < "
              f"est {est_s}s) ===", flush=True)
        return
    print(f"=== {name} (remaining {remaining():.0f}s) ===", flush=True)
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

    ckpt = "/tmp/beatrice_train_ckpt_r5"
    if not os.path.isdir(STAGING):
        shutil.copytree(SHIPPED, STAGING)
    # a fresh burst must not resume from a PREVIOUS burst's checkpoints:
    # with --steps already reached, train() would resume-and-skip and the
    # burst silently becomes a no-op (happened on the second r5 burst,
    # and AGAIN via the _gan dir + via the STAGING-left-for-inspection
    # path -- ADVICE r4).  Purge is keyed on burst start, BOTH dirs,
    # unless an explicit resume is requested.
    if not os.environ.get("R5_RESUME"):
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ckpt + "_gan", ignore_errors=True)
    sys.argv = ["train_real_model.py",
                "--steps", os.environ.get("R5_STEPS", "1500"),
                "--gan-steps", os.environ.get("R5_GAN_STEPS", "300"),
                "--batch", "16",
                "--f0-weight", "4.0",
                "--out", STAGING,
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_R5_REPORT.json"),
                "--ckpt-dir", ckpt,
                "--resume"]
    tr.main()


def promote():
    import scripts.quality_eval as qe

    report_path = os.path.join(REPO, "docs", "QUALITY_REPORT.json")
    with open(report_path) as f:
        old_mcd = json.load(f)["summary"]["converted"]["mcd_db"]

    sys.argv = ["quality_eval.py", "--model", STAGING, "--pairs-per-utt", "6"]
    qe.main()
    with open(report_path) as f:
        rep = json.load(f)
    new = rep["summary"]["converted"]["mcd_db"]
    print(f"promote: staged MCD {new} vs shipped {old_mcd}", flush=True)
    if new is not None and new < old_mcd:
        shutil.rmtree(SHIPPED)
        shutil.move(STAGING, SHIPPED)
        rep["model"] = os.path.relpath(SHIPPED, REPO)
        rep["promotion"] = {"previous_mcd_db": old_mcd, "new_mcd_db": new,
                            "recipe": "r5 fine-tune burst (r4 recipe cont.)"}
        with open(report_path, "w") as f:
            json.dump(rep, f, indent=1)
        print("promote: staged model promoted to models_demo/klatt8",
              flush=True)
    else:
        print("promote: staged model did NOT beat the shipped model; "
              "keeping both (staging left for inspection)", flush=True)
        sys.argv = ["quality_eval.py", "--model", SHIPPED,
                    "--pairs-per-utt", "6"]
        qe.main()


def train6():
    import scripts.train_real_model as tr

    sys.argv = ["train_real_model.py",
                "--steps", os.environ.get("R5_K6_STEPS", "1000"),
                "--gan-steps", os.environ.get("R5_K6_GAN", "300"),
                "--batch", "16",
                "--f0-weight", "4.0",
                "--speakers", "0", "1", "2", "3", "4", "5",
                "--out", os.path.join(REPO, "models_demo", "klatt6"),
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_OOD_REPORT.json"),
                "--ckpt-dir", "/tmp/beatrice_train_ckpt_r5_k6", "--resume"]
    tr.main()


def ood():
    import scripts.ood_eval as oe

    sys.argv = ["ood_eval.py"]
    oe.main()


def parity():
    import scripts.distill_parity as dp

    sys.argv = ["distill_parity.py", "--teacher", SHIPPED,
                "--steps-per-module",
                os.environ.get("R5_PARITY_STEPS", "600"),
                "--e2e-steps", os.environ.get("R5_PARITY_E2E", "400")]
    dp.main()


PHASES = [("train", train, 1150), ("promote", promote, 220),
          ("train6", train6, 700), ("ood", ood, 300),
          ("parity", parity, 500)]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        phase(name, fn, est)
    print(f"=== driver complete, wall {time.time() - T0:.0f}s ===",
          flush=True)
