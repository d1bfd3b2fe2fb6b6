"""Single-process driver for round 6's on-chip work.

One chip claim per invocation, sequential fault-isolated phases with a
hard deadline (the dev relay degrades after ~20-25 min sustained --
CLAUDE.md r5 lore: plan multi-phase chip work as driver bursts <= ~25
min; SIGINT + fresh relaunch recovers immediately on the warm cache).

Round-6 priorities (VERDICT r4 "next round"):
  1. converted F0 < 150 cents: flagship bursts with the NEW
     pitch-conditioned discriminator (training/discriminator.py pcd) on
     the WIDENED register corpus (synthesis.py f0_scale_range 0.6-2.2,
     330 Hz now in-distribution);
  2. klatt6 budget parity (same per-burst recipe as the flagship);
  3. promotion through the multi-metric gate
     (training/quality.py should_promote) with a fresh same-corpus
     baseline eval -- the corpus changed, so the incumbent is re-scored
     on the new eval set before any comparison;
  4. OOD refresh + the on-chip soft-mode parity row.

Phases (pass names as argv to run a subset; corpus regen is HOST-side,
run `python scripts/make_corpus.py` once before the first chip burst):
  base_eval  re-score the SHIPPED klatt8 on the current corpus; the
             resulting summary is the promotion baseline
  train      flagship burst: copy shipped -> klatt8_r6, fine-tune
             (distill + GAN w/ PCD, soft-pitch, f0-weight 4, cosine LR)
  promote    quality-eval klatt8_r6; promote over shipped klatt8 iff
             should_promote() accepts (MCD win without F0 give-back, or
             F0 win at MCD-within-spread with worse-pairs not up)
  train6     klatt6 in place: same recipe at the same step budget
  ood        scripts/ood_eval.py (noise/F0-register/held-out rows)
  parity     distill-parity vs the trained teacher (soft-mode row
             executes on-chip)

Knobs (env): R6_DEADLINE_S (default 1500), R6_STEPS / R6_GAN_STEPS
(default 1500/400), R6_K6_STEPS / R6_K6_GAN, R6_RESUME (continue the
staging burst's checkpoints instead of purging them).
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
STAGING = os.path.join(REPO, "models_demo", "klatt8_r6")
SHIPPED = os.path.join(REPO, "models_demo", "klatt8")
BASELINE_SUMMARY = "/tmp/r6_baseline_summary.json"
REPORT = os.path.join(REPO, "docs", "QUALITY_REPORT.json")

T0 = time.time()
DEADLINE_S = float(os.environ.get("R6_DEADLINE_S", "1500"))  # 25 min


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


def base_eval():
    import scripts.quality_eval as qe

    sys.argv = ["quality_eval.py", "--model", SHIPPED, "--pairs-per-utt", "6"]
    qe.main()
    with open(REPORT) as f:
        summary = json.load(f)["summary"]
    with open(BASELINE_SUMMARY, "w") as f:
        json.dump(summary, f)
    print("base_eval: baseline summary snapshotted:",
          json.dumps(summary["converted"]), flush=True)


def train():
    import scripts.train_real_model as tr

    ckpt = "/tmp/beatrice_train_ckpt_r6"
    # purge keyed on burst start, BOTH ckpt dirs (ADVICE r4: the _gan dir
    # and the STAGING-left-for-inspection path both re-created the silent
    # resume-and-skip no-op burst).  A fresh burst also re-stages from
    # the SHIPPED incumbent: leaving a REJECTED model in STAGING made the
    # next burst silently fine-tune the rejected weights (burst 4
    # happened to recover from burst 3's staging, but burst 5's reject
    # regressed BOTH metrics -- continuing it would compound).
    if not os.environ.get("R6_RESUME"):
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ckpt + "_gan", ignore_errors=True)
        shutil.rmtree(STAGING, ignore_errors=True)
    if not os.path.isdir(STAGING):
        shutil.copytree(SHIPPED, STAGING)
    sys.argv = ["train_real_model.py",
                "--steps", os.environ.get("R6_STEPS", "1500"),
                "--gan-steps", os.environ.get("R6_GAN_STEPS", "400"),
                "--batch", "16",
                "--f0-weight", os.environ.get("R6_F0W", "4.0"),
                "--register-boost", os.environ.get("R6_REG_BOOST", "3.0"),
                "--periodicity-weight", os.environ.get("R6_PERIO", "2.0"),
                "--seed", os.environ.get("R6_SEED", "0"),
                "--out", STAGING,
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_R6_REPORT.json"),
                "--ckpt-dir", ckpt,
                "--resume"]
    tr.main()


def promote():
    import scripts.quality_eval as qe

    from beatrice_vst_tpu.training.quality import should_promote

    if not os.path.exists(BASELINE_SUMMARY):
        raise SystemExit("promote: no baseline summary -- run base_eval "
                         "first (the corpus changed; the incumbent must "
                         "be re-scored on the same eval set)")
    with open(BASELINE_SUMMARY) as f:
        old_summary = json.load(f)

    sys.argv = ["quality_eval.py", "--model", STAGING, "--pairs-per-utt", "6"]
    qe.main()
    with open(REPORT) as f:
        rep = json.load(f)
    ok, reason = should_promote(old_summary, rep["summary"])
    print(f"promote gate: {ok} -- {reason}", flush=True)
    if ok:
        shutil.rmtree(SHIPPED)
        shutil.move(STAGING, SHIPPED)
        rep["model"] = os.path.relpath(SHIPPED, REPO)
        rep["promotion"] = {
            "previous_mcd_db": old_summary["converted"]["mcd_db"],
            "new_mcd_db": rep["summary"]["converted"]["mcd_db"],
            "previous_f0_rmse_cents":
                old_summary["converted"]["f0_rmse_cents"],
            "new_f0_rmse_cents":
                rep["summary"]["converted"]["f0_rmse_cents"],
            "gate": "should_promote multi-metric",
            "gate_reason": reason,
            "recipe": ("r6 burst: pitch-conditioned discriminator, "
                       "widened-register corpus (0.6-2.2), "
                       f"{os.environ.get('R6_STEPS', '1500')} distill + "
                       f"{os.environ.get('R6_GAN_STEPS', '400')} GAN, "
                       f"f0-weight {os.environ.get('R6_F0W', '4.0')}, "
                       "register-boost "
                       f"{os.environ.get('R6_REG_BOOST', '3.0')}, "
                       "periodicity-weight "
                       f"{os.environ.get('R6_PERIO', '2.0')}, "
                       "soft-pitch")}
        with open(REPORT, "w") as f:
            json.dump(rep, f, indent=1)
        # the new baseline for any follow-up burst in this same round
        with open(BASELINE_SUMMARY, "w") as f:
            json.dump(rep["summary"], f)
        print("promote: staged model promoted to models_demo/klatt8",
              flush=True)
    else:
        print("promote: REJECTED; restoring the shipped model's summary "
              "in the report", flush=True)
        sys.argv = ["quality_eval.py", "--model", SHIPPED,
                    "--pairs-per-utt", "6"]
        qe.main()


def train6():
    import scripts.train_real_model as tr

    ckpt = "/tmp/beatrice_train_ckpt_r6_k6"
    if not os.environ.get("R6_RESUME"):
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(ckpt + "_gan", ignore_errors=True)
    sys.argv = ["train_real_model.py",
                "--steps", os.environ.get("R6_K6_STEPS", "1500"),
                "--gan-steps", os.environ.get("R6_K6_GAN", "400"),
                "--batch", "16",
                "--f0-weight", "4.0",
                "--register-boost", os.environ.get("R6_REG_BOOST", "3.0"),
                "--periodicity-weight", os.environ.get("R6_PERIO", "2.0"),
                "--speakers", "0", "1", "2", "3", "4", "5",
                "--out", os.path.join(REPO, "models_demo", "klatt6"),
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_OOD_REPORT.json"),
                "--ckpt-dir", ckpt, "--resume"]
    tr.main()


def ood():
    import scripts.ood_eval as oe

    sys.argv = ["ood_eval.py"]
    oe.main()


def parity():
    import scripts.distill_parity as dp

    sys.argv = ["distill_parity.py", "--teacher", SHIPPED,
                "--steps-per-module",
                os.environ.get("R6_PARITY_STEPS", "600"),
                "--e2e-steps", os.environ.get("R6_PARITY_E2E", "400")]
    dp.main()


PHASES = [("base_eval", base_eval, 200), ("train", train, 1000),
          ("promote", promote, 400), ("train6", train6, 1000),
          ("ood", ood, 300), ("parity", parity, 500)]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn, est in PHASES:
        if only and name not in only:
            continue
        phase(name, fn, est)
    print(f"=== r6 driver complete, wall {time.time() - T0:.0f}s ===",
          flush=True)
