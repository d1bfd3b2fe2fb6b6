"""Single-process driver for round 4's on-chip work.

One chip claim, sequential fault-isolated phases (the dev relay's claim
takes ~10-15 min to recycle between processes -- CLAUDE.md lore).  The
round-4 theme is MODEL QUALITY (VERDICT r3: "Round 4 must be spent on
the model, not the tick"): the flagship training run executed end to end
with the r4 recipe (soft-pitch conditioning + F0 register augmentation +
cosine LR), the held-out klatt6 model, the OOD rows, and the trained-
teacher parity study.  Bench A/B phases close the 20480 gate afterwards.

Phases (pass names as argv to run a subset):
  corpus    regenerate the F0-augmented corpus at /tmp/beatrice_corpus
  train     flagship klatt8_r4: 24k distill + 2.5k GAN, batch 32,
            soft-pitch, cosine LR, f0-weight 2, aligned supervision
  promote   quality-eval klatt8_r4; if it beats the shipped klatt8
            summary, promote it to models_demo/klatt8
  quality   scripts/quality_eval.py on the (promoted) shipped model
  diagnose  scripts/diagnose_pitch.py on the shipped model (TPU)
  train6    6-speaker held-out model for the OOD protocol (klatt6)
  ood       scripts/ood_eval.py (noise/F0-register rows + held-out rows)
  parity    distill-parity study against the TRAINED teacher
  bench_ab  ring_dus_select re-measure (stale-cache fix) + capacity ladder
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
STAGING = os.environ.get("R4_STAGING",
                         os.path.join(REPO, "models_demo", "klatt8_r4"))
SHIPPED = os.path.join(REPO, "models_demo", "klatt8")


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


def corpus():
    import scripts.make_corpus as mc

    sys.argv = ["make_corpus.py", CORPUS]
    mc.main()


def train():
    import scripts.train_real_model as tr

    sys.argv = ["train_real_model.py",
                "--steps", str(int(os.environ.get("R4_STEPS", "24000"))),
                "--gan-steps", str(int(os.environ.get("R4_GAN_STEPS", "2500"))),
                "--batch", str(int(os.environ.get("R4_BATCH", "32"))),
                "--f0-weight", os.environ.get("R4_F0W", "2.0"),
                "--out", STAGING,
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_R4_REPORT.json"),
                "--ckpt-dir", os.environ.get("R4_CKPT",
                                             "/tmp/beatrice_train_ckpt_r4"),
                "--resume"]
    tr.main()


def promote():
    """Quality-eval the staged model; promote over the shipped one if it
    wins on MCD (the shipped-model behavioral guard still gates it)."""
    import scripts.quality_eval as qe

    report_path = os.path.join(REPO, "docs", "QUALITY_REPORT.json")
    with open(report_path) as f:
        old_mcd = json.load(f)["summary"]["converted"]["mcd_db"]

    sys.argv = ["quality_eval.py", "--model", STAGING, "--pairs-per-utt", "6"]
    qe.main()
    with open(report_path) as f:
        rep = json.load(f)
    new = rep["summary"]["converted"]["mcd_db"]
    new_soft = (rep["summary"].get("converted_soft") or {}).get("mcd_db")
    print(f"promote: staged MCD {new} (soft {new_soft}) vs shipped "
          f"{old_mcd}", flush=True)
    if new is not None and new < old_mcd:
        shutil.rmtree(SHIPPED)
        shutil.move(STAGING, SHIPPED)
        rep["model"] = os.path.relpath(SHIPPED, REPO)
        rep["promotion"] = {"previous_mcd_db": old_mcd, "new_mcd_db": new,
                            "recipe": "r4 soft-pitch + F0-aug + cosine LR"}
        with open(report_path, "w") as f:
            json.dump(rep, f, indent=1)
        print("promote: staged model promoted to models_demo/klatt8",
              flush=True)
    else:
        print("promote: staged model did NOT beat the shipped model; "
              "keeping both (staging left for inspection)", flush=True)
        # leave QUALITY_REPORT describing the SHIPPED model
        sys.argv = ["quality_eval.py", "--model", SHIPPED,
                    "--pairs-per-utt", "6"]
        qe.main()


def diagnose():
    import scripts.diagnose_pitch as dp

    sys.argv = ["diagnose_pitch.py", "--tpu", "--utts", "45", "46", "47",
                "--pairs-per-utt", "4"]
    dp.main()


def train6():
    import scripts.train_real_model as tr

    sys.argv = ["train_real_model.py",
                "--steps", str(int(os.environ.get("R4_K6_STEPS", "10000"))),
                "--gan-steps", str(int(os.environ.get("R4_K6_GAN", "800"))),
                "--batch", str(int(os.environ.get("R4_BATCH", "32"))),
                "--f0-weight", "2.0",
                "--speakers", "0", "1", "2", "3", "4", "5",
                "--out", os.path.join(REPO, "models_demo", "klatt6"),
                "--report", os.path.join(REPO, "docs",
                                         "TRAIN_OOD_REPORT.json"),
                "--ckpt-dir", "/tmp/beatrice_train_ckpt_r4_k6", "--resume"]
    tr.main()


def ood():
    import scripts.ood_eval as oe

    sys.argv = ["ood_eval.py"]
    oe.main()


def parity():
    import scripts.distill_parity as dp

    sys.argv = ["distill_parity.py", "--teacher", SHIPPED,
                "--steps-per-module",
                str(int(os.environ.get("R4_PARITY_STEPS", "3000"))),
                "--e2e-steps",
                str(int(os.environ.get("R4_PARITY_E2E", "1000")))]
    dp.main()


def bench_ab():
    import scripts.bench_ab as ab

    # the ring_dus_select row, re-measured with clear_env_knob_caches()
    # actually flipping the knob this time (ADVICE r3), then the default
    # ladder
    os.environ["BEATRICE_RING_MODE"] = "dus,select"
    try:
        sys.argv = ["bench_ab.py", "20480"]
        t0 = time.time()
        ms = ab.measure(20480, "dot", "1", "1")
        out_path = os.path.join(REPO, "docs", "BENCH_AB_R3.json")
        results = json.load(open(out_path))
        results["ring_dus_select@20480/r4_remeasure"] = {
            "config": "merged_ring/ring_dus_select", "capacity": 20480,
            "steady_tick_ms": round(ms, 3), "realtime": ms < 9.5,
            "build_s": round(time.time() - t0, 1),
            "note": "knob actually applied (clear_env_knob_caches)"}
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results["ring_dus_select@20480/r4_remeasure"]),
              flush=True)
    finally:
        del os.environ["BEATRICE_RING_MODE"]
        from beatrice_vst_tpu.models import layers

        layers.clear_env_knob_caches()
    sys.argv = ["bench_ab.py"]
    ab.main()


PHASES = [("corpus", corpus), ("train", train), ("promote", promote),
          ("diagnose", diagnose), ("train6", train6),
          ("ood", ood), ("parity", parity), ("bench_ab", bench_ab)]

if __name__ == "__main__":
    only = set(sys.argv[1:])
    sys.argv = [sys.argv[0]]
    for name, fn in PHASES:
        if only and name not in only:
            continue
        phase(name, fn)
