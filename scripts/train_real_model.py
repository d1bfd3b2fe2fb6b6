"""Train the demo voice-conversion model on the synthetic parallel corpus.

End-to-end "the framework can actually convert voices" run (VERDICT item
1): initialize an 8-voice 20rc0 model, train it on the cross-speaker
pairs rendered by scripts/make_corpus.py (distillation objective:
multi-resolution STFT + L1, training/distill.py; optional GAN polish),
save the trained weights into a committed model directory, and write the
loss history to docs/TRAIN_REAL_REPORT.json.

Usage:
    python scripts/make_corpus.py /tmp/beatrice_corpus
    python scripts/train_real_model.py [--corpus /tmp/beatrice_corpus]
        [--out models_demo/klatt8] [--steps 6000] [--gan-steps 800]
        [--batch 16] [--frames 64]
    python scripts/quality_eval.py --model models_demo/klatt8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/beatrice_corpus")
    ap.add_argument("--out", default=os.path.join(REPO, "models_demo", "klatt8"))
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--gan-steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr-schedule", dest="lr_schedule",
                    action="store_true", default=True,
                    help="linear-warmup cosine decay over --steps "
                         "(default on since r4: constant LR plateaued)")
    ap.add_argument("--no-lr-schedule", dest="lr_schedule",
                    action="store_false")
    ap.add_argument("--f0-weight", type=float, default=2.0,
                    help="weight on the pitch-bin CE + voicing BCE "
                         "(the r2 model at weight 1.0 still quadrupled "
                         "converted F0 error; see docs/PITCH_DIAGNOSIS.json)")
    ap.add_argument("--soft-pitch", dest="soft_pitch", action="store_true",
                    default=True,
                    help="condition the vocoder on E[bin] over the pitch "
                         "logits during training (chain.apply soft_pitch): "
                         "waveform losses then backprop into the pitch "
                         "estimator (default on since r4)")
    ap.add_argument("--no-soft-pitch", dest="soft_pitch",
                    action="store_false")
    ap.add_argument("--speakers", type=int, nargs="*", default=None,
                    help="train only on these speaker ids (OOD protocol: "
                         "hold out the rest; pairs touching held-out "
                         "speakers are excluded)")
    ap.add_argument("--periodicity-weight", type=float, default=0.0,
                    help="weight of the rendered-waveform periodicity "
                         "anchor (1 - autocorr at the ground-truth period "
                         "lag, per voiced frame; training/distill.py:"
                         "periodicity_loss) applied in BOTH phases -- the "
                         "r6 diagnosis showed the renderer's periodicity "
                         "collapse, not the estimator, dominates "
                         "converted-F0 RMSE")
    ap.add_argument("--register-boost", type=float, default=1.0,
                    help="sampling weight multiplier for high-register "
                         "pairs (mean voiced F0 ramp 240->320 Hz); the r6 "
                         "pitch diagnosis showed renderer collapse on the "
                         "under-sampled top band dominates converted-F0 "
                         "RMSE")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--report", default=os.path.join(REPO, "docs",
                                                     "TRAIN_REAL_REPORT.json"))
    ap.add_argument("--ckpt-dir", default="/tmp/beatrice_train_ckpt")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--overwrite", action="store_true",
                    help="allow re-initializing an existing model dir")
    args = ap.parse_args()

    import jax

    from beatrice_vst_tpu.models.io import (init_random_model_dir,
                                            load_model_dir, save_weights)
    from beatrice_vst_tpu.training import (PairDataset, make_pair_batcher,
                                           train, train_gan)

    with open(os.path.join(args.corpus, "manifest.json")) as f:
        manifest = json.load(f)
    n_voices = manifest["n_speakers"]
    if args.speakers is not None:
        # OOD protocol: the model only has voices for the TRAINED
        # speakers; held-out targets are reachable only through the
        # morph path.  Require a contiguous 0..k-1 subset so the corpus
        # speaker ids index the smaller bank unchanged.
        assert sorted(args.speakers) == list(range(len(args.speakers))), \
            "--speakers must be a contiguous prefix 0..k-1"
        n_voices = len(args.speakers)

    if args.resume and os.path.isdir(args.out):
        _, model_cfg, params, bank = load_model_dir(args.out)
    else:
        # Refuse to silently clobber an existing (possibly shipped) model
        # dir: a fresh run at 04:31 r3 overwrote the committed trained
        # models_demo/klatt8 with its random init and every downstream
        # eval quietly measured a random model until the garbage metrics
        # gave it away.
        if os.path.exists(os.path.join(args.out, "weights.npz")) \
                and not args.overwrite:
            raise SystemExit(
                f"{args.out} already holds a model; pass --resume to "
                "continue it or --overwrite to re-initialize")
        _, model_cfg, params, bank = init_random_model_dir(
            args.out, version="2.0.0-rc.0", n_voices=n_voices,
            seed=args.seed, name="klatt8-demo",
        )

    name_filter = None
    if args.speakers is not None:
        allowed = set(args.speakers)

        def name_filter(name):  # pair names are u{j:03d}_s{s}_t{t}
            import re

            m = re.match(r"u\d+_s(\d+)_t(\d+)$", name)
            return bool(m) and int(m.group(1)) in allowed \
                and int(m.group(2)) in allowed

    ds = PairDataset(os.path.join(args.corpus, "pairs"),
                     name_filter=name_filter)
    print(f"dataset: {len(ds.items)} pairs, {ds.n_frames_total()} frames "
          f"({ds.n_frames_total() * 0.01 / 3600:.2f} h)", flush=True)
    batches = make_pair_batcher(
        ds, model_cfg, bank, batch=args.batch, frames=args.frames,
        seed=args.seed, register_boost=args.register_boost,
    )

    t0 = time.time()
    log = []

    def log_fn(msg):
        print(msg, flush=True)
        log.append(msg)

    # Executed-vs-requested accounting (ADVICE r4): a --resume against a
    # checkpoint dir already at >= --steps silently turns the burst into
    # a no-op whose report (steps N, empty loss curve, seconds of wall)
    # then overwrites the real burst's evidence.  Record both numbers and
    # refuse to run a burst that would execute zero steps in BOTH phases.
    from beatrice_vst_tpu.training.checkpoint import latest_step

    start_distill = (latest_step(args.ckpt_dir) or 0) if args.resume else 0
    start_gan = (latest_step(args.ckpt_dir + "_gan") or 0) \
        if args.resume else 0
    exec_distill = max(0, args.steps - start_distill)
    exec_gan = max(0, args.gan_steps - start_gan)
    if exec_distill == 0 and exec_gan == 0 and (args.steps or args.gan_steps):
        raise SystemExit(
            f"resume-and-skip: checkpoints at step {start_distill} (distill)"
            f" / {start_gan} (gan) already cover --steps {args.steps} /"
            f" --gan-steps {args.gan_steps}; nothing would run. Clear the"
            " ckpt dirs for a fresh burst or raise the step targets.")
    if args.resume and (start_distill or start_gan):
        print(f"resume: distill from step {start_distill} "
              f"({exec_distill} to run), gan from {start_gan} "
              f"({exec_gan} to run)", flush=True)

    params, history = train(
        params, model_cfg, batches, steps=args.steps, lr=args.lr,
        log_every=50, log_fn=log_fn, ckpt_dir=args.ckpt_dir,
        save_every=1000, resume=args.resume, f0_weight=args.f0_weight,
        soft_pitch=args.soft_pitch, lr_schedule=args.lr_schedule,
        periodicity_weight=args.periodicity_weight,
    )
    distill_wall = time.time() - t0

    gan_history = []
    if args.gan_steps:
        t1 = time.time()
        params, gan_history = train_gan(
            params, model_cfg, batches, steps=args.gan_steps,
            lr=args.lr * 0.5, seed=args.seed, log_every=50, log_fn=log_fn,
            ckpt_dir=args.ckpt_dir + "_gan", save_every=400,
            resume=args.resume, soft_pitch=args.soft_pitch,
            periodicity_weight=args.periodicity_weight,
        )
        gan_wall = time.time() - t1
    else:
        gan_wall = 0.0

    save_weights(os.path.join(args.out, "weights.npz"), params)
    report = {
        "device": str(jax.devices()[0]),
        "corpus": manifest,
        "batch": args.batch,
        "frames_per_example": args.frames,
        "f0_weight": args.f0_weight,
        "register_boost": args.register_boost,
        "periodicity_weight": args.periodicity_weight,
        "soft_pitch": args.soft_pitch,
        "lr_schedule": args.lr_schedule,
        "train_speakers": args.speakers,
        "distill": {
            "steps": args.steps,
            "steps_executed": exec_distill,
            "resumed_from_step": start_distill,
            "loss_curve": history,
            "wall_s": round(distill_wall, 1),
        },
        "gan": {
            "steps": args.gan_steps,
            "steps_executed": exec_gan,
            "resumed_from_step": start_gan,
            "g_loss_curve": gan_history,
            "wall_s": round(gan_wall, 1),
        },
        "model_dir": os.path.relpath(args.out, REPO),
        "ended_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    out_path = args.report
    # Burst-append (VERDICT r4 weak #1a): never destroy a previous
    # burst's record at the same path -- the existing report's phase
    # records move into a cumulative "bursts" history.
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
        except (json.JSONDecodeError, OSError):
            prev = None
        if prev:
            bursts = prev.pop("bursts", [])
            bursts.append({k: prev.get(k) for k in
                           ("distill", "gan", "ended_at", "model_dir")})
            report["bursts"] = bursts
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"saved {args.out} + {out_path}")


if __name__ == "__main__":
    main()
