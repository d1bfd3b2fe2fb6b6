"""Distillation-to-parity study (VERDICT round-1 item 5).

Can distillation reach the 1e-3 waveform-parity gate (the tolerance the
golden tests hold against the float64 oracle)?  This study distills a
fresh student against a frozen, held-out teacher of the same 20rc0
architecture, using per-module feature supervision at the reference's
own ABI boundaries (training/feature_distill.py), then an end-to-end
waveform polish, and reports the achieved floor with per-stage
diagnostics naming the limiting factor.

Usage: python scripts/distill_parity.py [--corpus /tmp/beatrice_corpus]
       [--steps-per-module 2500] [--e2e-steps 1500] [--batch 16]
       [--frames 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/beatrice_corpus")
    ap.add_argument("--teacher", default=None,
                    help="model dir to use as the frozen teacher (e.g. "
                         "models_demo/klatt8).  A TRAINED teacher has "
                         "peaked pitch logits -- representative of "
                         "distilling the closed reference; the default "
                         "random teacher's near-uniform logits make the "
                         "bin-agreement task adversarially hard "
                         "(argmax of noise).")
    ap.add_argument("--steps-per-module", type=int, default=5000)
    ap.add_argument("--pitch-steps-mult", type=int, default=2,
                    help="extra step budget multiplier for the pitch "
                         "module (qp_match is the 1e-3 parity limiter -- "
                         "VERDICT r4 item 5; the hard-CE + margin-hinge "
                         "objective needs iterations, not capacity)")
    ap.add_argument("--e2e-steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from beatrice_vst_tpu.audio_io import read_wav
    from beatrice_vst_tpu.constants import V20RC0
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.runtime.offline import (ConversionSettings,
                                                  build_cond)
    from beatrice_vst_tpu.speakers import bank as bank_mod
    from beatrice_vst_tpu.training import feature_distill as fd
    from beatrice_vst_tpu.training.data import _to_rate
    from beatrice_vst_tpu.training.distill import (distillation_loss,
                                                   make_optimizer)

    if args.teacher:
        from beatrice_vst_tpu.models.io import load_model_dir

        _, cfg, teacher, bank = load_model_dir(args.teacher)
        n_voices = bank["additive"].shape[0]
    else:
        cfg = chain.VoiceConverterConfig.for_version(V20RC0)
        teacher = chain.init(jax.random.PRNGKey(args.seed + 1), cfg)
        bank = bank_mod.random_bank(jax.random.PRNGKey(args.seed + 3),
                                    V20RC0, 8)
        n_voices = 8
    student = chain.init(jax.random.PRNGKey(args.seed + 2), cfg)

    # speech batches from the synthetic corpus (any speech would do)
    raw = os.path.join(args.corpus, "raw")
    clips = []
    spk_dirs = sorted(d for d in os.listdir(raw)
                      if os.path.isdir(os.path.join(raw, d)))
    for spk in spk_dirs[:4]:
        for fn in sorted(os.listdir(os.path.join(raw, spk)))[:12]:
            a, sr = read_wav(os.path.join(raw, spk, fn))
            clips.append(_to_rate(a, sr, 16000))
    rng = np.random.default_rng(args.seed)
    n16 = args.frames * 160
    conds = [build_cond(cfg, bank, ConversionSettings(target_speaker=t),
                        batch=args.batch) for t in range(n_voices)]

    def make_batch(step):
        out = np.zeros((args.batch, n16), np.float32)
        for b in range(args.batch):
            c = clips[rng.integers(len(clips))]
            o = rng.integers(len(c) - n16)
            out[b] = c[o: o + n16]
        return {"audio16": jnp.asarray(out), "cond": conds[step % len(conds)]}

    report = {"phases": [], "device": str(jax.devices()[0]),
              "teacher": args.teacher or "random-init (held out)"}
    eval_batch = make_batch(7)

    def e2e(tag):
        m = {k: float(v) for k, v in fd.end_to_end_error(
            student, teacher, eval_batch, cfg=cfg).items()}
        # soft-pitch inference-mode parity (both chains soft): the
        # discrete bin-flip floor does not exist in this supported mode
        # (guarded: tolerate an older in-process feature_distill module)
        if hasattr(fd, "end_to_end_error_soft"):
            m.update({k: float(v) for k, v in fd.end_to_end_error_soft(
                student, teacher, eval_batch, cfg=cfg).items()})
        print(tag, json.dumps(m), flush=True)
        return m

    t_start = time.time()
    print("baseline (random student):")
    baseline = e2e("e2e@init")
    report["baseline"] = baseline

    for module in ("phone", "pitch", "wg"):
        n_steps = args.steps_per_module * (
            args.pitch_steps_mult if module == "pitch" else 1)
        opt = optax.adamw(optax.cosine_decay_schedule(
            args.lr, n_steps), weight_decay=1e-3)
        opt_state = opt.init(student[module])
        curve = []
        t0 = time.time()
        for step in range(n_steps):
            student, opt_state, m = fd.module_step(
                student, opt_state, teacher, make_batch(step), cfg=cfg,
                opt=opt, module=module)
            if step % 100 == 0 or step == n_steps - 1:
                loss = float(m["loss"])
                curve.append([step, loss])
                print(f"{module} step {step}: {loss:.6f}", flush=True)
        report["phases"].append({
            "module": module, "steps": n_steps,
            "loss_curve": curve, "wall_s": round(time.time() - t0, 1),
            "e2e_after": e2e(f"e2e@{module}"),
        })

    # end-to-end polish: gradient through the whole student chain against
    # the teacher's waveform (closes the compound upstream error the
    # module phases cannot see)
    if args.e2e_steps:
        opt = make_optimizer(args.lr * 0.1)
        opt_state = opt.init(student)

        from beatrice_vst_tpu.training.distill import (
            multi_resolution_stft_loss)

        @jax.jit
        def e2e_step(params, opt_state, batch, target24, t_qp_raw):
            # pitch-ANCHORED polish: CE on the student's pre-transform
            # bin logits against the teacher's argmax.  The r2-style
            # polish (waveform losses only) measurably ERODED bin
            # agreement (qp_match 0.830 -> 0.787 at 600 steps) because
            # the waveform loss cannot see which frames flipped bins.
            def loss_fn(p):
                state = chain.init_state(cfg, (batch["audio16"].shape[0],))
                pred, _, taps = chain.apply(
                    p, cfg, batch["audio16"], state, batch["cond"],
                    with_taps=True)
                lg = taps["pitch_logits"]
                ce = -jnp.take_along_axis(
                    jax.nn.log_softmax(lg, -1), t_qp_raw[..., None],
                    axis=-1)[..., 0].mean()
                return (multi_resolution_stft_loss(pred, target24)
                        + jnp.mean(jnp.abs(pred - target24)) + ce)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def teacher_wav(batch):
            state = chain.init_state(cfg, (batch["audio16"].shape[0],))
            wav, _, taps = chain.apply(teacher, cfg, batch["audio16"], state,
                                       batch["cond"], with_taps=True)
            return wav, taps["qp_raw"]

        curve = []
        t0 = time.time()
        for step in range(args.e2e_steps):
            b = make_batch(1000 + step)
            t24, t_qp = teacher_wav(b)
            student, opt_state, loss = e2e_step(student, opt_state, b,
                                                t24, t_qp)
            if step % 100 == 0 or step == args.e2e_steps - 1:
                curve.append([step, float(loss)])
                print(f"e2e step {step}: {float(loss):.6f}", flush=True)
        report["phases"].append({
            "module": "e2e_polish", "steps": args.e2e_steps,
            "loss_curve": curve, "wall_s": round(time.time() - t0, 1),
            "e2e_after": e2e("e2e@polish"),
        })

    final = report["phases"][-1]["e2e_after"]
    gate = 1e-3
    report.update({
        "wall_s_total": round(time.time() - t_start, 1),
        "gate": gate,
        "gate_reached": bool(final["wav_max"] < gate),
        "final": final,
        "analysis": {
            "wav_l1_vs_gate": final["wav_l1"] / gate,
            # per-module error budget (VERDICT r2 item 3): wg_only is the
            # student wg on the teacher's own taps (upstream error
            # removed); teacher_bins adds back student phone/feats but
            # keeps the teacher's pitch bins -- the difference between
            # the three wav_l1 numbers attributes the floor
            "error_budget": {
                "wg_only_wav_l1": final.get("wg_only_wav_l1"),
                "plus_student_phone_feats": final.get("teacher_bins_wav_l1"),
                "full_student": final["wav_l1"],
            },
            "limiting_factor": (
                "quantized-pitch bin disagreements (each flipped frame "
                "shifts the harmonic source for that frame)"
                if final["qp_match"] < 0.999 else
                "waveform-generator optimization floor (nonconvex L1/L2 "
                "descent, not architecture mismatch)"),
        },
    })
    if "wav_l1_soft" in final:
        # the bin-flip discontinuity does not exist in the soft-pitch
        # inference mode -- report that mode's parity against the 0.02
        # behavioral gate (VERDICT r3 item 4)
        report["soft_mode"] = {
            "wav_l1": final["wav_l1_soft"],
            "wav_max": final["wav_max_soft"],
            "qp_l1_bins": final["qp_l1_bins_soft"],
            "gate": 0.02,
            "gate_reached": bool(final["wav_l1_soft"] < 0.02),
        }
    out = os.path.join(REPO, "docs", "DISTILL_PARITY_REPORT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"gate_reached": report["gate_reached"],
                      "final": final}))
    print("wrote", out)


if __name__ == "__main__":
    main()
