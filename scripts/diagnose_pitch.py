"""Isolate the converted-pitch regression: estimator vs renderer.

VERDICT round 2 item 1: converted F0 RMSE is 212 cents vs 59 for
do-nothing, so the chain is NOT preserving prosody (the product's
defining behavior -- the reference's pitch path is pure shift math on
the *input* pitch, processor_core_0.cc:58-117).  This script splits the
error between the two suspects:

  A. the pitch ESTIMATOR: decode its qp_raw bins to Hz and score them
     against the synthesis plan's ground-truth F0 (the corpus shares one
     F0 contour across speakers, training/synthesis.py).
  B. the waveform GENERATOR: render with TEACHER-FORCED ground-truth
     bins (+ saturated periodicity gate) and track the output's F0 --
     any remaining error is the renderer's own.

Also reports the voicing decision (sigmoid of pitch feature 0) against
the plan's voicing track, and the full-chain tracked-F0 error for
reference.  Runs on CPU by default (keeps the TPU chip free).

Usage: python scripts/diagnose_pitch.py [--model models_demo/klatt8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.path.join(REPO, "models_demo", "klatt8"))
    ap.add_argument("--utts", type=int, nargs="*", default=[45, 46, 47])
    ap.add_argument("--pairs-per-utt", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "PITCH_DIAGNOSIS.json"))
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from beatrice_vst_tpu.constants import quantized_pitch_to_hz
    from beatrice_vst_tpu.models import chain, waveform_generator
    from beatrice_vst_tpu.models.io import load_model_dir
    from beatrice_vst_tpu.native.host import HostResampler
    from beatrice_vst_tpu.runtime.offline import ConversionSettings, build_cond
    from beatrice_vst_tpu.training import synthesis
    from beatrice_vst_tpu.training.distill import f0_to_bin
    from beatrice_vst_tpu.training.quality import f0_track

    _, cfg, params, bank = load_model_dir(args.model)
    n_spk = bank["additive"].shape[0]
    speakers = synthesis.default_speakers(n_spk)

    # regenerate the eval utterance plans exactly like make_corpus (same
    # seed stream: plans are drawn sequentially from one generator)
    rng_plan = np.random.default_rng(args.seed)
    plans = [synthesis.sample_utterance(rng_plan)
             for _ in range(max(args.utts) + 1)]

    def to16k(x48):
        r = HostResampler(48000.0, 16000.0)
        y = r.process(x48.astype(np.float32))
        return np.concatenate([y, r.process(np.zeros(256, np.float32))])

    def cents(a_hz, b_hz):
        return 1200.0 * np.abs(np.log2(np.maximum(a_hz, 1e-3)
                                       / np.maximum(b_hz, 1e-3)))

    tapped = jax.jit(lambda a, c: chain.apply(
        params, cfg, a, chain.init_state(cfg, (1,)), c, with_taps=True))

    def render_forced(taps, cond, qp_forced, per_forced):
        st = chain.init_state(cfg, (1,))
        audio24, _ = waveform_generator.apply(
            params["wg"], cfg.wg, taps["phone"], qp_forced,
            per_forced, cond["speaker_embedding"], st["wg"],
            kv_embedding=cond.get("kv"),
        )
        return audio24

    _rf = jax.jit(render_forced)
    render_forced = lambda **kw: np.asarray(_rf(**kw))[0]  # noqa: E731

    rng = np.random.default_rng(123)
    rows = []
    for j in args.utts:
        segs, f0_plan = plans[j]
        tr, n_plan = synthesis._tracks(segs, f0_plan,
                                       np.random.default_rng(0))
        v_plan = (tr["voiced"] * tr["amp"]) > 0.25  # plan voicing per frame
        for _ in range(args.pairs_per_utt):
            s = int(rng.integers(n_spk))
            t = int(rng.integers(n_spk))
            if s == t:
                continue
            rr = np.random.default_rng(args.seed * 100003 + j * 131 + s)
            x48 = synthesis.render(segs, f0_plan, speakers[s], rr)
            x16 = to16k(x48)
            n_frames = min(len(x16) // 160, n_plan)
            x16 = x16[: n_frames * 160]
            f0p = tr["f0"][:n_frames]
            vp = v_plan[:n_frames]

            cond = build_cond(cfg, bank, ConversionSettings(target_speaker=t))
            audio24, _, taps = tapped(jnp.asarray(x16[None]), cond)
            audio24 = np.asarray(audio24)[0]
            qp_raw = np.asarray(taps["qp_raw"])[0][:n_frames]
            per = np.asarray(taps["pitch_feats"])[0, :, 0][:n_frames]

            # A. estimator accuracy on plan-voiced frames
            est_hz = np.asarray(quantized_pitch_to_hz(qp_raw))
            est_cents = cents(est_hz[vp], f0p[vp])
            v_pred = 1.0 / (1.0 + np.exp(-per)) > 0.5
            voicing_agree = float((v_pred == vp).mean())

            # B. renderer accuracy with teacher-forced bins + gate
            gt_bin = f0_to_bin(f0p, cfg.spec.pitch_bins)
            qp_forced = jnp.asarray(gt_bin[None].astype(np.int32))
            pf = np.array(np.asarray(taps["pitch_feats"])[:, :n_frames])
            pf[0, :, 0] = np.where(vp, 8.0, -8.0)  # saturate the gate
            forced24 = render_forced(
                taps={"phone": taps["phone"][:, :n_frames]}, cond=cond,
                qp_forced=qp_forced, per_forced=jnp.asarray(pf))
            ff, fv = f0_track(np.pad(forced24, (360, 0)), 24000)
            m = min(len(ff), n_frames)
            sel = vp[:m] & fv[:m]
            forced_cents = cents(ff[:m][sel], f0p[:m][sel]) if sel.sum() > 3 else np.array([np.nan])

            # full-chain tracked F0 for reference
            cf, cv = f0_track(np.pad(audio24[: n_frames * 240], (360, 0)), 24000)
            m2 = min(len(cf), n_frames)
            sel2 = vp[:m2] & cv[:m2]
            conv_cents = cents(cf[:m2][sel2], f0p[:m2][sel2]) if sel2.sum() > 3 else np.array([np.nan])

            rows.append({
                "utt": j, "src": s, "tgt": t,
                "estimator_f0_rmse_cents": float(np.sqrt((est_cents ** 2).mean())),
                "estimator_f0_median_cents": float(np.median(est_cents)),
                "voicing_agreement": voicing_agree,
                "forced_render_f0_rmse_cents": float(np.sqrt((forced_cents ** 2).mean())),
                "fullchain_f0_rmse_cents": float(np.sqrt((conv_cents ** 2).mean())),
                "conv_tracker_voiced_frac": float(cv[:m2][vp[:m2]].mean()),
            })
            print(rows[-1], flush=True)

    def agg(key):
        v = [r[key] for r in rows if np.isfinite(r[key])]
        return round(float(np.mean(v)), 2) if v else None

    report = {
        "model": os.path.relpath(args.model, REPO),
        "summary": {k: agg(k) for k in rows[0]
                    if k not in ("utt", "src", "tgt")},
        "rows": rows,
        "interpretation": (
            "estimator_f0_rmse_cents measures suspect A (pitch estimator "
            "bins vs plan F0 on plan-voiced frames); "
            "forced_render_f0_rmse_cents measures suspect B (renderer "
            "given ground-truth bins + saturated voicing gate); "
            "fullchain is the end-to-end tracked error for reference."),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
