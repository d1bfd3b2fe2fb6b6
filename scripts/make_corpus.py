"""Synthesize the multi-speaker parallel training corpus.

Renders the Klatt-style corpus (training/synthesis.py) and lays out the
cross-speaker conversion pairs in the PairDataset format
(training/data.py): inputs/<name>.wav + targets/<name>.wav +
speakers.json, where each pair is (speaker s's utterance u ->
speaker t's utterance u, conditioned on voice t).

    corpus_dir/
      raw/spk{k}/utt{j}.wav      every rendition (48 kHz)
      pairs/inputs|targets/...   training pairs (train utterances only)
      pairs/speakers.json        pair name -> target voice id
      manifest.json              speakers, split, seconds

The last --eval-utts utterances are held out entirely (never in pairs/):
scripts/quality_eval.py converts their source renditions and scores
against the target renditions.

Usage: python scripts/make_corpus.py [OUT_DIR] [--utts 50] [--speakers 8]
       [--eval-utts 5] [--pairs-per-utt 16] [--seed 0]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/beatrice_corpus")
    ap.add_argument("--utts", type=int, default=50)
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--eval-utts", type=int, default=5)
    ap.add_argument("--pairs-per-utt", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from beatrice_vst_tpu.audio_io import write_wav
    from beatrice_vst_tpu.training.synthesis import (
        SR, default_speakers, plan_f0_voiced, render, sample_utterance)

    speakers = default_speakers(args.speakers)
    raw = os.path.join(args.out, "raw")
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    rng_plan = np.random.default_rng(args.seed)
    total = 0.0
    plan_f0 = {}
    print(f"rendering {args.utts} utterances x {len(speakers)} speakers ...")
    for j in range(args.utts):
        segs, f0 = sample_utterance(rng_plan)
        plan_f0[f"utt{j:03d}"] = plan_f0_voiced(segs, f0)
        for k, spk in enumerate(speakers):
            rng_r = np.random.default_rng(args.seed * 100003 + j * 131 + k)
            y = render(segs, f0, spk, rng_r, SR)
            d = os.path.join(raw, spk.name)
            os.makedirs(d, exist_ok=True)
            write_wav(os.path.join(d, f"utt{j:03d}.wav"), y, SR)
            total += len(y) / SR

    # training pairs from the train split: for each utterance, sample
    # (src, tgt) combos; identity pairs (src == tgt) are allowed and
    # useful (they anchor content passthrough)
    n_train = args.utts - args.eval_utts
    pairs_dir = os.path.join(args.out, "pairs")
    os.makedirs(os.path.join(pairs_dir, "inputs"))
    os.makedirs(os.path.join(pairs_dir, "targets"))
    rng_pairs = np.random.default_rng(args.seed + 1)
    spk_map = {}
    n_pairs = 0
    for j in range(n_train):
        combos = set()
        want = min(args.pairs_per_utt, len(speakers) ** 2)
        while len(combos) < want:
            combos.add((int(rng_pairs.integers(len(speakers))),
                        int(rng_pairs.integers(len(speakers)))))
        for s, t in sorted(combos):
            name = f"u{j:03d}_s{s}_t{t}"
            src = os.path.join(raw, speakers[s].name, f"utt{j:03d}.wav")
            tgt = os.path.join(raw, speakers[t].name, f"utt{j:03d}.wav")
            os.link(src, os.path.join(pairs_dir, "inputs", name + ".wav"))
            os.link(tgt, os.path.join(pairs_dir, "targets", name + ".wav"))
            spk_map[name] = t
            n_pairs += 1
    with open(os.path.join(pairs_dir, "speakers.json"), "w") as f:
        json.dump(spk_map, f)
    # Exact per-pair F0 labels (r6): the synthesis plan IS the ground
    # truth (one contour shared across speakers, 10 ms frames, 0 =
    # unvoiced) -- PairDataset prefers this over running the
    # autocorrelation tracker, whose octave/formant mistracks (up to
    # 1340 cents on low-register renditions) were feeding the pitch
    # supervision.  raw/f0_plan.npz keeps the per-utterance contours for
    # eval tools.
    np.savez(os.path.join(pairs_dir, "f0_plan.npz"),
             **{name: plan_f0[f"utt{name[1:4]}"] for name in spk_map})
    np.savez(os.path.join(raw, "f0_plan.npz"), **plan_f0)

    manifest = {
        "n_speakers": len(speakers),
        "n_utterances": args.utts,
        "eval_utterances": list(range(n_train, args.utts)),
        "n_pairs": n_pairs,
        "seconds_rendered": round(total, 1),
        "sample_rate": SR,
        "seed": args.seed,
        "speakers": [s.name for s in speakers],
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
