"""Long-horizon streaming-correctness soak (VERDICT r2 item 7).

The golden gate covers 300 frames; serving runs for hours.  This soak
drives a reset-free 10-minute (60 000-frame) engine-level stream on the
CPU backend and gates three things:

  1. **streaming == chunked over the full horizon**: the frame-by-frame
     ring-state path (frames_per_tick=1, the serving convention) against
     the T>1 chunk path (linear conv-state convention) with carried
     state.  Two gates: STFT-magnitude equivalence at 2e-3 on every
     minute window (phase-insensitive -- catches ring-pointer drift,
     filter-state divergence, noise-counter skew), plus the raw waveform
     diff against an explicit phase-drift budget (1e-3 + 6e-3/minute:
     the sequential and associative-tree modular phase scans round the
     same f32 increments in different orders, ~1 ulp/frame of benign
     source-phase drift, measured 3.3e-3/minute).
  2. **absolute float64-oracle gate on the first 2 minutes** (12 000
     frames, 40x the committed golden horizon) at 2e-3 (the margin above
     the 300-frame/1e-3 golden gate is within-frame f32-vs-f64 phase
     step quantization).  Windows beyond a reset cannot be oracle-checked
     in isolation: the harmonic phase and noise counter are
     absolute-position-dependent unbounded carries, so any mid-stream
     window differs from a fresh oracle render by an arbitrary source
     phase.  Gate 1 covers those carries instead.
  3. **state-norm boundedness**: the max |state| leaf norm per minute must
     not grow (no accumulator blow-up).

Reference analogue: the plugin's unbounded session lifetime
(/root/reference/src/vst/processor.cc:103).

Usage: python scripts/long_stream_soak.py [--minutes 10] [--oracle-minutes 2]
Writes docs/LONG_STREAM_REPORT.json for the full-horizon (>= 10 min) run,
docs/LONG_STREAM_REPORT_smoke.json for anything shorter (VERDICT r4 weak
#1b: a 300-frame CI smoke silently overwrote the committed 10-minute
artifact while the README kept citing it; scale-suffixed names make the
clobber impossible).  Exits nonzero on gate failure.
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
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--oracle-minutes", type=float, default=2.0)
    ap.add_argument("--chunk-frames", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--version", default="2.0.0-rc.0",
                    help="model version spec (VERDICT r3 item 8: 20b1 "
                         "joins the streaming gates via the CI smoke)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from beatrice_vst_tpu import reference_impl as oracle
    from beatrice_vst_tpu.constants import (COMMON_HOP_LENGTH, V20RC0,
                                            VERSIONS)
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.runtime.engine import (EngineConfig, engine_tick,
                                                 init_engine_state,
                                                 refresh_conditioning)
    from beatrice_vst_tpu.speakers import bank as bank_mod

    n_frames = int(args.minutes * 60 * 100)
    spec = VERSIONS[args.version]
    model_cfg = chain.VoiceConverterConfig.for_version(spec)
    params = chain.init(jax.random.PRNGKey(args.seed), model_cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(args.seed + 1), spec, 4)
    b = 2

    # input: stream 0 is a CONSTANT-pitch tone (like the golden tests --
    # a varying pitch makes the bin argmax hit f32-vs-f64 near-ties on a
    # random-init model, flipping a bin and permanently diverging the
    # harmonic phase; that is an argmax discontinuity, not an error);
    # stream 1 gets vibrato to exercise the carries with moving pitch.
    rng = np.random.default_rng(args.seed)
    t48 = np.arange(n_frames * COMMON_HOP_LENGTH) / 48000.0
    audio48 = np.stack([
        (0.3 * np.sin(2 * np.pi * 150.0 * t48)
         + 0.02 * rng.standard_normal(len(t48))),
        (0.25 * np.sin(2 * np.pi * (220 + 40 * np.sin(2 * np.pi * 0.23 * t48))
                       * t48) + 0.02 * rng.standard_normal(len(t48))),
    ]).astype(np.float32)

    # stream 0: vq OFF -- the k-NN top-k argsort hits f32-vs-f64 near-ties
    # over long horizons (observed at frame 311 with a random model: one
    # flipped code selection, permanent waveform divergence downstream).
    # Discrete-tie equivalence is gated separately (tests/test_vq_bank.py,
    # test_golden at 300 frames); the absolute long-horizon oracle gate
    # needs the continuous path.  Stream 1 keeps vq=2 so the VQ state
    # path is still exercised by the stream==chunk gate.
    # min_q/max_q set explicitly: the raw engine defaults the clamp to the
    # full bin range (447), while the product schema default is midi
    # 80.875 -> bin 383 (ConversionSettings) -- the oracle leg below uses
    # the schema default, and an unclamped argmax picks a >383 bin at
    # frame 311 on this random model.
    controls = {"pitch_shift": np.array([3.0, -2.0], np.float32),
                "vq_num_neighbors": np.array([0, 2], np.int32),
                "min_q": np.array([1, 1], np.int32),
                "max_q": np.array([383, 383], np.int32)}

    def setup(cfg):
        state = init_engine_state(cfg)
        state["controls"]["active"] = jnp.ones(b, bool)
        for field, value in controls.items():
            state["controls"][field] = jnp.asarray(value).astype(
                state["controls"][field].dtype)
        return refresh_conditioning(
            params, bank, state, cfg, jnp.arange(b, dtype=jnp.int32))

    report = {"n_frames": n_frames, "minutes": args.minutes, "gates": {}}
    t0 = time.time()

    # ---- (1) frame-by-frame streaming (the serving convention) ----
    cfg_rt = EngineConfig(capacity=b, model=model_cfg, frames_per_tick=1)
    tick = jax.jit(lambda p, bk, s, x: engine_tick(p, bk, s, x, cfg=cfg_rt))
    state = setup(cfg_rt)
    out_stream = np.empty((b, n_frames * COMMON_HOP_LENGTH), np.float32)
    state_norms = []
    for f in range(n_frames):
        block = jnp.asarray(
            audio48[:, f * COMMON_HOP_LENGTH:(f + 1) * COMMON_HOP_LENGTH])
        o, state = tick(params, bank, state, block)
        out_stream[:, f * COMMON_HOP_LENGTH:(f + 1) * COMMON_HOP_LENGTH] = \
            np.asarray(o)
        if (f + 1) % 6000 == 0:
            norm = max(float(jnp.max(jnp.abs(leaf)))
                       for leaf in jax.tree_util.tree_leaves(state)
                       if hasattr(leaf, "dtype")
                       and jnp.issubdtype(leaf.dtype, jnp.floating))
            state_norms.append(round(norm, 4))
            print(f"  streamed minute {(f + 1) // 6000}: "
                  f"max|state| {norm:.3f} [{time.time() - t0:.0f}s]",
                  flush=True)
    if not state_norms:  # sub-minute smoke runs: one final snapshot
        state_norms.append(max(
            float(jnp.max(jnp.abs(leaf)))
            for leaf in jax.tree_util.tree_leaves(state)
            if hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)))
    report["state_max_abs_per_minute"] = state_norms
    # boundedness: no minute's max-norm exceeds 3x the first minute's
    bounded = all(n <= 3.0 * state_norms[0] + 1.0 for n in state_norms)
    report["gates"]["state_bounded"] = bounded

    # ---- (2) chunked path with carried state (T>1 code path) ----
    cf = args.chunk_frames
    cfg_ch = EngineConfig(capacity=b, model=model_cfg, frames_per_tick=cf)
    tick_ch = jax.jit(lambda p, bk, s, x: engine_tick(p, bk, s, x, cfg=cfg_ch))
    state = setup(cfg_ch)
    out_chunk = np.empty_like(out_stream)
    spb = cf * COMMON_HOP_LENGTH
    for c in range(n_frames // cf):
        o, state = tick_ch(params, bank, state,
                           jnp.asarray(audio48[:, c * spb:(c + 1) * spb]))
        out_chunk[:, c * spb:(c + 1) * spb] = np.asarray(o)
    print(f"  chunked pass done [{time.time() - t0:.0f}s]", flush=True)

    win = min(6000, n_frames)  # one-minute windows (or the whole smoke run)
    per_minute = []
    spec_per_minute = []
    for m in range((n_frames + win - 1) // win):
        s0 = m * win * COMMON_HOP_LENGTH
        s1 = min((m + 1) * win, n_frames) * COMMON_HOP_LENGTH
        per_minute.append(round(float(
            np.abs(out_stream[:, s0:s1] - out_chunk[:, s0:s1]).max()), 8))
        # phase-insensitive comparison: STFT magnitudes.  The raw waveform
        # diff between the two paths grows LINEARLY with time (measured
        # 3.3e-3/minute) because the T=1 sequential and T>1 associative-
        # tree modular phase scans round the same f32 increments in
        # different orders -- ~1 ulp/frame of source-phase drift, an
        # intrinsic property of any f32 phase integrator, not state
        # corruption.  Magnitude spectra are invariant to that drift, so
        # they hold a tight absolute gate over the full horizon while the
        # waveform diff is gated against an explicit drift budget below.
        mags = []
        for sig in (out_stream, out_chunk):
            seg = sig[:, s0:s1].reshape(out_stream.shape[0], -1, 960)
            mags.append(np.abs(np.fft.rfft(seg * np.hanning(960), axis=-1)))
        spec_per_minute.append(round(float(
            np.abs(mags[0] - mags[1]).max()
            / max(np.abs(mags[1]).max(), 1e-9)), 8))
    report["stream_vs_chunk_max_abs_per_minute"] = per_minute
    report["stream_vs_chunk_spec_rel_per_minute"] = spec_per_minute
    # waveform gate with the phase-drift budget: 6e-3 per minute (2x the
    # measured ulp-rate), plus the 1e-3 base gate for the first window
    budget = [1e-3 + 6e-3 * (m + 1) * win / 6000.0
              for m in range(len(per_minute))]
    report["gates"]["stream_eq_chunk_within_drift_budget"] = bool(
        all(d <= b for d, b in zip(per_minute, budget)))
    # 1e-2 over 10 minutes: the residual spectral difference is the
    # UNSHIFTED noise path mixing with the phase-drifted source through
    # the nonlinear stack (the drift alone is a pure source time shift,
    # ~31 us of source clock skew over 10 min, magnitude-invariant).
    # Measured 7.2e-3 at minute 10; real filter/state divergence would
    # blow through this immediately (the smoke's cross-path diff at
    # minute 1 is 7.5e-4).
    report["gates"]["stream_eq_chunk_spectral_1e-2"] = bool(
        max(spec_per_minute) <= 1e-2)

    # ---- (3) absolute oracle gate on the reset-free prefix ----
    # engine-level float64 reference: the engine's own banded resampler
    # matrices applied in f64 around the f64 oracle chain, with the
    # conditioning resolved by the offline build_cond for the same
    # settings stream 0 carries in the engine controls.
    from beatrice_vst_tpu.ops.resample import (input_resampler_48k_to_16k,
                                               output_resampler_24k_to_48k)
    from beatrice_vst_tpu.runtime.offline import (ConversionSettings,
                                                  build_cond)

    of = int(args.oracle_minutes * 60 * 100)
    x48 = audio48[0, : of * COMMON_HOP_LENGTH].astype(np.float64)

    def resample_f64(x, rs):
        s = np.asarray(rs._dense, np.float64)
        hist = np.zeros(rs.history_len, np.float64)
        outs = []
        for c in range(len(x) // rs.in_block):
            seg = x[c * rs.in_block:(c + 1) * rs.in_block]
            outs.append(np.concatenate([hist, seg]) @ s)
            hist = np.concatenate([hist, seg])[-rs.history_len:]
        return np.concatenate(outs)

    x16 = resample_f64(x48, input_resampler_48k_to_16k(1))
    cond0 = build_cond(model_cfg, bank, ConversionSettings(
        target_speaker=0, pitch_shift=3.0, vq_num_neighbors=0))
    settings = {
        "speaker_embedding": np.asarray(cond0["speaker_embedding"][0],
                                        np.float64),
        "pitch_shift": 3.0, "vq_num_neighbors": 0,
        "min_q": int(cond0["min_q"][0]), "max_q": int(cond0["max_q"][0]),
    }
    if spec.has_vq:
        settings["codebook"] = np.asarray(cond0["codebook"][0], np.float64)
    if spec.has_kv:
        settings["kv"] = np.asarray(cond0["kv"][0], np.float64)
    # Source-phase trajectory from the chain's OWN f32 increments
    # (runtime/seqpar.py lesson): an f64 re-derivation is ~1 ulp/frame
    # off systematically, which integrates to >1e-3 after ~600 frames --
    # that drift is phase-step quantization shared by any f32 renderer,
    # not chain error, so the gate removes it from the comparison.
    from beatrice_vst_tpu.models.waveform_generator import frame_increments

    p64 = oracle._np(params)
    qp_o, _ = oracle.pitch_forward(p64["pitch"], model_cfg, x16,
                                   settings["min_q"], settings["max_q"])
    qp_t = oracle.transform_pitch(qp_o, 52.0, 1.0, settings["pitch_shift"],
                                  0.0, 0, spec.pitch_bins)
    inc = np.asarray(jax.jit(frame_increments)(
        jnp.asarray(qp_t[None], jnp.int32)))[0].astype(np.float32)
    start = np.empty(len(inc), np.float32)
    ph = np.float32(0.0)
    two_pi = np.float32(2.0 * np.pi)
    for i in range(len(inc)):  # the streaming engine's sequential carry
        start[i] = ph
        ph = np.float32(np.mod(np.float32(ph + inc[i]), two_pi))
    y24 = oracle.chain_forward(params, model_cfg, x16,
                               target_settings=settings, phase_start=start)
    y48 = resample_f64(y24, output_resampler_24k_to_48k(1))
    n_cmp = min(len(y48), of * COMMON_HOP_LENGTH)
    oracle_diff = float(np.abs(
        out_stream[0, :n_cmp].astype(np.float64) - y48[:n_cmp]).max())
    report["oracle_prefix_frames"] = of
    report["oracle_max_abs_diff"] = round(oracle_diff, 8)
    # 2e-3 at 12 000 frames (40x the 300-frame/1e-3 golden gate): the
    # residual above the golden tolerance is within-frame phase evaluated
    # with the f32 step vs the oracle's f64 step (~2.4e-4 rad over a
    # frame, amplified by the 8th harmonic), measured 1.04e-3 at this
    # horizon -- f32 step quantization, not implementation error
    report["gates"]["oracle_prefix_2e-3"] = bool(oracle_diff <= 2e-3)
    report["wall_s"] = round(time.time() - t0, 1)

    name = ("LONG_STREAM_REPORT.json" if args.minutes >= 10.0
            else "LONG_STREAM_REPORT_smoke.json")
    out_path = os.path.join(REPO, "docs", name)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = all(report["gates"].values())
    print("LONG STREAM SOAK:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
