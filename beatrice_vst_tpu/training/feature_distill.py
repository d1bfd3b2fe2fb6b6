"""Per-module feature distillation: the path to behavioral parity.

End-to-end waveform distillation (distill.py) optimizes through three
cascaded sub-models at once; its loss landscape flattens long before the
1e-3 waveform-parity gate (tests/test_golden.py's tolerance against the
float64 oracle).  This module decomposes the problem at the reference's
own module boundaries (beatrice.h:65-120: ExtractPhone / EstimatePitch /
GenerateWaveform are separate ABI calls, so module-level supervision is
exactly what recorded teacher traces would provide):

- phone:  MSE on the [B, T, C] phone features
- pitch:  soft cross-entropy on the pre-argmax bin logits + MSE on the
          aux features (the argmax itself is non-differentiable)
- wg:     waveform L1/L2 + multi-resolution STFT, driven by the
          *teacher's* phone/pitch outputs (so the wg learns its mapping
          in isolation from upstream error)

scripts/distill_parity.py runs the study and reports the end-to-end
waveform error floor this achieves against a frozen held-out teacher.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models import chain, phone_extractor, pitch_estimator, waveform_generator
from .distill import multi_resolution_stft_loss


def teacher_taps(params, cfg, audio16, cond):
    """Frozen-teacher forward returning every supervision point."""
    state = chain.init_state(cfg, (audio16.shape[0],))
    audio24, _, taps = chain.apply(params, cfg, audio16, state, cond,
                                   with_taps=True)
    taps = dict(taps)
    taps["audio24"] = audio24
    return taps


def phone_loss(student_phone_params, cfg, audio16, t_phone, cond):
    state = phone_extractor.init_state(cfg.phone, (audio16.shape[0],))
    phone, _ = phone_extractor.apply(student_phone_params, cfg.phone,
                                     audio16, state)
    # supervise the post-VQ feature the wg consumes when VQ is active;
    # with vq_num_neighbors == 0 (this study) the raw feature IS the tap
    return jnp.mean((phone - t_phone) ** 2)


def pitch_loss(student_pitch_params, cfg, audio16, t_logits, t_feats, cond):
    state = pitch_estimator.init_state(cfg.pitch, (audio16.shape[0],))
    _, feats, _, logits = pitch_estimator.apply(
        student_pitch_params, cfg.pitch, audio16, state,
        cond["min_q"], cond["max_q"], with_logits=True,
    )
    # The DOMINANT term is the direct logit match: reproducing the
    # teacher's argmax (what the vocoder consumes) requires matching
    # margins everywhere, and when teacher logits are diffuse the soft-CE
    # saturates at the teacher's own entropy (measured flat at ~log(bins)
    # in the r2 study, qp_match stuck at 0.873 with CE-dominant weights).
    # Argmax agreement additionally gets two direct terms (VERDICT r4
    # item 5: qp_match was the 1e-3 parity limiter at 0.41): a HARD CE on
    # the teacher's winning bin (the tau->0 temperature limit -- the
    # steepest argmax-agreement gradient there is) and a positive-margin
    # hinge requiring every other bin to sit at least `delta` below the
    # teacher's winner (so near-ties get pushed apart instead of left to
    # flip on f32 noise).
    t_soft = jax.nn.softmax(t_logits, axis=-1)
    ce = -jnp.mean(jnp.sum(t_soft * jax.nn.log_softmax(logits, -1), -1))
    l_feat = jnp.mean((feats - t_feats) ** 2)
    l_logit = jnp.mean((logits - t_logits) ** 2)
    t_best = jnp.argmax(t_logits, axis=-1)  # [B, T]
    log_p = jax.nn.log_softmax(logits, -1)
    ce_hard = -jnp.mean(
        jnp.take_along_axis(log_p, t_best[..., None], -1)[..., 0])
    s_at_best = jnp.take_along_axis(logits, t_best[..., None], -1)[..., 0]
    # margin hinge: losers must trail the teacher's winner by >= delta
    # (the winner's own term is exactly delta -- a constant offset with
    # zero gradient contribution beyond the hinge cap)
    delta = 1.0
    margin = jnp.maximum(logits - s_at_best[..., None] + delta, 0.0)
    l_rank = jnp.mean(jnp.sum(margin, -1) - delta)
    return l_logit + l_feat + 0.1 * ce + 0.5 * ce_hard + 0.1 * l_rank


def wg_loss(student_wg_params, cfg, taps, cond):
    b = taps["phone"].shape[0]
    state = waveform_generator.init_state(cfg.wg, (b,))
    audio24, _ = waveform_generator.apply(
        student_wg_params, cfg.wg, taps["phone"], taps["qp"],
        taps["pitch_feats"], cond["speaker_embedding"], state,
        kv_embedding=cond.get("kv"),
    )
    t = taps["audio24"]
    l1 = jnp.mean(jnp.abs(audio24 - t))
    l2 = jnp.mean((audio24 - t) ** 2)
    return l1 + 10.0 * l2 + 0.1 * multi_resolution_stft_loss(audio24, t)


@functools.partial(jax.jit, static_argnames=("cfg", "opt", "module"))
def module_step(student_params, opt_state, teacher_params, batch, *, cfg,
                opt, module):
    """One distillation step for one module; returns new (params, opt
    state, metrics).  batch: {audio16, cond}."""
    audio16, cond = batch["audio16"], batch["cond"]
    taps = teacher_taps(teacher_params, cfg, audio16, cond)

    if module == "phone":
        loss_fn = lambda p: phone_loss(p, cfg, audio16, taps["phone"], cond)
    elif module == "pitch":
        loss_fn = lambda p: pitch_loss(p, cfg, audio16,
                                       taps["pitch_logits"],
                                       taps["pitch_feats"], cond)
    else:
        loss_fn = lambda p: wg_loss(p, cfg, taps, cond)

    loss, grads = jax.value_and_grad(loss_fn)(student_params[module])
    updates, opt_state = opt.update(grads, opt_state, student_params[module])
    student_params = dict(student_params)
    student_params[module] = optax.apply_updates(student_params[module],
                                                 updates)
    return student_params, opt_state, {"loss": loss}


@functools.partial(jax.jit, static_argnames=("cfg",))
def end_to_end_error(student_params, teacher_params, batch, *, cfg):
    """Waveform error of the full student chain vs the full teacher chain
    plus per-stage diagnostics (which module limits the floor)."""
    audio16, cond = batch["audio16"], batch["cond"]
    t = teacher_taps(teacher_params, cfg, audio16, cond)
    state = chain.init_state(cfg, (audio16.shape[0],))
    s_audio, _, s = chain.apply(student_params, cfg, audio16, state, cond,
                                with_taps=True)
    qp_match = jnp.mean((s["qp"] == t["qp"]).astype(jnp.float32))

    # error-budget diagnostics (VERDICT r2 item 3): isolate each module's
    # contribution to the end-to-end floor.
    b = audio16.shape[0]
    # (a) wg-only floor: student wg rendered from the TEACHER's taps --
    # upstream error removed entirely
    wg_state = waveform_generator.init_state(cfg.wg, (b,))
    wg_only, _ = waveform_generator.apply(
        student_params["wg"], cfg.wg, t["phone"], t["qp"],
        t["pitch_feats"], cond["speaker_embedding"], wg_state,
        kv_embedding=cond.get("kv"))
    # (b) teacher-forced BINS only: student phone/feats, teacher's qp --
    # bounds how much of the e2e error the bin disagreements alone cause
    wg_state2 = waveform_generator.init_state(cfg.wg, (b,))
    forced_bins, _ = waveform_generator.apply(
        student_params["wg"], cfg.wg, s["phone"], t["qp"],
        s["pitch_feats"], cond["speaker_embedding"], wg_state2,
        kv_embedding=cond.get("kv"))
    return {
        "wav_l1": jnp.mean(jnp.abs(s_audio - t["audio24"])),
        "wav_max": jnp.max(jnp.abs(s_audio - t["audio24"])),
        "wav_rms": jnp.sqrt(jnp.mean((s_audio - t["audio24"]) ** 2)),
        "teacher_rms": jnp.sqrt(jnp.mean(t["audio24"] ** 2)),
        "phone_rmse": jnp.sqrt(jnp.mean((s["phone"] - t["phone"]) ** 2)),
        "qp_match": qp_match,
        "feats_rmse": jnp.sqrt(
            jnp.mean((s["pitch_feats"] - t["pitch_feats"]) ** 2)),
        "wg_only_wav_l1": jnp.mean(jnp.abs(wg_only - t["audio24"])),
        "teacher_bins_wav_l1": jnp.mean(jnp.abs(forced_bins - t["audio24"])),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def end_to_end_error_soft(student_params, teacher_params, batch, *, cfg):
    """Student-vs-teacher waveform parity in the soft-pitch inference
    mode (chain.apply soft_pitch=True) for BOTH chains.

    The argmax-mode parity floor is dominated by discrete bin
    disagreements (docs/DISTILL_PARITY_REPORT.json limiting_factor): a
    single flipped bin shifts that frame's harmonic source by a whole
    quantization step.  Under soft conditioning the same logit error
    produces a proportionally small waveform error, so this measures the
    achievable behavioral parity of the supported soft inference mode
    (runtime/offline.py ConversionSettings.soft_pitch)."""
    audio16, cond = batch["audio16"], batch["cond"]
    b = audio16.shape[0]
    t_state = chain.init_state(cfg, (b,))
    t_audio, _, t = chain.apply(teacher_params, cfg, audio16, t_state, cond,
                                with_taps=True, soft_pitch=True)
    s_state = chain.init_state(cfg, (b,))
    s_audio, _, s = chain.apply(student_params, cfg, audio16, s_state, cond,
                                with_taps=True, soft_pitch=True)
    return {
        "wav_l1_soft": jnp.mean(jnp.abs(s_audio - t_audio)),
        "wav_max_soft": jnp.max(jnp.abs(s_audio - t_audio)),
        "qp_l1_bins_soft": jnp.mean(jnp.abs(
            s["qp"].astype(jnp.float32) - t["qp"].astype(jnp.float32))),
    }
