"""Training/distillation harness.

The reference ships no training code (its models are closed binaries); the
framework still needs one because the Beatrice-2 architectures must be
trained or distilled to reach behavioral parity (SURVEY.md section 7,
"hard parts").  This module provides the TPU-native training step used for
distillation against recorded (input, converted-output) pairs -- and it is
the "full training step" exercised by the multi-chip dry run: data-parallel
over the 'streams' mesh axis, optional tensor-parallel weights over
'model'.

Losses: multi-resolution STFT (the standard vocoder reconstruction loss)
plus L1 waveform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models import chain

STFT_RESOLUTIONS = ((512, 128), (1024, 256), (256, 64))  # (fft, hop)


def _stft_mag(x, n_fft: int, hop: int):
    """[B, n] -> [B, frames, bins] magnitude via strided windows + rFFT."""
    n = x.shape[-1]
    frames = max(1, (n - n_fft) // hop + 1)
    idx = jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    win = jnp.hanning(n_fft).astype(x.dtype)
    seg = x[..., idx] * win
    return jnp.abs(jnp.fft.rfft(seg, axis=-1))


def multi_resolution_stft_loss(pred, target):
    loss = 0.0
    for n_fft, hop in STFT_RESOLUTIONS:
        p = _stft_mag(pred, n_fft, hop)
        t = _stft_mag(target, n_fft, hop)
        sc = jnp.linalg.norm(t - p) / (jnp.linalg.norm(t) + 1e-6)  # spectral convergence
        mag = jnp.mean(jnp.abs(jnp.log(p + 1e-5) - jnp.log(t + 1e-5)))
        loss = loss + sc + mag
    return loss / len(STFT_RESOLUTIONS)


def f0_to_bin(f0_hz, pitch_bins: int):
    """True F0 (Hz) -> quantized pitch bin (the fixed bin<->Hz mapping the
    vocoder's harmonic source uses, constants.quantized_pitch_to_hz:
    bin = (midi - 33) * 8).  f0 <= 0 maps to bin 0 (unvoiced)."""
    import numpy as np

    f0 = np.asarray(f0_hz, np.float32)
    midi = 69.0 + 12.0 * np.log2(np.maximum(f0, 1e-3) / 440.0)
    bins = np.clip(np.round((midi - 33.0) * 8.0), 1, pitch_bins - 1)
    return np.where(f0 > 0, bins, 0).astype(np.int32)


def pitch_supervision_losses(taps, f0_bin):
    """(CE on pitch bins, BCE on the voicing gate) from chain taps.

    Shared by the distillation and GAN generator objectives so adversarial
    polish cannot silently un-anchor the pitch estimator (the GAN step
    previously scored only STFT+L1 -- pitch supervision vanished there).
    """
    logits = taps["pitch_logits"]  # [B, T, bins]
    t = min(logits.shape[1], f0_bin.shape[1])
    lg, fb = logits[:, :t], f0_bin[:, :t]
    voiced = (fb > 0).astype(jnp.float32)
    ce = -jnp.take_along_axis(jax.nn.log_softmax(lg, -1),
                              fb[..., None], axis=-1)[..., 0]
    l_f0 = jnp.sum(ce * voiced) / jnp.maximum(voiced.sum(), 1.0)
    # voicing gate: pitch feature 0 drives the harmonic-source gate
    # through a sigmoid (waveform_generator: periodicity) -- supervise
    # it as a voiced/unvoiced logit (BCE), otherwise the gate stays
    # half-open noise (measured 0.65 voicing agreement without this)
    per = taps["pitch_feats"][:, :t, 0]
    l_voice = jnp.mean(jnp.maximum(per, 0) - per * voiced
                       + jnp.log1p(jnp.exp(-jnp.abs(per))))
    return l_f0, l_voice


def periodicity_loss(pred24, f0_bin, frame: int = 240, window: int = 480):
    """Differentiable periodicity anchor on the RENDERED waveform.

    The r6 pitch diagnosis (docs/PITCH_DIAGNOSIS.json) showed converted-F0
    RMSE is dominated by renderer collapse: on high-register pairs even
    teacher-forced bins render barely-voiced audio (tracker voiced_frac
    ~0.3, 1300-1600 cents), while the estimator itself tracks fine.  The
    reconstruction/adversarial losses reward spectral envelope (MCD kept
    improving across bursts while F0 RMSE rose) -- nothing in the
    objective directly demands the render be PERIODIC at the conditioned
    F0.  This term does: for each voiced frame, 1 - the normalized
    autocorrelation of the predicted 24 kHz waveform at the ground-truth
    period lag (the differentiable form of what the eval's
    autocorrelation tracker measures).

    pred24: [B, n] rendered audio at 24 kHz; f0_bin: [B, T] ground-truth
    quantized-pitch bins (0 = unvoiced; fixed bin->Hz mapping midi =
    bin/8 + 33).  Frames whose window+lag would read past the end are
    masked out, not padded (zero-padding would fake decorrelation).
    """
    bsz, n = pred24.shape
    t_n = min(f0_bin.shape[1], n // frame)
    fb = f0_bin[:, :t_n]
    midi = fb.astype(jnp.float32) / 8.0 + 33.0
    f0 = 440.0 * 2.0 ** ((midi - 69.0) / 12.0)
    # 24000/460 Hz ~ 52 .. 24000/55 Hz ~ 436 samples
    lag = jnp.clip(jnp.round(24000.0 / f0), 48.0, 440.0).astype(jnp.int32)
    starts = jnp.arange(t_n, dtype=jnp.int32) * frame          # [T]
    i = jnp.arange(window, dtype=jnp.int32)                    # [W]
    idx0 = starts[:, None] + i[None, :]                        # [T, W]
    x0 = pred24[:, idx0.reshape(-1)].reshape(bsz, t_n, window)
    idx1 = idx0[None, :, :] + lag[:, :, None]                  # [B, T, W]
    max_idx = n - 1
    valid = (idx1[:, :, -1] <= max_idx)                        # [B, T]
    x1 = jnp.take_along_axis(
        pred24, jnp.minimum(idx1, max_idx).reshape(bsz, -1), axis=1
    ).reshape(bsz, t_n, window)
    dot = jnp.sum(x0 * x1, -1)
    e0 = jnp.sum(x0 * x0, -1)
    e1 = jnp.sum(x1 * x1, -1)
    r = dot * jax.lax.rsqrt(e0 * e1 + 1e-8)
    mask = (fb > 0).astype(jnp.float32) * valid.astype(jnp.float32)
    return jnp.sum((1.0 - r) * mask) / jnp.maximum(mask.sum(), 1.0)


def distillation_loss(params, cfg, audio16, target24, cond, state=None,
                      f0_bin=None, f0_weight: float = 1.0,
                      soft_pitch: bool = False,
                      periodicity_weight: float = 0.0):
    """Forward the chain and score against the target 24 kHz waveform.

    f0_bin: optional [B, T] int32 ground-truth quantized-pitch bins
    (0 = unvoiced/ignore).  The vocoder's source runs at the FIXED
    bin->Hz mapping, so without direct supervision the pitch estimator
    has no anchor tying its argmax scale to physical frequency -- the
    waveform losses alone leave it hundreds of cents off (measured:
    ~800 cents F0 RMSE after 5k unsupervised steps on the synthetic
    corpus).  Real VC training uses a pitch tracker's output exactly
    this way.

    soft_pitch=True trains with the vocoder conditioned on E[bin] over
    the pitch logits (chain.apply soft_pitch): waveform losses then
    backpropagate into the pitch estimator (the argmax blocks them), so
    the STFT/L1 objectives refine sub-bin pitch and harmonicity on top of
    the CE anchor.
    """
    if state is None:
        state = chain.init_state(cfg, (audio16.shape[0],))
    if f0_bin is None:
        pred, _ = chain.apply(params, cfg, audio16, state, cond,
                              soft_pitch=soft_pitch)
        aux = {}
    else:
        pred, _, taps = chain.apply(params, cfg, audio16, state, cond,
                                    with_taps=True, soft_pitch=soft_pitch)
        l_f0, l_voice = pitch_supervision_losses(taps, f0_bin)
        aux = {"f0": l_f0, "voice": l_voice}
    l_stft = multi_resolution_stft_loss(pred, target24)
    l_wav = jnp.mean(jnp.abs(pred - target24))
    total = (l_stft + l_wav + f0_weight * aux.get("f0", 0.0)
             + f0_weight * aux.get("voice", 0.0))
    if periodicity_weight and f0_bin is not None:
        l_perio = periodicity_loss(pred, f0_bin)
        total = total + periodicity_weight * l_perio
        aux["perio"] = l_perio
    return total, {"stft": l_stft, "l1": l_wav, **aux}


def make_optimizer(lr: float = 2e-4, weight_decay: float = 1e-2,
                   total_steps: int | None = None, warmup: int = 500):
    """AdamW; with total_steps, a linear-warmup cosine decay to 5% of
    peak (the r3 flagship plateaued at ~1.8-2.0 under constant LR --
    docs/TRAIN_R3_CPU_FINETUNE2.json -- the standard vocoder fix is a
    decaying schedule)."""
    if total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            0.0, lr, min(warmup, total_steps // 10 + 1), total_steps,
            end_value=0.05 * lr)
    return optax.adamw(lr, b1=0.9, b2=0.99, weight_decay=weight_decay)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "optimizer", "f0_weight",
                                    "soft_pitch", "periodicity_weight"))
def train_step(params, opt_state, batch, *, cfg, optimizer,
               f0_weight: float = 1.0, soft_pitch: bool = False,
               periodicity_weight: float = 0.0):
    """One distillation step.  batch: {audio16 [B, T*160], target24
    [B, T*240], cond: chain cond dict[, f0_bin [B, T] int32]}."""
    (loss, aux), grads = jax.value_and_grad(distillation_loss, has_aux=True)(
        params, cfg, batch["audio16"], batch["target24"], batch["cond"],
        f0_bin=batch.get("f0_bin"), f0_weight=f0_weight,
        soft_pitch=soft_pitch, periodicity_weight=periodicity_weight,
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, **aux}
