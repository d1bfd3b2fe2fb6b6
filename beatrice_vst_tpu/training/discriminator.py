"""Adversarial discriminators for vocoder training.

The reference ships no training code (its models are closed binaries,
SURVEY.md §2.1), but a complete VC framework must be able to train the
vocoder to natural-speech quality, and reconstruction losses alone leave
audible artifacts.  These are the two standard waveform-GAN critics,
implemented TPU-first (everything is a batched conv/matmul, static
shapes):

  - **Multi-period discriminator (MPD)**: one 2-D conv critic per prime
    period p — the waveform is folded to [B, n/p, p, 1] so periodic
    artifacts at p-sample lags land on one axis of the conv window.
  - **Multi-resolution spectrogram discriminator (MRD)**: one 2-D conv
    critic per STFT resolution, run on log-magnitudes from the same
    strided-window rFFT used by the reconstruction loss.
  - **Pitch-conditioned discriminator (PCD)**: one critic that sees the
    waveform TOGETHER with reference harmonic oscillators at the
    conditioned F0 (cos/sin of k·φ(t), φ integrated from the ground-truth
    per-frame F0 the batch already carries as pitch-supervision bins).
    Real and fake audio get the same channels, so the critic's cheapest
    separating feature is whether the audio's harmonics stay
    frequency-locked to the conditioning — exactly the adversarial
    gradient the r4 pitch diagnosis called for (the converted-F0 error is
    the RENDERER's harmonicity, not the estimator:
    docs/PITCH_DIAGNOSIS.json; VERDICT r4 item 1).  Both sides carry an
    arbitrary phase OFFSET vs the reference ramp (the vocoder's carried
    phase and the corpus synthesizer's are unrelated), but a frequency
    mismatch makes the audio×(cos,sin) product envelopes rotate at the
    difference frequency within the receptive field — locally detectable;
    a constant offset is not a separating feature.

All return (logits, feature-map list) per critic so the generator can use
feature matching.  Plain convs + leaky ReLU (no weight norm: optax adamw's
decoupled weight decay plays the same regularizing role and keeps the
params a flat dict of dense arrays — friendlier to sharding rules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distill import _stft_mag

MPD_PERIODS = (2, 3, 5, 7, 11)
MRD_RESOLUTIONS = ((512, 128), (1024, 256), (256, 64))  # (fft, hop)
PCD_HARMONICS = (1, 2, 4)  # reference oscillators at k x conditioned F0
PCD_SPF = 240              # samples per 10 ms frame at the 24 kHz output
_MPD_CHANNELS = (32, 128, 512, 512)
_MRD_CHANNELS = (32, 64, 128, 128)
_PCD_CHANNELS = (32, 128, 256, 256)
_LRELU = 0.1


def _conv2d_init(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    scale = 1.0 / jnp.sqrt(kh * kw * c_in)
    w = jax.random.uniform(key, (kh, kw, c_in, c_out), dtype, -scale, scale)
    return {"w": w, "b": jnp.zeros((c_out,), dtype)}


def _conv2d(p, x, stride_h: int, compute_dtype=None):
    dt = compute_dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dt), p["w"].astype(dt),
        window_strides=(stride_h, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"].astype(jnp.float32)


def _critic_init(key, channels, kh, kw, c_in=1, dtype=jnp.float32):
    keys = jax.random.split(key, len(channels) + 1)
    layers = []
    for i, c_out in enumerate(channels):
        layers.append(_conv2d_init(keys[i], kh, kw, c_in, c_out, dtype))
        c_in = c_out
    layers.append(_conv2d_init(keys[-1], 3, kw, c_in, 1, dtype))
    return layers


def _critic_apply(layers, x, stride_h: int, compute_dtype=None):
    feats = []
    for p in layers[:-1]:
        x = jax.nn.leaky_relu(_conv2d(p, x, stride_h, compute_dtype), _LRELU)
        feats.append(x)
    logits = _conv2d(layers[-1], x, 1, compute_dtype)
    return logits, feats


def mpd_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, len(MPD_PERIODS))
    return [
        _critic_init(k, _MPD_CHANNELS, kh=5, kw=1, dtype=dtype) for k in keys
    ]


def mrd_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, len(MRD_RESOLUTIONS))
    return [
        _critic_init(k, _MRD_CHANNELS, kh=3, kw=3, dtype=dtype) for k in keys
    ]


def pcd_init(key, dtype=jnp.float32):
    c_in = 1 + 2 * len(PCD_HARMONICS)
    return _critic_init(key, _PCD_CHANNELS, kh=5, kw=3, c_in=c_in,
                        dtype=dtype)


def init(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"mpd": mpd_init(k1, dtype), "mrd": mrd_init(k2, dtype),
            "pcd": pcd_init(k3, dtype)}


def _fold_period(audio, period: int):
    """[B, n] -> [B, ceil(n/p), p, 1] (right-pad with zeros)."""
    b, n = audio.shape
    pad = (-n) % period
    x = jnp.pad(audio, ((0, 0), (0, pad)))
    return x.reshape(b, (n + pad) // period, period, 1)


def pitch_phase_channels(audio, f0_bin):
    """[B, n] audio + [B, T] ground-truth pitch bins -> [B, SPF, T', C].

    Builds the PCD input: the waveform folded frame-major plus reference
    harmonic oscillators cos(k·φ)/sin(k·φ), φ integrated per sample from
    the conditioned F0 (bin -> Hz via the vocoder's fixed mapping,
    constants.quantized_pitch_to_hz: midi = bin/8 + 33), gated to zero in
    unvoiced frames.  Within-frame samples sit on the strided conv axis
    (H), frames on W so kw=3 gives cross-frame context."""
    b, n = audio.shape
    t = min(n // PCD_SPF, f0_bin.shape[1])
    fb = f0_bin[:, :t]
    voiced = (fb > 0).astype(jnp.float32)
    hz = jnp.where(fb > 0,
                   440.0 * 2.0 ** ((fb.astype(jnp.float32) / 8.0 + 33.0
                                    - 69.0) / 12.0), 0.0)
    hz_s = jnp.repeat(hz, PCD_SPF, axis=1)        # [B, t*SPF]
    v_s = jnp.repeat(voiced, PCD_SPF, axis=1)
    # f32 cumsum is fine at training chunk lengths (64 frames: phase
    # <= 2pi*500*0.64 ~ 2e3 rad, ~1e-4 rad ulp); long-horizon rendering
    # uses the modular scan, but the critic only ever sees chunks
    phase = 2.0 * jnp.pi * jnp.cumsum(hz_s, axis=1) / 24000.0
    chans = [audio[:, : t * PCD_SPF]]
    for k in PCD_HARMONICS:
        chans.append(v_s * jnp.cos(k * phase))
        chans.append(v_s * jnp.sin(k * phase))
    x = jnp.stack(chans, axis=-1)                 # [B, t*SPF, C]
    x = x.reshape(b, t, PCD_SPF, x.shape[-1])
    return jnp.transpose(x, (0, 2, 1, 3))         # [B, SPF, t, C]


def apply(params, audio, compute_dtype=None, f0_bin=None):
    """Run every critic on a [B, n] waveform.

    Returns list of (logits, feats) — one entry per MPD period, then per
    MRD resolution, then (when `f0_bin` is given and the params carry a
    "pcd" critic) the pitch-conditioned critic."""
    outs = []
    for p, layers in zip(MPD_PERIODS, params["mpd"]):
        x = _fold_period(audio, p)
        outs.append(_critic_apply(layers, x, stride_h=3, compute_dtype=compute_dtype))
    for (n_fft, hop), layers in zip(MRD_RESOLUTIONS, params["mrd"]):
        mag = _stft_mag(audio.astype(jnp.float32), n_fft, hop)
        x = jnp.log(mag + 1e-5)[..., None]  # [B, frames, bins, 1]
        outs.append(_critic_apply(layers, x, stride_h=2, compute_dtype=compute_dtype))
    if f0_bin is not None and "pcd" in params:
        x = pitch_phase_channels(audio, f0_bin)
        outs.append(_critic_apply(params["pcd"], x, stride_h=3,
                                  compute_dtype=compute_dtype))
    return outs
