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

Both return (logits, feature-map list) per critic so the generator can use
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
_MPD_CHANNELS = (32, 128, 512, 512)
_MRD_CHANNELS = (32, 64, 128, 128)
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


def init(key, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"mpd": mpd_init(k1, dtype), "mrd": mrd_init(k2, dtype)}


def _fold_period(audio, period: int):
    """[B, n] -> [B, ceil(n/p), p, 1] (right-pad with zeros)."""
    b, n = audio.shape
    pad = (-n) % period
    x = jnp.pad(audio, ((0, 0), (0, pad)))
    return x.reshape(b, (n + pad) // period, period, 1)


def apply(params, audio, compute_dtype=None):
    """Run every critic on a [B, n] waveform.

    Returns list of (logits, feats) — one entry per MPD period then per
    MRD resolution."""
    outs = []
    for p, layers in zip(MPD_PERIODS, params["mpd"]):
        x = _fold_period(audio, p)
        outs.append(_critic_apply(layers, x, stride_h=3, compute_dtype=compute_dtype))
    for (n_fft, hop), layers in zip(MRD_RESOLUTIONS, params["mrd"]):
        mag = _stft_mag(audio.astype(jnp.float32), n_fft, hop)
        x = jnp.log(mag + 1e-5)[..., None]  # [B, frames, bins, 1]
        outs.append(_critic_apply(layers, x, stride_h=2, compute_dtype=compute_dtype))
    return outs
