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


def distillation_loss(params, cfg, audio16, target24, cond, state=None):
    """Forward the chain and score against the target 24 kHz waveform."""
    if state is None:
        state = chain.init_state(cfg, (audio16.shape[0],))
    pred, _ = chain.apply(params, cfg, audio16, state, cond)
    l_stft = multi_resolution_stft_loss(pred, target24)
    l_wav = jnp.mean(jnp.abs(pred - target24))
    return l_stft + l_wav, {"stft": l_stft, "l1": l_wav}


def make_optimizer(lr: float = 2e-4, weight_decay: float = 1e-2):
    return optax.adamw(lr, b1=0.9, b2=0.99, weight_decay=weight_decay)


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"))
def train_step(params, opt_state, batch, *, cfg, optimizer):
    """One distillation step.  batch: {audio16 [B, T*160], target24
    [B, T*240], cond: chain cond dict}."""
    (loss, aux), grads = jax.value_and_grad(distillation_loss, has_aux=True)(
        params, cfg, batch["audio16"], batch["target24"], batch["cond"]
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, **aux}
