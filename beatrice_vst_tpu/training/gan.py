"""Adversarial training step (least-squares GAN + feature matching).

Composes the reconstruction objective (`distill.py`) with the MPD/MRD/PCD
critics (`discriminator.py`) into the standard two-player vocoder recipe
(the PCD sees the batch's ground-truth pitch bins alongside both real and
fake audio, so its adversarial gradient sharpens harmonics AT the
conditioned F0 — VERDICT r4 item 1):

    d_loss = Σ_critics  E[(1 - D(y))²] + E[D(ŷ)²]
    g_loss = λ_rec · (multi-res STFT + L1)  +  λ_fm · FM  +  λ_adv · Σ E[(1 - D(ŷ))²]

Both steps are single jitted computations, data-parallel over the batch
axis exactly like the distillation step (the same mesh/sharding rules
apply — params replicated or tensor-parallel, batch on 'streams').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..models import chain
from . import discriminator
from .distill import multi_resolution_stft_loss

LAMBDA_REC = 15.0
LAMBDA_FM = 2.0
LAMBDA_ADV = 1.0
LAMBDA_F0 = 15.0  # matches LAMBDA_REC * the distill step's f0_weight=1


def _generate(gen_params, cfg, batch, compute_dtype=None,
              with_taps: bool = False, soft_pitch: bool = False):
    state = chain.init_state(cfg, (batch["audio16"].shape[0],))
    out = chain.apply(
        gen_params, cfg, batch["audio16"], state, batch["cond"],
        compute_dtype=compute_dtype, with_taps=with_taps,
        soft_pitch=soft_pitch,
    )
    return (out[0], out[2]) if with_taps else out[0]


def disc_loss(disc_params, real, fake, f0_bin=None):
    outs_real = discriminator.apply(disc_params, real, f0_bin=f0_bin)
    outs_fake = discriminator.apply(disc_params, jax.lax.stop_gradient(fake),
                                    f0_bin=f0_bin)
    loss = 0.0
    for (lr_, _), (lf, _) in zip(outs_real, outs_fake):
        loss = loss + jnp.mean((1.0 - lr_) ** 2) + jnp.mean(lf**2)
    return loss / len(outs_real)


def gen_loss(gen_params, disc_params, cfg, batch, compute_dtype=None,
             soft_pitch: bool = False, periodicity_weight: float = 0.0):
    f0_bin = batch.get("f0_bin")
    if f0_bin is not None:
        # keep the pitch anchor during adversarial polish: without it the
        # GAN phase silently un-trains the estimator/voicing gate (the
        # critics score waveform realism, not prosody fidelity)
        pred, taps = _generate(gen_params, cfg, batch, compute_dtype,
                               with_taps=True, soft_pitch=soft_pitch)
        from .distill import pitch_supervision_losses

        l_f0, l_voice = pitch_supervision_losses(taps, f0_bin)
    else:
        pred = _generate(gen_params, cfg, batch, compute_dtype,
                         soft_pitch=soft_pitch)
        l_f0 = l_voice = 0.0
    target = batch["target24"]
    l_rec = multi_resolution_stft_loss(pred, target) + jnp.mean(
        jnp.abs(pred - target)
    )
    outs_fake = discriminator.apply(disc_params, pred, f0_bin=f0_bin)
    outs_real = discriminator.apply(
        disc_params, jax.lax.stop_gradient(target), f0_bin=f0_bin
    )
    l_adv = 0.0
    l_fm = 0.0
    n_maps = 0
    for (lf, ff), (_, fr) in zip(outs_fake, outs_real):
        l_adv = l_adv + jnp.mean((1.0 - lf) ** 2)
        for a, b in zip(ff, fr):
            l_fm = l_fm + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
            n_maps += 1
    l_adv = l_adv / len(outs_fake)
    l_fm = l_fm / max(n_maps, 1)
    total = (LAMBDA_REC * l_rec + LAMBDA_FM * l_fm + LAMBDA_ADV * l_adv
             + LAMBDA_F0 * (l_f0 + l_voice))
    aux = {"rec": l_rec, "fm": l_fm, "adv": l_adv,
           "f0": l_f0, "voice": l_voice}
    if periodicity_weight and f0_bin is not None:
        from .distill import periodicity_loss

        l_perio = periodicity_loss(pred, f0_bin)
        total = total + periodicity_weight * l_perio
        aux["perio"] = l_perio
    return total, aux


def make_gan_optimizers(lr: float = 2e-4, b1: float = 0.8, b2: float = 0.99):
    gen = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(lr, b1=b1, b2=b2))
    disc = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(lr, b1=b1, b2=b2))
    return gen, disc


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen_opt", "disc_opt", "compute_dtype",
                              "soft_pitch", "periodicity_weight")
)
def gan_train_step(gen_params, disc_params, gen_opt_state, disc_opt_state,
                   batch, *, cfg, gen_opt, disc_opt, compute_dtype=None,
                   soft_pitch: bool = False,
                   periodicity_weight: float = 0.0):
    """One D step then one G step on the same batch.

    batch: {audio16 [B, T*160], target24 [B, T*240], cond} — identical to
    the distillation batch contract."""
    fake = _generate(gen_params, cfg, batch, compute_dtype,
                     soft_pitch=soft_pitch)
    d_loss, d_grads = jax.value_and_grad(disc_loss)(
        disc_params, batch["target24"], fake, batch.get("f0_bin")
    )
    d_updates, disc_opt_state = disc_opt.update(
        d_grads, disc_opt_state, disc_params
    )
    disc_params = optax.apply_updates(disc_params, d_updates)

    (g_loss, aux), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
        gen_params, disc_params, cfg, batch, compute_dtype, soft_pitch,
        periodicity_weight
    )
    g_updates, gen_opt_state = gen_opt.update(
        g_grads, gen_opt_state, gen_params
    )
    gen_params = optax.apply_updates(gen_params, g_updates)
    metrics = {"g_loss": g_loss, "d_loss": d_loss, **aux}
    return gen_params, disc_params, gen_opt_state, disc_opt_state, metrics
