"""Distillation training loop.

The practical path to parity with the closed reference weights is
distillation on (input, converted-output) pairs recorded from the
reference plugin offline (SURVEY.md section 7, hard parts).  This loop
trains the chain on such pairs; `make_teacher_batcher` provides the
self-contained stand-in used by tests/CI -- a frozen teacher chain
generating targets on the fly, which exercises the identical code path a
real recorded-pair dataset would.

Data parallel by construction: batches are [B, ...] and the train step is
the one exercised (dp+tp) by the multi-chip dry run.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..models import chain
from .distill import make_optimizer, train_step


def make_teacher_batcher(cfg, teacher_params, bank, *, batch: int, frames: int,
                         seed: int = 0):
    """Yield {audio16, target24, cond} batches: random voiced-ish inputs
    converted by a frozen teacher."""
    from ..runtime.offline import ConversionSettings, build_cond

    settings = ConversionSettings(target_speaker=0)
    cond = build_cond(cfg, bank, settings, batch=batch)
    teacher = jax.jit(
        lambda a: chain.apply(
            teacher_params, cfg, a, chain.init_state(cfg, (batch,)), cond
        )[0]
    )
    rng = np.random.default_rng(seed)

    def batcher():
        while True:
            n = frames * 160
            t = np.arange(n) / 16000.0
            f0 = rng.uniform(80.0, 300.0, (batch, 1))
            phase = rng.uniform(0, 2 * np.pi, (batch, 1))
            saw = 2.0 * ((f0 * t[None, :] + phase) % 1.0) - 1.0
            noise = rng.standard_normal((batch, n)) * 0.05
            audio16 = jnp.asarray(0.3 * saw + noise, jnp.float32)
            target24 = teacher(audio16)
            yield {"audio16": audio16, "target24": target24, "cond": cond}

    return batcher()


def train(params, cfg, batches, *, steps: int, lr: float = 2e-4,
          log_every: int = 10, log_fn=print, ckpt_dir: str | None = None,
          save_every: int = 500, resume: bool = False,
          f0_weight: float = 1.0, soft_pitch: bool = False,
          lr_schedule: bool = False, periodicity_weight: float = 0.0):
    """Run `steps` of distillation; returns (params, history).

    With `ckpt_dir`, the full training pytree (params + optimizer state +
    step) is checkpointed every `save_every` steps and on exit;
    `resume=True` continues from the latest checkpoint."""
    from .checkpoint import latest_step, restore_checkpoint, save_checkpoint

    optimizer = make_optimizer(lr, total_steps=steps if lr_schedule else None)
    opt_state = optimizer.init(params)
    start = 0
    if resume and ckpt_dir and latest_step(ckpt_dir) is not None:
        start, (params, opt_state) = restore_checkpoint(
            ckpt_dir, (params, opt_state)
        )
        log_fn(f"resumed from step {start}")
    history = []
    t0 = time.time()
    step = start
    for step, batch in zip(range(start, steps), batches):
        params, opt_state, metrics = train_step(
            params, opt_state, batch, cfg=cfg, optimizer=optimizer,
            f0_weight=f0_weight, soft_pitch=soft_pitch,
            periodicity_weight=periodicity_weight,
        )
        if step % 200 == 0:
            import gc

            gc.collect()  # promptly drop relay-backed device buffers
        if step % log_every == 0 or step == steps - 1:
            loss = float(metrics["loss"])
            history.append((step, loss))
            extra = "".join(
                f", {k} {float(metrics[k]):.4f}"
                for k in ("f0", "voice", "perio") if k in metrics)
            log_fn(
                f"step {step}: loss {loss:.4f} "
                f"(stft {float(metrics['stft']):.4f}, "
                f"l1 {float(metrics['l1']):.4f}{extra}) "
                f"[{time.time() - t0:.1f}s]"
            )
        if ckpt_dir and step and step % save_every == 0:
            save_checkpoint(ckpt_dir, step, (params, opt_state))
    if ckpt_dir and steps > start:
        save_checkpoint(ckpt_dir, step + 1, (params, opt_state))
    return params, history


def train_gan(params, cfg, batches, *, steps: int, lr: float = 2e-4,
              seed: int = 0, log_every: int = 10, log_fn=print,
              ckpt_dir: str | None = None, save_every: int = 500,
              resume: bool = False, compute_dtype=None,
              soft_pitch: bool = False,
              periodicity_weight: float = 0.0):
    """Adversarial training (MPD+MRD least-squares GAN + feature matching
    on top of the reconstruction objective).  Returns (params, history);
    discriminators live only in the checkpoint."""
    from . import discriminator
    from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
    from .gan import gan_train_step, make_gan_optimizers

    disc_params = discriminator.init(jax.random.PRNGKey(seed))
    gen_opt, disc_opt = make_gan_optimizers(lr)
    gen_opt_state = gen_opt.init(params)
    disc_opt_state = disc_opt.init(disc_params)
    start = 0
    tree = (params, disc_params, gen_opt_state, disc_opt_state)
    if resume and ckpt_dir and latest_step(ckpt_dir) is not None:
        start, tree = restore_checkpoint(ckpt_dir, tree)
        log_fn(f"resumed from step {start}")
    params, disc_params, gen_opt_state, disc_opt_state = tree
    history = []
    t0 = time.time()
    step = start
    for step, batch in zip(range(start, steps), batches):
        (params, disc_params, gen_opt_state, disc_opt_state,
         metrics) = gan_train_step(
            params, disc_params, gen_opt_state, disc_opt_state, batch,
            cfg=cfg, gen_opt=gen_opt, disc_opt=disc_opt,
            compute_dtype=compute_dtype, soft_pitch=soft_pitch,
            periodicity_weight=periodicity_weight,
        )
        if step % log_every == 0 or step == steps - 1:
            g = float(metrics["g_loss"])
            history.append((step, g))
            extra = "".join(
                f", {k} {float(metrics[k]):.4f}"
                for k in ("f0", "voice", "perio")
                if k in metrics and not isinstance(metrics[k], float))
            log_fn(
                f"step {step}: g {g:.4f} d {float(metrics['d_loss']):.4f} "
                f"(rec {float(metrics['rec']):.4f}, fm {float(metrics['fm']):.4f}, "
                f"adv {float(metrics['adv']):.4f}{extra}) [{time.time() - t0:.1f}s]"
            )
        if ckpt_dir and step and step % save_every == 0:
            save_checkpoint(
                ckpt_dir, step,
                (params, disc_params, gen_opt_state, disc_opt_state),
            )
    if ckpt_dir and steps > start:
        save_checkpoint(
            ckpt_dir, step + 1,
            (params, disc_params, gen_opt_state, disc_opt_state),
        )
    return params, history
