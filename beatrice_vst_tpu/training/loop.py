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
          log_every: int = 10, log_fn=print):
    """Run `steps` of distillation; returns (params, history)."""
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)
    history = []
    t0 = time.time()
    for step, batch in zip(range(steps), batches):
        params, opt_state, metrics = train_step(
            params, opt_state, batch, cfg=cfg, optimizer=optimizer
        )
        if step % log_every == 0 or step == steps - 1:
            loss = float(metrics["loss"])
            history.append((step, loss))
            log_fn(
                f"step {step}: loss {loss:.4f} "
                f"(stft {float(metrics['stft']):.4f}, l1 {float(metrics['l1']):.4f}) "
                f"[{time.time() - t0:.1f}s]"
            )
    return params, history
