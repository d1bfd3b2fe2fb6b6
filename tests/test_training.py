"""Training: the distillation loop must reduce the loss (smoke test on a
tiny config) and the loss must be finite and differentiable."""

import jax
import jax.numpy as jnp
import numpy as np

from beatrice_vst_tpu.constants import V20A2
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.models.chain import VoiceConverterConfig
from beatrice_vst_tpu.speakers import bank as bank_mod
from beatrice_vst_tpu.training import (
    make_teacher_batcher,
    multi_resolution_stft_loss,
    train,
)


def test_stft_loss_zero_for_identical():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4800)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, x)) < 1e-5
    y = jnp.asarray(rng.standard_normal((2, 4800)), jnp.float32)
    assert float(multi_resolution_stft_loss(x, y)) > 0.1


def test_distillation_reduces_loss():
    spec = V20A2
    cfg = VoiceConverterConfig.for_version(spec)
    student = chain.init(jax.random.PRNGKey(0), cfg)
    teacher = chain.init(jax.random.PRNGKey(1), cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(2), spec, 2)
    batches = make_teacher_batcher(cfg, teacher, bank, batch=2, frames=8)
    _, history = train(student, cfg, batches, steps=12, lr=1e-3,
                       log_every=1, log_fn=lambda *_: None)
    losses = [loss for _, loss in history]
    assert np.isfinite(losses).all()
    # averaged late loss below early loss: learning is happening
    assert np.mean(losses[-3:]) < losses[0], losses
