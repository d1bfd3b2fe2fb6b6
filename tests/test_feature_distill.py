"""Per-module feature distillation: steps run and reduce their losses."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.runtime.offline import ConversionSettings, build_cond
from beatrice_vst_tpu.speakers import bank as bank_mod
from beatrice_vst_tpu.training import feature_distill as fd


def _setup():
    cfg = chain.VoiceConverterConfig.for_version(V20RC0)
    teacher = chain.init(jax.random.PRNGKey(1), cfg)
    student = chain.init(jax.random.PRNGKey(2), cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(3), V20RC0, 4)
    cond = build_cond(cfg, bank, ConversionSettings(target_speaker=1),
                      batch=2)
    audio = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((2, 4 * 160)),
        jnp.float32)
    return cfg, teacher, student, {"audio16": audio, "cond": cond}


def test_module_steps_reduce_losses():
    cfg, teacher, student, batch = _setup()
    for module in ("phone", "pitch", "wg"):
        opt = optax.adam(1e-3)
        opt_state = opt.init(student[module])
        losses = []
        for _ in range(8):
            student, opt_state, m = fd.module_step(
                student, opt_state, teacher, batch, cfg=cfg, opt=opt,
                module=module)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (module, losses)


def test_end_to_end_error_diagnostics():
    cfg, teacher, student, batch = _setup()
    m = fd.end_to_end_error(student, teacher, batch, cfg=cfg)
    assert set(m) >= {"wav_l1", "wav_max", "qp_match", "phone_rmse"}
    # identical params -> exactly zero error, full qp agreement
    z = fd.end_to_end_error(teacher, teacher, batch, cfg=cfg)
    assert float(z["wav_max"]) == 0.0
    assert float(z["qp_match"]) == 1.0
