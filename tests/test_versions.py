"""All three model versions run through the full engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import V20A2, V20B1, V20RC0
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
from beatrice_vst_tpu.speakers import bank as bank_mod


@pytest.mark.parametrize("spec", [V20A2, V20B1, V20RC0],
                         ids=["20a2", "20b1", "20rc0"])
def test_engine_runs_each_version(spec):
    cfg = EngineConfig.realtime(2, spec)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 3)
    eng = StreamEngine(cfg, params, bank, jit=False)
    idx = eng.admit()
    x = jnp.asarray(
        np.tile(0.3 * np.sin(2 * np.pi * 220 * np.arange(480) / 48000),
                (2, 1)).astype(np.float32)
    )
    out = None
    for _ in range(30):
        out = np.asarray(eng.tick(x))
    assert np.isfinite(out).all()
    assert np.abs(out[idx]).max() > 0
