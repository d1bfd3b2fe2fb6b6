"""Source-injection formulations (BEATRICE_SRC_MODE) are equivalent."""

import jax
import jax.numpy as jnp
import numpy as np

from beatrice_vst_tpu.constants import V20A2
from beatrice_vst_tpu.models import waveform_generator as wg


def _run(mode, dtype):
    cfg = wg.WaveformGeneratorConfig.for_version(V20A2)
    params = wg.init(jax.random.PRNGKey(0), cfg)
    b, t = 2, 3
    rng = np.random.default_rng(0)
    phone = jnp.asarray(rng.standard_normal((b, t, cfg.phone_channels)),
                        jnp.float32)
    qp = jnp.asarray(rng.integers(100, 300, (b, t)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((b, t, 4)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, cfg.hidden)), jnp.float32)
    state = wg.init_state(cfg, (b,))
    old = wg._SRC_MODE
    wg._SRC_MODE = mode
    try:
        audio, _ = wg.apply(params, cfg, phone, qp, feats, spk, state,
                            compute_dtype=dtype)
    finally:
        wg._SRC_MODE = old
    return np.asarray(audio)


def test_fma_matches_dot_bf16():
    a_dot = _run("dot", jnp.bfloat16)
    a_fma = _run("fma", jnp.bfloat16)
    # same math, different accumulation order: bf16-level agreement
    np.testing.assert_allclose(a_dot, a_fma, atol=2e-2)
    assert np.isfinite(a_fma).all()


def test_dot_f32_unaffected_by_mode():
    a_dot = _run("dot", None)
    a_fma = _run("fma", None)  # fma requires compute_dtype; falls through
    np.testing.assert_array_equal(a_dot, a_fma)
