"""beatrice_vst_tpu: a TPU-native real-time voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
prj-beatrice/beatrice-vst reference (a CPU VST3 plugin around a closed
binary inference library): the full Beatrice-2 stage chain (framed feature
extraction, phone/content encoder, pitch estimator, speaker-conditioned
neural vocoder), streaming with explicit scan-carry state, batched over
thousands of concurrent streams on a `jax.sharding.Mesh`.

Layout:
  constants   frame/model contract (mirrors beatrice.h)
  ops         DSP primitives (resample, gain, pitch math, sph. average, mel)
  models      the three sub-models per version, step/chunk dual API
  speakers    speaker embedding banks + morphing
  params      parameter schema/state/proxy + TOML model cards
  runtime     batched streaming engine (the VST-callback replacement)
  parallel    mesh construction + sharding rules
  training    distillation / training step (optax)
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .errors import BeatriceError, ErrorCode  # noqa: F401
