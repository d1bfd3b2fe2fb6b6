"""Golden parity harness: streaming == offline at matched lookahead.

BASELINE.json's acceptance gate asks for waveform allclose(1e-3) between
the streaming (frame-by-frame) path and the offline path at matched
lookahead.  The reference binary (beatricelib) ships only Windows/macOS
static libraries (Makefile:24-29), so the executable golden reference on
this platform is the framework's own offline chunked path -- the math both
paths share is what the gate verifies: resampler state chaining, model scan
carries, gain ramps, conditioning, through the *entire* engine stack.

`run_parity` executes the same audio through
  (a) one whole-utterance engine tick (frames_per_tick = T), and
  (b) T single-frame real-time ticks through carried state,
and reports the max abs deviation.  Any state-handling bug anywhere in the
stack (resampler history, conv carries, phase, noise indexing, gain) shows
up here.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .constants import COMMON_HOP_LENGTH, V20RC0
from .models import chain
from .runtime.engine import (
    EngineConfig,
    engine_tick,
    init_engine_state,
    refresh_conditioning,
)
from .speakers import bank as bank_mod


@dataclasses.dataclass
class ParityReport:
    max_abs_diff: float
    rms_diff: float
    tolerance: float
    n_frames: int
    passed: bool

    def __str__(self):
        status = "PASS" if self.passed else "FAIL"
        return (
            f"parity {status}: max|d|={self.max_abs_diff:.2e} "
            f"rms={self.rms_diff:.2e} tol={self.tolerance} over {self.n_frames} frames"
        )


def run_parity(params=None, model_cfg=None, bank=None, audio48=None,
               spec=V20RC0, n_frames: int = 25, batch: int = 2,
               tolerance: float = 1e-3, seed: int = 0,
               controls: dict | None = None) -> ParityReport:
    """Streaming-vs-offline parity through the full engine stack."""
    key = jax.random.PRNGKey(seed)
    if model_cfg is None:
        model_cfg = chain.VoiceConverterConfig.for_version(spec)
    if params is None:
        params = chain.init(key, model_cfg)
    if bank is None:
        bank = bank_mod.random_bank(jax.random.PRNGKey(seed + 1), spec, 4)
    if audio48 is None:
        rng = np.random.default_rng(seed)
        t = np.arange(n_frames * COMMON_HOP_LENGTH) / 48000.0
        tone = 0.3 * np.sin(2 * np.pi * 220.0 * t)
        audio48 = np.tile(
            (tone + 0.05 * rng.standard_normal(len(t))).astype(np.float32),
            (batch, 1),
        )
    audio48 = jnp.asarray(audio48, jnp.float32)
    b = audio48.shape[0]
    n_frames = audio48.shape[1] // COMMON_HOP_LENGTH

    def setup(cfg):
        state = init_engine_state(cfg)
        state["controls"]["active"] = jnp.ones(b, bool)
        for field, value in (controls or {}).items():
            state["controls"][field] = jnp.broadcast_to(
                jnp.asarray(value), state["controls"][field].shape
            ).astype(state["controls"][field].dtype)
        # prime the event-driven conditioning caches (morph + KV projections)
        return refresh_conditioning(
            params, bank, state, cfg, jnp.arange(b, dtype=jnp.int32)
        )

    # (a) whole-utterance single call
    cfg_chunk = EngineConfig(capacity=b, model=model_cfg, frames_per_tick=n_frames)
    out_chunk, _ = engine_tick(params, bank, setup(cfg_chunk), audio48, cfg=cfg_chunk)

    # (b) frame-by-frame streaming through carried state
    cfg_rt = EngineConfig(capacity=b, model=model_cfg, frames_per_tick=1)
    state = setup(cfg_rt)
    tick = jax.jit(lambda p, bk, s, x: engine_tick(p, bk, s, x, cfg=cfg_rt))
    outs = []
    for f in range(n_frames):
        block = audio48[:, f * COMMON_HOP_LENGTH:(f + 1) * COMMON_HOP_LENGTH]
        o, state = tick(params, bank, state, block)
        outs.append(np.asarray(o))
    out_stream = np.concatenate(outs, axis=1)

    diff = np.abs(out_stream - np.asarray(out_chunk))
    return ParityReport(
        max_abs_diff=float(diff.max()),
        rms_diff=float(np.sqrt((diff**2).mean())),
        tolerance=tolerance,
        n_frames=n_frames,
        passed=bool(diff.max() <= tolerance),
    )
