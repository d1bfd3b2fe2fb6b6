"""WaveformGenerator: speaker-conditioned streaming neural vocoder.

TPU-native replacement for `Beatrice*_GenerateWaveform1`
(`/root/reference/lib/beatricelib/beatrice.h:112-120,301-307`): per 10 ms
frame it takes the phone vector, a quantized pitch bin, 4 pitch features
and speaker conditioning, and emits 240 samples at 24 kHz.  Speaker
conditioning follows the version contract:
  - 20a2/20b1: a single 256-d speaker embedding (additive, with the formant
    shift embedding already added by the caller -- processor_core_0.cc:121-139).
  - 20rc0: additive + formant-shift embeddings set via the EmbeddingSetter
    path plus a 384x128 key-value speaker embedding cross-attended in each
    of the 4 blocks (beatrice.h:308-343).

Design (original, TPU-first): a frame-rate conditioning stack (causal conv
blocks + per-block cross-attention into the speaker KV bank) followed by a
harmonic-plus-noise source-filter upsampler.  Upsampling is depth-to-time
("pixel shuffle"): each stage is a causal conv whose output channels carry
the rate multiplier, so every stage is a single [B*T, k*C] x [k*C, r*C']
matmul on the MXU -- no transposed convs, no dynamic shapes.  The harmonic
source is generated from the pitch bin with a per-stream carried phase so
frame boundaries are click-free, and injected at every rate of the
upsampler (NSF-style).

Streaming state: per-block conv history, per-stage conv history (at that
stage's rate), source phase, and a deterministic noise counter.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from ..constants import OUT_HOP_LENGTH, OUT_SAMPLE_RATE, VersionSpec, quantized_pitch_to_hz
from . import layers

import os as _os

# Source-injection formulation A/B knob (see the stage loop in apply):
#   "dot" (default)  f32-accumulating einsum, convert in the dot epilogue
#   "fma"            unrolled rank-1 FMA chain that fuses into the y add
_SRC_MODE = _os.environ.get("BEATRICE_SRC_MODE", "dot")


@dataclasses.dataclass(frozen=True)
class WaveformGeneratorConfig:
    phone_channels: int
    pitch_bins: int
    hidden: int = 256
    n_blocks: int = 4
    kernel: int = 4
    mlp_ratio: int = 2
    # 20rc0 KV speaker attention.  kv_length/kv_channels are the speaker
    # embedding contract (beatrice.h:26-27); attn_dim is our projection
    # width -- 64 halves the dominant per-tick K/V cache traffic at batch
    # (the cache is read by all 4 blocks every frame).
    use_kv_attention: bool = False
    kv_length: int = 384
    kv_channels: int = 128
    attn_dim: int = 64
    # upsampler: (rate multiplier, output channels) per stage; prod = 240
    upsample: tuple = ((4, 128), (5, 64), (4, 32), (3, 16))
    up_kernel: int = 3
    n_harmonics: int = 8
    noise_salt: int = 0x5EED
    # Pallas-fused upsampler head for the T==1 streaming step on TPU
    # (models/pallas_upsampler.py); the XLA loop remains the reference path.
    use_pallas_upsampler: bool = False

    @classmethod
    def for_version(cls, spec: VersionSpec) -> "WaveformGeneratorConfig":
        return cls(
            phone_channels=spec.phone_channels,
            pitch_bins=spec.pitch_bins,
            use_kv_attention=spec.has_kv,
            kv_length=spec.kv_length or 384,
            kv_channels=spec.kv_channels or 128,
            n_blocks=spec.n_blocks,
        )

    def __post_init__(self):
        total = math.prod(r for r, _ in self.upsample)
        if total != OUT_HOP_LENGTH:
            raise ValueError(f"upsample rates {self.upsample} must multiply to {OUT_HOP_LENGTH}")

    @property
    def stage_rates(self):
        """Cumulative samples-per-frame after each stage: (4, 20, 80, 240)."""
        out, acc = [], 1
        for r, _ in self.upsample:
            acc *= r
            out.append(acc)
        return tuple(out)


def init(key, cfg: WaveformGeneratorConfig, dtype=jnp.float32):
    n_up = len(cfg.upsample)
    keys = iter(jax.random.split(key, 8 + 3 * cfg.n_blocks + 3 * n_up))
    params = {
        "phone_in": layers.linear_init(next(keys), cfg.phone_channels, cfg.hidden, dtype),
        "pitch_emb": jax.random.normal(next(keys), (cfg.pitch_bins, cfg.hidden), dtype) * 0.02,
        "feat_in": layers.linear_init(next(keys), 4, cfg.hidden, dtype),
        "spk_in": layers.linear_init(next(keys), cfg.hidden, cfg.hidden, dtype),
        "blocks": [],
        "up": [],
        "out_ln": layers.layer_norm_init(cfg.hidden, dtype),
    }
    for _ in range(cfg.n_blocks):
        block = {"conv": layers.conv_block_init(next(keys), cfg.hidden, cfg.kernel, 1, cfg.mlp_ratio, dtype)}
        if cfg.use_kv_attention:
            block["attn"] = layers.cross_attention_init(
                next(keys), cfg.hidden, cfg.kv_channels, cfg.attn_dim, dtype
            )
        params["blocks"].append(block)
    c_in = cfg.hidden
    for r, c_out in cfg.upsample:
        params["up"].append({
            "conv": layers.causal_conv_init(next(keys), cfg.up_kernel, c_in, r * c_out, 1, dtype),
            "src": layers.linear_init(next(keys), cfg.n_harmonics + 1, c_out, dtype),
            "snake": layers.snake_init(c_out, 1.0, dtype),
        })
        c_in = c_out
    params["final"] = layers.causal_conv_init(next(keys), cfg.up_kernel, c_in, 1, 1, dtype)
    return params


def init_state(cfg: WaveformGeneratorConfig, batch_shape=(), dtype=jnp.float32,
               ring=False):
    state = {
        "blocks": [
            layers.conv_block_state(batch_shape, cfg.hidden, cfg.kernel, 1,
                                    dtype, ring=ring)
            for _ in range(cfg.n_blocks)
        ],
        "up": [],
        "phase": jnp.zeros(batch_shape, jnp.float32),
        "noise_counter": jnp.zeros(batch_shape, jnp.uint32),
    }
    c_in = cfg.hidden
    for i, (r, c_out) in enumerate(cfg.upsample):
        # only stage 0 runs at T==1 under the serving tick (the ring
        # convention's precondition); later stages see T = r1*...*ri > 1
        # inputs and always use the linear shift
        state["up"].append(
            layers.causal_conv_state(batch_shape, cfg.up_kernel, c_in, 1,
                                     dtype, ring=ring and i == 0)
        )
        c_in = c_out
    state["final"] = layers.causal_conv_state(batch_shape, cfg.up_kernel, c_in, 1, dtype)
    return state


def frame_increments(quantized_pitch):
    """Per-frame source-phase increment mod 2*pi, [*, T] f32.

    Exposed so sequence-parallel offline conversion (runtime/seqpar.py) can
    accumulate its phase prefix over BITWISE the same f32 increments the
    vocoder integrates -- a host-side float64 re-derivation differs by
    ~1 ulp/frame systematically, which the 8th harmonic amplifies past the
    1e-3 gate after a few hundred frames."""
    f0 = quantized_pitch_to_hz(quantized_pitch.astype(jnp.float32))
    step = 2.0 * jnp.pi * f0 / OUT_SAMPLE_RATE
    return jnp.mod(step * OUT_HOP_LENGTH, 2.0 * jnp.pi)


def _source_phases(quantized_pitch, phase0):
    """Per-frame source phase parameters.

    quantized_pitch: [B, T] int bins; phase0: [B] carried phase (radians).
    Returns (start [B, T], step [B, T], new_phase [B]): the phase at sample
    position p of frame t is start[t] + step[t] * p (p = 1..240); f0 is
    held constant within a frame and the carried phase makes frame joins
    continuous.  Callers evaluate phases at whatever sample grid they need
    (the upsampler evaluates each stage's rate directly).
    """
    two_pi = 2.0 * jnp.pi
    f0 = quantized_pitch_to_hz(quantized_pitch.astype(jnp.float32))  # [B, T]
    step = two_pi * f0 / OUT_SAMPLE_RATE  # [B, T] per-sample increment
    frame_inc = step * OUT_HOP_LENGTH
    # phase at the start of each frame: a *modular* prefix sum.  A plain
    # f32 cumsum reaches ~10 rad/frame in magnitude, so long chunks lose
    # phase precision linearly (at T=100 the raw sum is ~1e3 rad with only
    # ~6e-5 rad of f32 resolution left, x8 on the 8th harmonic); folding
    # mod 2*pi into the (associative) scan keeps every intermediate in
    # [0, 4*pi) and the error at rounding level regardless of chunk length.
    inc_mod = frame_increments(quantized_pitch)
    csum = jax.lax.associative_scan(
        lambda a, b: jnp.mod(a + b, two_pi), inc_mod, axis=-1
    )  # inclusive modular prefix
    start = jnp.mod(phase0[:, None] + csum - inc_mod, two_pi)
    new_phase = jnp.mod(start[:, -1] + frame_inc[:, -1], two_pi)
    return start, step, new_phase


@functools.lru_cache(maxsize=None)
def _cheb_u_matrix(n_harmonics: int) -> "np.ndarray":
    """[H, H] monomial coefficients of Chebyshev-U: sin(k*phi) =
    sin(phi) * U_{k-1}(cos(phi)), U rows k-1 = coeffs over cos^j."""
    import numpy as np

    u = np.zeros((n_harmonics, n_harmonics), np.float64)
    u[0, 0] = 1.0
    if n_harmonics > 1:
        u[1, 1] = 2.0
        for k in range(2, n_harmonics):
            u[k, 1:] = 2.0 * u[k - 1, :-1]
            u[k] -= u[k - 2]
    return u.astype(np.float32)


def _fold_src_weights(src_params, cfg):
    """Fold the Chebyshev-U basis change into the src linear weights.

    The source features are built in the monomial basis x_j =
    gate*sin(phi)*cos(phi)^j (see _monomial_source_features); since
    harm_k = sum_j U[k,j] x_j, the per-stage src projection
    [harm | noise] @ W equals [x | noise] @ W' with W'[:H] = U^T @ W[:H].
    An [H, H] x [H, C] matmul per stage per call -- trace-time noise, and
    the harmonic *bank* (the [B, T*spf, H] sine tensor whose per-harmonic
    Chebyshev recurrence steps materialized ~0.8 ms/tick of f32
    intermediates at B=14336 on v5e) is never built at all.
    """
    w, b = src_params["w"], src_params["b"]
    h = cfg.n_harmonics
    u_t = jnp.asarray(_cheb_u_matrix(h).T, w.dtype)
    w_folded = jnp.concatenate([u_t @ w[:h], w[h:]], axis=0)
    return w_folded, b


def _monomial_source_features(phases, periodicity, noise, cfg,
                              compute_dtype=None):
    """[H+1, B, T*S] source features in the monomial basis
    (gate*sin(phi)*cos(phi)^j for j=0..H-1, plus the 0.1-scaled noise
    column), consumed with _fold_src_weights via einsum('jbs,jc->bsc').
    Exactly spans the same per-sample information as the sin(k*phi) bank
    (the basis change is folded into the weights); numerically within
    ~1e-5 of the explicit recurrence for H <= 8 (|U coeffs| <= 128), far
    inside the 1e-3 golden gate.

    Layout notes (v5e, B=15360): the power chain is log-depth shallow
    elementwise work, and the feature axis is the LEADING axis -- each
    column is one contiguous [1, B, T*S] block write.  Concatenating on a
    minor width-9 axis instead lowered to 8 full-buffer rewrite fusions
    (~0.8 ms/tick); sin/cos stay f32 (phase accuracy), the chain runs in
    the compute dtype.
    """
    dt = compute_dtype or jnp.float32
    b, t = phases.shape[:2]
    flat = lambda x: jnp.broadcast_to(x, phases.shape).reshape(
        b, t * phases.shape[-1])
    gate = jax.nn.sigmoid(periodicity)[..., None]  # [B, T, 1]
    sin_p = jnp.sin(phases)
    cos_p = jnp.cos(phases)
    # materialize sin/cos ONCE: the per-column writer fusions otherwise
    # DUPLICATE the transcendental producers into every column (observed
    # in the compiled HLO: 8 `sine` + 7 `cosine` full-rate ops per stage,
    # ~19 VPU cycles/element each -- the whole point of the monomial
    # basis was avoiding exactly this)
    sin_p, cos_p = jax.lax.optimization_barrier((sin_p, cos_p))
    gs = flat(gate * sin_p).astype(dt)  # [B, T*S]
    cols = [gs]
    if cfg.n_harmonics > 1:
        c = flat(cos_p).astype(dt)
        pows = {1: c}
        for j in range(2, cfg.n_harmonics):
            half = j // 2
            pows[j] = pows[half] * pows[j - half]
        cols += [gs * pows[j] for j in range(1, cfg.n_harmonics)]
    return jnp.stack([*cols, noise.astype(dt)], axis=0)


def _harmonic_features(phases, periodicity, cfg):
    """[B, T, S, n_harmonics] sine bank gated by the periodicity feature.

    sin(k*phi) for k=1..H via the Chebyshev recurrence
    sin((k+1)phi) = 2 cos(phi) sin(k phi) - sin((k-1)phi): 2 transcendental
    evaluations + 2(H-2) FMAs instead of H `sin`s -- on v5e `sin` costs
    ~19 VPU cycles/element and the full-rate bank (240*H per stream-frame)
    was ~0.6 ms of the serving tick at 6144 streams.  Same spec as
    reference_impl (np.sin(k*phi)); f32 recurrence error is ~1e-6 over 8
    harmonics, far inside the 1e-3 golden gate.
    """
    s1 = jnp.sin(phases)
    sines = [s1]
    if cfg.n_harmonics > 1:
        c2 = 2.0 * jnp.cos(phases)
        sines.append(c2 * s1)
        for _ in range(cfg.n_harmonics - 2):
            sines.append(c2 * sines[-1] - sines[-2])
    bank = jnp.stack(sines, axis=-1)  # [B, T, S, H]
    gate = jax.nn.sigmoid(periodicity)[..., None, None]  # [B, T, 1, 1]
    return bank * gate


def project_kv(params, cfg: WaveformGeneratorConfig, kv_embedding,
               compute_dtype=None):
    """Precompute per-block K/V from a speaker KV bank [..., L, Ckv].

    Returns (k [..., n_blocks, L, A], v [..., n_blocks, L, A]) -- the
    per-stream conditioning cache refreshed on speaker/morph events by the
    runtime engine (the EmbeddingSetter analogue, beatrice.h:333-343, whose
    reference amortizes KV uploads 1 block/frame; here the whole refresh is
    one batched matmul on events only)."""
    ks, vs = [], []
    for p in params["blocks"]:
        k, v = layers.cross_attention_project_kv(p["attn"], kv_embedding, compute_dtype)
        ks.append(k)
        vs.append(v)
    return {"k": jnp.stack(ks, axis=-3), "v": jnp.stack(vs, axis=-3)}


def apply(params, cfg: WaveformGeneratorConfig, phone, quantized_pitch,
          pitch_features, speaker_embedding, state, kv_embedding=None,
          kv_cache=None, compute_dtype=None, kv_bank=None, kv_slot=None,
          t_index=None, soft_pitch: bool = False):
    """Generate audio for a chunk of frames.

    Args:
      phone: [B, T, phone_channels]
      quantized_pitch: [B, T] int32 bins (already pitch-transformed)
      pitch_features: [B, T, 4]
      speaker_embedding: [B, hidden] or [B, T, hidden] (additive + formant)
      state: streaming state pytree
      kv_embedding: [B, kv_length, kv_channels] (20rc0) or None
      kv_bank: {"k","v": [Z, n_blocks, L, A]} shared slot bank + kv_slot
        [B] int32 (the slot-mode alternative to kv_cache; see
        layers.cross_attention_slots)

    Returns (audio [B, T*240] float32 in [-1, 1], new_state).
    """
    b, t = quantized_pitch.shape
    pe = params["pitch_emb"]
    if compute_dtype is not None:
        # cast the [bins, hidden] table BEFORE the gather so the residual
        # stream assembles fully in the compute dtype (an f32 term here
        # would promote every residual add back to f32 width)
        pe = pe.astype(compute_dtype)
    if soft_pitch:
        # continuous (float) bin from chain.apply(soft_pitch=True): the
        # pitch embedding is linearly interpolated between the bracketing
        # rows, so the vocoder conditioning is differentiable in the bin
        # value (and exactly equals the gather at integral bins)
        qp = jnp.clip(quantized_pitch.astype(jnp.float32), 0.0,
                      float(cfg.pitch_bins - 1))
        i0 = jnp.floor(qp).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, cfg.pitch_bins - 1)
        frac = (qp - i0.astype(jnp.float32))[..., None].astype(pe.dtype)
        pitch_term = pe[i0] * (1.0 - frac) + pe[i1] * frac
    else:
        qp = jnp.clip(quantized_pitch, 0, cfg.pitch_bins - 1)
        pitch_term = pe[qp]
    h = (
        layers.linear(params["phone_in"], phone, compute_dtype)
        + pitch_term
        + layers.linear(params["feat_in"], pitch_features, compute_dtype)
    )
    spk = speaker_embedding
    if spk.ndim == 2:
        spk = spk[:, None, :]
    h = h + layers.linear(params["spk_in"], spk, compute_dtype)

    slot_onehot = None
    if kv_bank is not None and kv_slot is not None:
        slot_onehot = jax.nn.one_hot(
            kv_slot, kv_bank["k"].shape[0], dtype=jnp.float32
        )

    new_block_states = []
    for i, (p, s) in enumerate(zip(params["blocks"], state["blocks"])):
        h, ns = layers.conv_block(p["conv"], h, s, 1, compute_dtype,
                                  ring_pos=t_index)
        if cfg.use_kv_attention:
            if slot_onehot is not None:
                if "k_scale" in kv_bank:  # int8 slot bank + int8 MXU dots
                    h = layers.cross_attention_slots_q8(
                        p["attn"], h,
                        kv_bank["k"][:, i], kv_bank["k_scale"][:, i],
                        kv_bank["v"][:, i], kv_bank["v_scale"][:, i],
                        slot_onehot, compute_dtype,
                    )
                else:
                    h = layers.cross_attention_slots(
                        p["attn"], h, kv_bank["k"][:, i], kv_bank["v"][:, i],
                        slot_onehot, compute_dtype,
                    )
            elif kv_cache is not None:
                if "k_scale" in kv_cache:  # int8 + per-row scales
                    h = layers.cross_attention_cached_q(
                        p["attn"], h,
                        kv_cache["k"][:, i], kv_cache["k_scale"][:, i],
                        kv_cache["v"][:, i], kv_cache["v_scale"][:, i],
                        compute_dtype,
                    )
                else:
                    h = layers.cross_attention_cached(
                        p["attn"], h, kv_cache["k"][:, i], kv_cache["v"][:, i],
                        compute_dtype,
                    )
            elif kv_embedding is not None:
                h = layers.cross_attention(p["attn"], h, kv_embedding, compute_dtype)
            else:
                raise ValueError(
                    "20rc0 waveform generator requires kv_embedding or kv_cache"
                )
        new_block_states.append(ns)
    h = layers.layer_norm(params["out_ln"], h)

    # ---- harmonic + noise source ----
    start, step, new_phase = _source_phases(qp, state["phase"])
    periodicity = pitch_features[..., 0]  # feature 0 gates voicing
    # absolute frame index per stream -> noise depends only on position, so
    # chunked and per-frame streaming produce identical noise
    counters = state["noise_counter"][:, None] + jnp.arange(t, dtype=jnp.uint32)

    # ---- per-rate source phases/noise (each stage's harmonics evaluated
    # directly at that stage's rate: positions stride, 2*stride, ..., 240 --
    # numerically identical to slicing a full-rate bank, but with no
    # [B, T, 240, H] intermediate and no stride-60/12/3 lane slices, which
    # relayout on TPU and dominated the source cost at serving batch) ----
    stage_phases, stage_noise = [], []
    samples_per_frame = 1
    for i, (r, _) in enumerate(cfg.upsample):
        samples_per_frame *= r
        stride = OUT_HOP_LENGTH // samples_per_frame
        pos = jnp.arange(1, samples_per_frame + 1, dtype=jnp.float32) * float(
            stride
        )
        stage_phases.append(start[..., None] + step[..., None] * pos)  # [B,T,spf]
        stage_noise.append(layers.hash_noise(
            counters, samples_per_frame, cfg.noise_salt + i * 0x2545F491
        ).reshape(b, t, samples_per_frame))

    # ---- depth-to-time upsampler ----
    from .pallas_upsampler import TILE as _PALLAS_TILE

    if cfg.use_pallas_upsampler and t == 1 and b % _PALLAS_TILE == 0:
        from .pallas_upsampler import fused_upsample

        # the Pallas head consumes the explicit sin(k*phi) bank
        src_feats = [
            jnp.concatenate(
                [
                    _harmonic_features(ph, periodicity, cfg).reshape(
                        b, ph.shape[1] * ph.shape[2], cfg.n_harmonics
                    ),
                    0.1 * nz.reshape(b, -1, 1),
                ],
                axis=-1,
            )
            for ph, nz in zip(stage_phases, stage_noise)
        ]
        audio, new_states = fused_upsample(
            params["up"], params["final"], h,
            [*state["up"], state["final"]], src_feats,
            rates=tuple(r for r, _ in cfg.upsample),
            channels=tuple(c for _, c in cfg.upsample),
            compute_dtype=compute_dtype or jnp.float32,
        )
        new_up_states = new_states[:-1]
        final_state = new_states[-1]
    else:
        x = h  # [B, T, C]
        new_up_states = []
        for i, ((r, c_out), up) in enumerate(zip(cfg.upsample, params["up"])):
            # ring only engages for the first stage (its time axis is T);
            # later stages run at fine rates (t>1) and keep the linear shift
            y, ns = layers.causal_conv(up["conv"], x, state["up"][i], 1,
                                       compute_dtype, ring_pos=t_index)
            new_up_states.append(ns)
            cur_t = y.shape[1]
            y = y.reshape(b, cur_t * r, c_out)
            # source injection in the monomial basis with U folded into the
            # weights (see _fold_src_weights): same projection as
            # linear(src, [sin(k*phi) bank | noise]) without materializing
            # the bank; features carry the (tiny) basis axis in FRONT
            feats = _monomial_source_features(
                stage_phases[i], periodicity,
                0.1 * stage_noise[i].reshape(b, cur_t * r), cfg,
                compute_dtype,
            )  # [H+1, B, cur_t*r]
            w_f, b_f = _fold_src_weights(up["src"], cfg)
            if compute_dtype is not None:
                w_f = w_f.astype(compute_dtype)
            if _SRC_MODE == "fma" and compute_dtype is not None:
                # elementwise sum of H+1 rank-1 outer products: fuses into
                # the y add (one pass over [B,S,C]) instead of a dot that
                # materializes its own output buffer.  A/B knob.
                src = jnp.broadcast_to(b_f.astype(jnp.float32),
                                       y.shape).astype(jnp.float32)
                for j in range(feats.shape[0]):
                    src = src + (feats[j][..., None].astype(jnp.float32)
                                 * w_f[j].astype(jnp.float32))
                y = y + src.astype(y.dtype)
            else:
                # f32-accumulating dot whose convert lands in the dot
                # EPILOGUE (same finding as the residual-stream dots,
                # commit 1a04f80): the previous form added b_f in f32
                # first, which kept a full-rate f32 [B, S, C] intermediate
                # alive before the convert; b_f now adds in the compute
                # dtype and fuses into the consumer add.
                src = jnp.einsum("jbs,jc->bsc", feats, w_f,
                                 preferred_element_type=jnp.float32)
                y = y + src.astype(y.dtype) + b_f.astype(y.dtype)
            if compute_dtype is not None:
                # keep inter-stage activations in the compute dtype: the
                # f32 conv outputs (preferred accumulate) convert in the
                # conv epilogue instead of materializing f32 [B, T*r, C]
                # buffers that snake re-reads (the fine-rate stages are the
                # engine's largest elementwise traffic)
                y = y.astype(compute_dtype)
            x = layers.snake(up["snake"], y)

        y, final_state = layers.causal_conv(
            params["final"], x, state["final"], 1, compute_dtype
        )
        audio = jnp.tanh(y.astype(jnp.float32))[..., 0]  # [B, T*240]

    new_state = {
        "blocks": new_block_states,
        "up": new_up_states,
        "final": final_state,
        "phase": new_phase,
        "noise_counter": state["noise_counter"] + jnp.uint32(t),
    }
    return audio, new_state
