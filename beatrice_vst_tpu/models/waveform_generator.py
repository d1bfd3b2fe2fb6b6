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
import math

import jax
import jax.numpy as jnp

from ..constants import OUT_HOP_LENGTH, OUT_SAMPLE_RATE, VersionSpec, quantized_pitch_to_hz
from . import layers


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


def init_state(cfg: WaveformGeneratorConfig, batch_shape=(), dtype=jnp.float32):
    state = {
        "blocks": [
            layers.conv_block_state(batch_shape, cfg.hidden, cfg.kernel, 1, dtype)
            for _ in range(cfg.n_blocks)
        ],
        "up": [],
        "phase": jnp.zeros(batch_shape, jnp.float32),
        "noise_counter": jnp.zeros(batch_shape, jnp.uint32),
    }
    c_in = cfg.hidden
    for r, c_out in cfg.upsample:
        state["up"].append(
            layers.causal_conv_state(batch_shape, cfg.up_kernel, c_in, 1, dtype)
        )
        c_in = c_out
    state["final"] = layers.causal_conv_state(batch_shape, cfg.up_kernel, c_in, 1, dtype)
    return state


def _source_phases(quantized_pitch, phase0):
    """Per-frame source phase parameters.

    quantized_pitch: [B, T] int bins; phase0: [B] carried phase (radians).
    Returns (start [B, T], step [B, T], new_phase [B]): the phase at sample
    position p of frame t is start[t] + step[t] * p (p = 1..240); f0 is
    held constant within a frame and the carried phase makes frame joins
    continuous.  Callers evaluate phases at whatever sample grid they need
    (the upsampler evaluates each stage's rate directly).
    """
    f0 = quantized_pitch_to_hz(quantized_pitch.astype(jnp.float32))  # [B, T]
    step = 2.0 * jnp.pi * f0 / OUT_SAMPLE_RATE  # [B, T] per-sample increment
    frame_inc = step * OUT_HOP_LENGTH
    # phase at the start of each frame
    start = phase0[:, None] + jnp.cumsum(frame_inc, axis=-1) - frame_inc
    start = jnp.mod(start, 2.0 * jnp.pi)
    new_phase = jnp.mod(start[:, -1] + frame_inc[:, -1], 2.0 * jnp.pi)
    return start, step, new_phase


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
          t_index=None):
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
    qp = jnp.clip(quantized_pitch, 0, cfg.pitch_bins - 1)
    h = (
        layers.linear(params["phone_in"], phone, compute_dtype)
        + params["pitch_emb"][qp]
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

    # ---- per-rate source features (shared by both upsampler paths) ----
    # Each stage's harmonics are computed directly at that stage's rate
    # (positions stride, 2*stride, ..., 240 -- numerically identical to
    # slicing a full-rate bank, but with no [B, T, 240, H] intermediate and
    # no stride-60/12/3 lane slices, which relayout on TPU and dominated
    # the source cost at serving batch).
    src_feats = []
    samples_per_frame = 1
    for i, (r, _) in enumerate(cfg.upsample):
        samples_per_frame *= r
        stride = OUT_HOP_LENGTH // samples_per_frame
        pos = jnp.arange(1, samples_per_frame + 1, dtype=jnp.float32) * float(
            stride
        )
        phases_r = start[..., None] + step[..., None] * pos  # [B, T, spf]
        harm_r = _harmonic_features(phases_r, periodicity, cfg).reshape(
            b, t * samples_per_frame, cfg.n_harmonics
        )
        noise_r = layers.hash_noise(
            counters, samples_per_frame, cfg.noise_salt + i * 0x2545F491
        ).reshape(b, t * samples_per_frame, 1)
        src_feats.append(jnp.concatenate([harm_r, 0.1 * noise_r], axis=-1))

    # ---- depth-to-time upsampler ----
    from .pallas_upsampler import TILE as _PALLAS_TILE

    if cfg.use_pallas_upsampler and t == 1 and b % _PALLAS_TILE == 0:
        from .pallas_upsampler import fused_upsample

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
            y = y + layers.linear(up["src"], src_feats[i], compute_dtype).astype(y.dtype)
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
