"""VoiceConverter: the full per-frame stage chain (ExtractPhone ->
EstimatePitch -> pitch transform -> GenerateWaveform), batched.

This is the TPU equivalent of the reference's `Process1` hot loop
(`/root/reference/src/common/processor_core_0.cc:50-143`,
`processor_core_2.cc:50-256`): one call consumes T frames of 160 samples
at 16 kHz per stream and emits T*240 samples at 24 kHz, with all three
sub-model streaming states carried explicitly.  Where the reference makes
three separate calls into the closed binary per frame, here the whole
chain is one fused XLA computation over the [streams] batch axis.

Per-stream conditioning arrives as a `cond` dict built by the runtime from
the parameter system + speaker bank (the analogue of the Set* calls and
the EmbeddingSetter, beatrice.h:308-343):

  speaker_embedding [B, 256]   additive speaker (+ formant shift) embedding
  kv                [B, 384, 128]  20rc0 KV speaker embedding (optional)
  codebook          [B, 512, 128]  20rc0 VQ codebook (optional)
  vq_num_neighbors  [B] int        0 = disable (beatrice.h:239-242)
  min_q / max_q     [B] int        pitch bin clamps
  average_source_pitch, intonation_intensity, pitch_shift,
  pitch_correction  [B] float; pitch_correction_type [B] int
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constants import VersionSpec, V20RC0
from ..ops.pitch_math import transform_pitch
from . import phone_extractor, pitch_estimator, waveform_generator


@dataclasses.dataclass(frozen=True)
class VoiceConverterConfig:
    spec: VersionSpec
    phone: phone_extractor.PhoneExtractorConfig = None
    pitch: pitch_estimator.PitchEstimatorConfig = None
    wg: waveform_generator.WaveformGeneratorConfig = None

    def __post_init__(self):
        if self.phone is None:
            object.__setattr__(self, "phone", phone_extractor.PhoneExtractorConfig.for_version(self.spec))
        if self.pitch is None:
            object.__setattr__(self, "pitch", pitch_estimator.PitchEstimatorConfig.for_version(self.spec))
        if self.wg is None:
            object.__setattr__(self, "wg", waveform_generator.WaveformGeneratorConfig.for_version(self.spec))

    @classmethod
    def for_version(cls, spec: VersionSpec = V20RC0) -> "VoiceConverterConfig":
        return cls(spec=spec)


def init(key, cfg: VoiceConverterConfig, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "phone": phone_extractor.init(k1, cfg.phone, dtype),
        "pitch": pitch_estimator.init(k2, cfg.pitch, dtype),
        "wg": waveform_generator.init(k3, cfg.wg, dtype),
    }


def merged_mel_ring_enabled() -> bool:
    """One shared phone+pitch audio ring (sized for the larger window)
    instead of two per-module rings: the 160-sample chunk is written ONCE
    per tick and both mel front ends read their own windowed-DFT bases
    from it (ops/frontend.py mel_read_ring; exact -- rows older than each
    window are zero).  Halves the audio-ring DUS traffic
    (docs/ROOFLINE.md "named remaining fat" #2).  BEATRICE_MERGED_MEL_RING=0
    restores dedicated rings for A/B."""
    import os

    return os.environ.get("BEATRICE_MERGED_MEL_RING", "1") == "1"


def init_state(cfg: VoiceConverterConfig, batch_shape=(), dtype=jnp.float32,
               ring=False):
    """ring=True sizes the audio-history carries for the hop-ring frontend
    convention used with apply(..., t_index=...) (the T=1 serving path);
    the default linear convention serves chunk/offline callers.  Both start
    at zero; the conventions differ in layout, not semantics."""
    state = {
        "phone": phone_extractor.init_state(cfg.phone, batch_shape, dtype,
                                            ring=ring),
        "pitch": pitch_estimator.init_state(cfg.pitch, batch_shape, dtype,
                                            ring=ring),
        "wg": waveform_generator.init_state(cfg.wg, batch_shape, dtype,
                                            ring=ring),
    }
    if ring and merged_mel_ring_enabled():
        from ..ops.frontend import ring_slot_stride

        state["phone"].pop("audio")
        state["pitch"].pop("audio")
        slots = max(cfg.phone.frontend.ring_slots,
                    cfg.pitch.frontend.ring_slots)
        stride = ring_slot_stride(cfg.phone.frontend.hop)
        state["audio"] = jnp.zeros((*batch_shape, slots * stride), dtype)
    return state


def default_cond(cfg: VoiceConverterConfig, batch_shape=(), dtype=jnp.float32):
    """Neutral conditioning: speaker 0 semantics are the runtime's job;
    here everything is zeros / identity transforms."""
    b = batch_shape
    spec = cfg.spec
    cond = {
        "speaker_embedding": jnp.zeros((*b, cfg.wg.hidden), dtype),
        "vq_num_neighbors": jnp.zeros(b, jnp.int32),
        "min_q": jnp.ones(b, jnp.int32),
        "max_q": jnp.full(b, spec.pitch_bins - 1, jnp.int32),
        "average_source_pitch": jnp.full(b, 52.0, dtype),
        "intonation_intensity": jnp.ones(b, dtype),
        "pitch_shift": jnp.zeros(b, dtype),
        "pitch_correction": jnp.zeros(b, dtype),
        "pitch_correction_type": jnp.zeros(b, jnp.int32),
    }
    if spec.has_vq:
        cond["codebook"] = jnp.zeros((*b, spec.codebook_size, spec.phone_channels), dtype)
    if spec.has_kv:
        cond["kv"] = jnp.zeros((*b, spec.kv_length, spec.kv_channels), dtype)
    return cond


def apply(params, cfg: VoiceConverterConfig, audio16, state, cond,
          compute_dtype=None, t_index=None, vq_int8_query: bool = False,
          with_taps: bool = False, soft_pitch: bool = False):
    """audio16: [B, T*160] @16 kHz -> (audio24 [B, T*240] @24 kHz, state).

    t_index: optional scalar absolute frame index (T=1 only) -- switches
    the conv-state carries to the ring-buffer convention (one-row dynamic
    updates instead of whole-window shifts; see layers.causal_conv).  The
    serving engine threads its tick counter here; chunk/offline callers
    leave it None.  A zero state is valid under both conventions.

    with_taps=True returns (audio24, state, taps) where taps exposes the
    stage boundaries (phone features, raw + transformed quantized pitch,
    pitch aux features) -- the supervision points for per-module feature
    distillation (training/feature_distill.py).

    soft_pitch=True conditions the vocoder on the softmax *expectation*
    over the clamp-masked bin logits instead of the argmax: the pitch
    transform runs un-rounded (continuous bins) and the pitch embedding
    is linearly interpolated (waveform_generator soft_pitch).  This makes
    the whole chain differentiable through the pitch path -- the training
    configuration (training/distill.py) -- and is also a supported
    inference mode (runtime/offline.py ConversionSettings.soft_pitch),
    oracle-gated in tests/test_golden.py.  Default off: the argmax path
    is the reference-parity semantics (beatrice.h:88-93).
    """
    spec = cfg.spec

    shared_ring = None
    mel_phone = mel_pitch = None
    if "audio" in state and t_index is not None:
        # merged audio ring: one DUS write per tick, then ONE fused
        # windowed-DFT matmul produces both front ends' mels (the column
        # blocks are the per-frontend products exactly)
        from ..ops.frontend import dual_mel_read_ring, ring_slot_stride

        hop = cfg.phone.frontend.hop
        stride = ring_slot_stride(hop)
        p_total = state["audio"].shape[-1] // stride
        phase = jnp.mod(jnp.asarray(t_index, jnp.int32), p_total)
        shared_ring = jax.lax.dynamic_update_slice_in_dim(
            state["audio"], audio16.astype(state["audio"].dtype),
            phase * stride, axis=-1)
        mel_phone, mel_pitch = dual_mel_read_ring(
            cfg.phone.frontend, cfg.pitch.frontend, shared_ring, t_index)

    phone, phone_state = phone_extractor.apply(
        params["phone"], cfg.phone, audio16, state["phone"], compute_dtype,
        t_index=t_index, shared_ring=shared_ring, mel=mel_phone,
    )
    if spec.has_vq:
        if "codebook_bank" in cond:
            # shared-bank formulations: no per-stream [K, C] materialization
            if phone.shape[1] == 1 and cond["codebook_idx"].ndim == 1:
                # gather-free one-hot contraction path (the fast T==1 /
                # real-time form; see vq_knn_smooth_shared)
                phone = phone_extractor.vq_knn_smooth_shared(
                    phone, cond["codebook_bank"], cond["codebook_idx"],
                    cond["vq_num_neighbors"],
                    codebook_scale=cond.get("codebook_bank_scale"),
                    int8_query=vq_int8_query,
                )
            else:
                phone = phone_extractor.vq_knn_smooth_bank(
                    phone, cond["codebook_bank"], cond["codebook_idx"],
                    cond["vq_num_neighbors"],
                )
        else:
            phone = phone_extractor.vq_knn_smooth(
                phone, cond["codebook"], cond["vq_num_neighbors"],
                codebook_scale=cond.get("codebook_scale"),
            )

    pe_out = pitch_estimator.apply(
        params["pitch"], cfg.pitch, audio16, state["pitch"],
        cond["min_q"], cond["max_q"], compute_dtype, t_index=t_index,
        with_logits=with_taps or soft_pitch, shared_ring=shared_ring,
        mel=mel_pitch,
    )
    if with_taps or soft_pitch:
        qp_raw, pitch_feats, pitch_state, pitch_logits = pe_out
    else:
        qp_raw, pitch_feats, pitch_state = pe_out
        pitch_logits = None

    if soft_pitch:
        qp_raw = pitch_estimator.expected_bin(
            pitch_logits, cond["min_q"], cond["max_q"],
            pitch_bins=spec.pitch_bins)

    # Pitch shift / intonation / correction (processor_core_0.cc:58-120),
    # broadcast over the frame axis.
    qp = transform_pitch(
        qp_raw,
        average_source_pitch=cond["average_source_pitch"][:, None],
        intonation_intensity=cond["intonation_intensity"][:, None],
        pitch_shift=cond["pitch_shift"][:, None],
        pitch_correction=cond["pitch_correction"][:, None],
        pitch_correction_type=cond["pitch_correction_type"][:, None],
        pitch_bins=spec.pitch_bins,
        round_output=not soft_pitch,
    )

    audio24, wg_state = waveform_generator.apply(
        params["wg"], cfg.wg, phone, qp, pitch_feats,
        cond["speaker_embedding"], state["wg"],
        kv_embedding=cond.get("kv"), kv_cache=cond.get("kv_cache"),
        compute_dtype=compute_dtype,
        kv_bank=cond.get("kv_bank"), kv_slot=cond.get("kv_slot"),
        t_index=t_index, soft_pitch=soft_pitch,
    )
    new_state = {"phone": phone_state, "pitch": pitch_state, "wg": wg_state}
    if shared_ring is not None:
        new_state["audio"] = shared_ring
    if with_taps:
        taps = {"phone": phone, "qp_raw": qp_raw, "qp": qp,
                "pitch_feats": pitch_feats, "pitch_logits": pitch_logits}
        return audio24, new_state, taps
    return audio24, new_state


def scan_frames(params, cfg: VoiceConverterConfig, audio16, state, cond,
                compute_dtype=None):
    """Frame-by-frame `lax.scan` over a [B, T*160] chunk -- the streaming
    execution used to validate step==chunk equivalence and by latency
    benchmarks (one scan step == one 10 ms tick)."""
    b = audio16.shape[0]
    t = audio16.shape[1] // 160
    frames = audio16.reshape(b, t, 160).transpose(1, 0, 2)  # [T, B, 160]

    def step(carry, frame):
        out, new_carry = apply(params, cfg, frame, carry, cond, compute_dtype)
        return new_carry, out

    final_state, outs = jax.lax.scan(step, state, frames)
    audio24 = outs.transpose(1, 0, 2).reshape(b, t * 240)
    return audio24, final_state
