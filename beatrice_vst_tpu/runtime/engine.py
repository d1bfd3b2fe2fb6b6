"""StreamEngine: the batched real-time tick loop.

This replaces the reference's per-instance audio callback
(`/root/reference/src/vst/processor.cc:103-225` +
`processor_core_2.cc:24-48`): instead of one mono stream per plugin
instance, a fixed-capacity table of streams advances together, one 10 ms
tick at a time, as a single jitted XLA computation:

    audio48 in [B, T*480] -> input gain -> 48k->16k resample ->
    VoiceConverter chain (phone/pitch/vocoder) -> 24k->48k resample ->
    output gain -> mute inactive -> audio48 out [B, T*480]

All per-stream state (model scan carries, resampler/gain state, control
tensors, morphed speaker embeddings, frame counters) lives in one device
pytree that is donated through `tick`, so steady-state runs allocation-free.
Control changes are staged host-side (runtime/controls.py) and applied as
batched scatters between ticks -- the analogue of draining
`unreflected_params_` before processing.  A muted/inactive stream outputs
zeros but keeps its slot, matching the reference's fill-zero failure model
(processor_core.h:95-104).
"""

from __future__ import annotations

import dataclasses
import functools
import heapq
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import COMMON_HOP_LENGTH, VersionSpec, V20RC0
from ..models import chain
from ..models.chain import VoiceConverterConfig
from ..ops.gain import gain_process
from ..ops.resample import input_resampler_48k_to_16k, output_resampler_24k_to_48k
from ..speakers import morpher
from .controls import ControlStage, init_controls


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    capacity: int  # stream slots (static batch)
    model: VoiceConverterConfig
    frames_per_tick: int = 1  # T; 1 = real-time 10 ms ticks
    compute_dtype: str | None = None  # e.g. "bfloat16" on TPU
    # int8 storage (per-row scales) for the VQ codebook bank: ~0.4% per-row
    # quantization error, scales folded outside the contractions.  Only
    # takes effect together with compute_dtype.
    quantize_conditioning: bool = True
    # int8 KV conditioning.  per_stream mode: int8 projection cache --
    # measured on v5e the halved HBM read wins at serving batch (tick at
    # 5120 streams: 9.22 ms int8 vs 10.06 ms bf16) and loses slightly at
    # B<=2048 (dequant convert dominates).  slots mode: int8 slot bank AND
    # int8 MXU contractions (cross_attention_slots_q8) -- the flop-bound
    # slot attention runs at the MXU's 2x int8 rate.  Default int8: the
    # production regime is the large-batch one.
    quantize_kv_cache: bool = True
    # KV conditioning layout:
    #   "slots"      shared slot bank [n_speakers + n_morph_slots, ...] read
    #                via one-hot contractions (layers.cross_attention_slots)
    #                -- O(B*Z*A) traffic instead of the per-stream cache's
    #                O(B*L*A).  Morphing streams lease one of n_morph_slots
    #                for their unique morphed KV; on slot exhaustion a
    #                morphing stream's KV falls back to its dominant morph
    #                speaker (additive morphing stays exact).
    #   "per_stream" per-stream projected K/V cache [B, nb, L, A] -- exact
    #                for unlimited concurrent morphs; higher HBM traffic.
    kv_cache_mode: str = "slots"
    n_morph_slots: int = 16
    # gather-free shared-bank VQ (vq_knn_smooth_shared): the per-stream
    # [K, C] codebook gather + its re-reads were the largest single tick
    # component measured on v5e (scripts/profile_tick.py); the one-hot
    # contraction form reads the whole bank (~1 MB int8) instead and cut
    # the 3584-stream tick 9.07 -> 7.12 ms.  FLOPs scale with n_speakers,
    # so None = auto (on while S <= vq_shared_max_speakers and T == 1);
    # True/False forces.
    vq_shared_bank: bool | None = None
    vq_shared_max_speakers: int = 128

    @classmethod
    def realtime(cls, capacity: int, spec: VersionSpec = V20RC0,
                 use_pallas_upsampler: bool = False, **kw) -> "EngineConfig":
        model = VoiceConverterConfig.for_version(spec)
        if use_pallas_upsampler:
            model = dataclasses.replace(
                model, wg=dataclasses.replace(model.wg, use_pallas_upsampler=True)
            )
        return cls(capacity=capacity, model=model, **kw)

    @property
    def spec(self) -> VersionSpec:
        return self.model.spec

    @property
    def samples_per_tick(self) -> int:
        return self.frames_per_tick * COMMON_HOP_LENGTH

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None


def _cast_activation_state(model_state, dtype):
    """Cast activation carries (conv block histories) to the compute dtype;
    raw-audio histories and phase/counters stay full precision."""

    def walk(tree, keep):
        if isinstance(tree, dict):
            return {
                k: walk(v, keep or k in ("audio", "phase", "noise_counter"))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [walk(v, keep) for v in tree]
        if keep or not jnp.issubdtype(tree.dtype, jnp.floating):
            return tree
        return tree.astype(dtype)

    return walk(model_state, False)


def init_engine_state(cfg: EngineConfig):
    b = (cfg.capacity,)
    rs_in = input_resampler_48k_to_16k(cfg.frames_per_tick)
    rs_out = output_resampler_24k_to_48k(cfg.frames_per_tick)
    spec = cfg.spec
    # frames_per_tick==1 is the T=1 serving path: ring conventions for both
    # the conv-state carries (t_index in engine_tick) and the frontend
    # audio history (hop-ring, ops/frontend.py mel_from_ring)
    model_state = chain.init_state(cfg.model, b, ring=cfg.frames_per_tick == 1)
    cond_dtype = jnp.float32
    if cfg.dtype is not None:
        model_state = _cast_activation_state(model_state, cfg.dtype)
        cond_dtype = cfg.dtype
    state = {
        "model": model_state,
        "rs_in": rs_in.init_state(b),
        "rs_out": rs_out.init_state(b),
        "gain_in_db": jnp.zeros(b, jnp.float32),
        "gain_out_db": jnp.zeros(b, jnp.float32),
        "controls": init_controls(spec, cfg.capacity),
        "frame_counter": jnp.zeros(b, jnp.uint32),
        # global tick index driving the ring-buffer conv-state convention
        # (layers.causal_conv); shared by all streams -- a reset stream's
        # zeroed rows read as zeros at any ring origin, so per-stream
        # origins are unnecessary.  int32 ring arithmetic wraps after 2^31
        # frames (~248 days of continuous 10 ms ticks).
        "tick_idx": jnp.zeros((), jnp.uint32),
        "morphed": {
            "additive": jnp.zeros((cfg.capacity, cfg.model.wg.hidden), jnp.float32),
            # pruned morph weights at the top-8 indices, cached here so the
            # per-tick lottery never re-reads the [B, 256] weight rows
            "w8": jnp.zeros((cfg.capacity, 8), jnp.float32),
        },
    }
    if spec.has_kv:
        # the KV bank is read 8x per tick by the attention blocks: storing
        # the per-stream morphed copy in compute dtype halves that traffic
        state["morphed"]["kv"] = jnp.zeros(
            (cfg.capacity, spec.kv_length, spec.kv_channels), cond_dtype
        )
        # precomputed K/V per block: refreshed on speaker/morph events,
        # read every tick -- removes the projection matmuls (~5/6 of the
        # vocoder's per-frame FLOPs) from the hot path
        a = cfg.model.wg.attn_dim
        nb = cfg.model.wg.n_blocks
        if cfg.kv_cache_mode == "slots":
            # morph slots only; the base-speaker slots are projected from
            # the bank inside the tick (tiny: S*L*C*A matmuls)
            shape = (cfg.n_morph_slots, nb, spec.kv_length, a)
            if cfg.quantize_kv_cache and cfg.dtype is not None:
                # int8 slot bank: the big slot-attention contractions run
                # as int8 MXU dots (layers.cross_attention_slots_q8)
                state["kv_slots"] = {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.ones((*shape[:-1], 1), jnp.float32),
                    "v_scale": jnp.ones((*shape[:-1], 1), jnp.float32),
                }
            else:
                state["kv_slots"] = {
                    "k": jnp.zeros(shape, cond_dtype),
                    "v": jnp.zeros(shape, cond_dtype),
                }
        else:
            shape = (cfg.capacity, nb, spec.kv_length, a)
            if cfg.quantize_kv_cache and cfg.dtype is not None:
                state["kv_cache"] = {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.ones((*shape[:-1], 1), jnp.float32),
                    "v_scale": jnp.ones((*shape[:-1], 1), jnp.float32),
                }
            else:
                state["kv_cache"] = {
                    "k": jnp.zeros(shape, cond_dtype),
                    "v": jnp.zeros(shape, cond_dtype),
                }
    return state


def cast_bank(bank, dtype, quantize_codebook: bool = False):
    """Speaker bank in compute dtype (the codebook/kv gathers dominate the
    per-tick conditioning traffic; morph spherical averages upcast to f32
    internally so accuracy is unaffected).  With quantize_codebook, the VQ
    codebooks store as int8 + per-entry scales (half the bf16 bytes)."""
    if dtype is None:
        return bank
    out = {
        k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
        for k, v in bank.items()
    }
    if quantize_codebook and "codebook" in bank:
        from ..models.layers import quantize_rows

        q, scale = quantize_rows(bank["codebook"])
        out["codebook"] = q
        out["codebook_scale"] = scale
    return out


def _build_cond(cfg: EngineConfig, bank, state, params=None):
    """Resolve per-stream conditioning from controls + bank, one tick.

    The KV path comes either from the slot bank (base speakers projected
    in-tick -- tiny -- plus the morph slots refreshed on control events)
    or from the precomputed per-stream cache; per-tick work beyond that is
    just the additive/formant select and the morph lottery."""
    c = state["controls"]
    additive, kv, cb_idx = morpher.select_conditioning(
        bank,
        c["target_speaker"],
        state["morphed"],
        c["formant_index"],
        frame_counter=state["frame_counter"] if "codebook" in bank else None,
        pruned_weights=c["morph_weights"],
        top_idx=c["morph_top_idx"],
        include_kv=False,
        w8=state["morphed"].get("w8"),
    )
    cond = {
        "speaker_embedding": additive,
        "vq_num_neighbors": c["vq_num_neighbors"],
        "min_q": c["min_q"],
        "max_q": c["max_q"],
        "average_source_pitch": c["average_source_pitch"],
        "intonation_intensity": c["intonation_intensity"],
        "pitch_shift": c["pitch_shift"],
        "pitch_correction": c["pitch_correction"],
        "pitch_correction_type": c["pitch_correction_type"],
    }
    if cfg.spec.has_kv:
        if "kv_slots" in state:
            if "kv_proj_k" in bank:
                # precomputed once by StreamEngine (base speakers only
                # change with the bank): skips the per-tick projection +
                # [S, nb, L, A] stack relayouts
                base = {"k": bank["kv_proj_k"], "v": bank["kv_proj_v"]}
                for name in ("k", "v"):
                    if f"kv_proj_{name}_scale" in bank:
                        base[f"{name}_scale"] = bank[f"kv_proj_{name}_scale"]
            else:
                from ..models import waveform_generator as wg_mod

                base = wg_mod.project_kv(
                    params["wg"], cfg.model.wg, bank["kv"], cfg.dtype
                )  # {"k"/"v": [S, nb, L, A]} -- S*L*C*A matmuls
                if "k_scale" in state["kv_slots"]:
                    from ..models.layers import quantize_rows

                    for name in ("k", "v"):
                        q, s = quantize_rows(base[name])
                        base[name] = q
                        base[f"{name}_scale"] = s
            slots = state["kv_slots"]
            dt = slots["k"].dtype
            cond["kv_bank"] = {
                name: jnp.concatenate(
                    [base[name].astype(dt), slots[name]], axis=0
                )
                for name in ("k", "v")
            }
            if "k_scale" in slots:  # int8 slot bank: concat the scales too
                for name in ("k", "v"):
                    cond["kv_bank"][f"{name}_scale"] = jnp.concatenate(
                        [base[f"{name}_scale"], slots[f"{name}_scale"]],
                        axis=0,
                    )
            # non-morph streams derive their slot from target_speaker (the
            # kv_slot control only matters in morph mode), so direct users
            # of engine_tick never need host-side slot bookkeeping
            n = bank["additive"].shape[0]
            direct = jnp.clip(c["target_speaker"], 0, n - 1)
            cond["kv_slot"] = jnp.where(
                c["target_speaker"] >= n, c["kv_slot"], direct
            )
        else:
            cond["kv_cache"] = state["kv_cache"]
    if cfg.spec.has_vq:
        # one codebook per stream per tick (per-frame lottery when T == 1,
        # which is the real-time configuration; see morpher.codebook_lottery).
        n_spk = bank["codebook"].shape[0]
        use_shared = (
            cfg.vq_shared_bank
            if cfg.vq_shared_bank is not None
            else (cfg.frames_per_tick == 1
                  and n_spk <= cfg.vq_shared_max_speakers)
        )
        if use_shared and cb_idx is not None and cb_idx.ndim == 1:
            # gather-free one-hot contraction path (vq_knn_smooth_shared):
            # reads the ~1 MB shared bank instead of writing+re-reading a
            # [B, K, C] per-stream copy.  Measured on v5e: tick 5.78->4.78 ms
            # at B=2048, 9.07->7.12 ms at B=3584 (S=16).  An older
            # take_along_axis variant (vq_knn_smooth_bank) measured 4-6x
            # slower than the gather -- the flat-index gathers were the
            # problem, not the sharing.
            cond["codebook_bank"] = bank["codebook"]
            cond["codebook_idx"] = cb_idx
            if "codebook_scale" in bank:
                cond["codebook_bank_scale"] = bank["codebook_scale"]
        else:
            cond["codebook"] = bank["codebook"][cb_idx]
            if "codebook_scale" in bank:
                cond["codebook_scale"] = bank["codebook_scale"][cb_idx]
    return cond


def engine_tick(params, bank, state, audio48, *, cfg: EngineConfig):
    """One tick: [B, T*480] @48k in -> ([B, T*480] @48k out, new state)."""
    rs_in = input_resampler_48k_to_16k(cfg.frames_per_tick)
    rs_out = output_resampler_24k_to_48k(cfg.frames_per_tick)
    c = state["controls"]

    # ingest sanitization: a client feeding NaN/inf or absurd amplitudes
    # must only ever hurt its own stream -- and not even that beyond the
    # current block (state would otherwise hold NaN forever).  Mirrors the
    # reference's defensive fill-zero stance (processor_core.h:95-104).
    audio48 = jnp.clip(jnp.nan_to_num(audio48, nan=0.0, posinf=0.0, neginf=0.0),
                       -4.0, 4.0)
    x, gain_in_db = gain_process(
        audio48, state["gain_in_db"], c["input_gain_db"], 48000.0
    )
    x16, rs_in_state = rs_in.apply_block(x, state["rs_in"])
    cond = _build_cond(cfg, bank, state, params)
    y24, model_state = chain.apply(
        params, cfg.model, x16, state["model"], cond, compute_dtype=cfg.dtype,
        t_index=state["tick_idx"] if cfg.frames_per_tick == 1 else None,
        # int8 MXU distance dots are available (vq_int8_query) but measured
        # SLOWER than the bf16 cast on v5e (0.32 vs 0.20 ms at B=14336 --
        # poor int8 utilization at the [B,2048]x[2048,512] shape, unlike the
        # slot-attention dots which got the full 2x), so the engine keeps
        # the bf16 distance path.
        vq_int8_query=False,
    )
    y48, rs_out_state = rs_out.apply_block(y24, state["rs_out"])
    y48, gain_out_db = gain_process(
        y48, state["gain_out_db"], c["output_gain_db"], 48000.0
    )
    y48 = jnp.where(c["active"][:, None], y48, 0.0)

    new_state = {
        **state,
        "model": model_state,
        "rs_in": rs_in_state,
        "rs_out": rs_out_state,
        "gain_in_db": gain_in_db,
        "gain_out_db": gain_out_db,
        "frame_counter": state["frame_counter"] + jnp.uint32(cfg.frames_per_tick),
        "tick_idx": state["tick_idx"] + jnp.uint32(cfg.frames_per_tick),
    }
    return y48, new_state


def apply_control_updates(state, updates):
    """Scatter staged control edits into the control tensors.

    updates: {field: (idx [K], values [K, ...])} from ControlStage.drain().
    Morph weight edits also refresh the per-stream morphed embeddings
    (the event-driven replacement for the reference's time-sliced morph,
    processor_core_2.cc:124-176) -- done by the engine wrapper because it
    needs the bank.
    """
    controls = dict(state["controls"])
    for field, (idx, values) in updates.items():
        controls[field] = controls[field].at[idx].set(
            jnp.asarray(values).astype(controls[field].dtype)
        )
    return {**state, "controls": controls}


def refresh_morphed(state, bank, idx):
    """Recompute morphed embeddings for the given stream indices (batched
    spherical averages over the top-8 morph speakers)."""
    c = state["controls"]
    pruned = c["morph_weights"][idx]
    top = c["morph_top_idx"][idx]
    m = morpher.update_morphed_embeddings(bank, pruned, top)
    # event-time take_along on a few rows; read per tick by the lottery
    m["w8"] = jnp.take_along_axis(pruned, top, axis=-1)
    morphed = dict(state["morphed"])
    for k in morphed:
        morphed[k] = morphed[k].at[idx].set(m[k].astype(morphed[k].dtype))
    return {**state, "morphed": morphed}


def refresh_kv_slots(params, state, cfg: EngineConfig, stream_idx, slot_idx):
    """Project the morphed KV of the given streams into their leased slots
    (slots mode; morph control events only -- direct-speaker streams just
    point at a base slot, no device work)."""
    if not cfg.spec.has_kv or "kv_slots" not in state:
        return state
    from ..models import waveform_generator

    kv = state["morphed"]["kv"][stream_idx]  # [n, L, C]
    proj = waveform_generator.project_kv(params["wg"], cfg.model.wg, kv, cfg.dtype)
    slots = dict(state["kv_slots"])
    if "k_scale" in slots:
        from ..models.layers import quantize_rows

        for name in ("k", "v"):
            q, s = quantize_rows(proj[name])
            slots[name] = slots[name].at[slot_idx].set(q)
            slots[f"{name}_scale"] = slots[f"{name}_scale"].at[slot_idx].set(s)
    else:
        for name in ("k", "v"):
            slots[name] = slots[name].at[slot_idx].set(
                proj[name].astype(slots[name].dtype)
            )
    return {**state, "kv_slots": slots}


def refresh_kv_cache(params, bank, state, cfg: EngineConfig, idx):
    """Re-project the speaker KV bank into per-block K/V for the given
    streams (speaker/morph control events; the EmbeddingSetter analogue)."""
    if not cfg.spec.has_kv or "kv_cache" not in state:
        return state
    from ..models import waveform_generator

    c = state["controls"]
    n = bank["additive"].shape[0]
    target = c["target_speaker"][idx]
    is_morph = target >= n
    direct = jnp.clip(target, 0, n - 1)
    kv = jnp.where(
        is_morph[:, None, None], state["morphed"]["kv"][idx], bank["kv"][direct]
    )
    proj = waveform_generator.project_kv(params["wg"], cfg.model.wg, kv, cfg.dtype)
    cache = dict(state["kv_cache"])
    if "k_scale" in cache:
        from ..models.layers import quantize_rows

        for name in ("k", "v"):
            q, scale = quantize_rows(proj[name])
            cache[name] = cache[name].at[idx].set(q)
            cache[f"{name}_scale"] = cache[f"{name}_scale"].at[idx].set(scale)
    else:
        for name in ("k", "v"):
            cache[name] = cache[name].at[idx].set(
                proj[name].astype(cache[name].dtype)
            )
    return {**state, "kv_cache": cache}


def refresh_conditioning(params, bank, state, cfg: EngineConfig, idx):
    """Full event refresh for the given streams: morph embeddings then the
    KV conditioning (order matters: KV uses the morph result).

    In slots mode this assigns morph slots round-robin (idx position %
    n_morph_slots) -- the test/offline-harness shortcut; StreamEngine does
    real leasing with exhaustion fallback."""
    state = refresh_morphed(state, bank, idx)
    if cfg.spec.has_kv and "kv_slots" in state:
        idx = jnp.asarray(idx, jnp.int32)
        n = bank["additive"].shape[0]
        rows = jnp.arange(idx.shape[0], dtype=jnp.int32) % cfg.n_morph_slots
        state = refresh_kv_slots(params, state, cfg, idx, rows)
        target = state["controls"]["target_speaker"][idx]
        old = state["controls"]["kv_slot"][idx]
        controls = dict(state["controls"])
        controls["kv_slot"] = controls["kv_slot"].at[idx].set(
            jnp.where(target >= n, n + rows, old)
        )
        return {**state, "controls": controls}
    return refresh_kv_cache(params, bank, state, cfg, idx)


@functools.lru_cache(maxsize=16)
def _stream_axes(cfg: EngineConfig, _merged=None):
    """Per-leaf stream-axis index for the resettable state subtrees,
    derived structurally: the axis whose size changes between
    eval_shape at capacity and capacity+1 IS the stream axis.  (Shape
    heuristics are ambiguous: ring-major conv states are [R, B, C] while
    e.g. the linear final-conv state is [B, R, C], and tiny test
    capacities collide with ring sizes.)"""
    a = jax.eval_shape(lambda: init_engine_state(cfg))
    b = jax.eval_shape(
        lambda: init_engine_state(dataclasses.replace(cfg, capacity=cfg.capacity + 1))
    )

    def axis_of(x, y):
        return next(
            i for i, (p, q) in enumerate(zip(x.shape, y.shape)) if p != q
        )

    return {
        key: jax.tree_util.tree_map(axis_of, a[key], b[key])
        for key in ("model", "rs_in", "rs_out")
    }


def _ring_layout_formats(cfg: EngineConfig):
    """Pytree of layout Formats over the engine state pinning every
    ring-major [R, B, C] conv carry to B-minormost (B on lanes).

    Why: at serving batch the tick's activations live B-on-lanes, so the
    ring tap reads want rows in that layout -- but donation pins the state
    parameter layout equal to the output layout, and XLA resolves the
    conflict by relayouting the ENTIRE ring before slicing 3 rows
    (profiled at 17408: 0.64 ms for the R=24 phone ring alone, ~1.2 ms
    across all rings, pure HBM rewrites).  Pinning the stored layout to
    what the reads want removes every one of those copies: measured
    9.32 -> 8.10 ms/tick at 17408 on v5e.  The one-row DUS write is
    layout-matched too (the written row comes from the same B-on-lanes
    activations).

    Returns None (== let XLA choose) off-TPU or when disabled via
    BEATRICE_RING_PIN_LAYOUT=0.
    """
    if os.environ.get("BEATRICE_RING_PIN_LAYOUT", "1") != "1":
        return None
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
    except ImportError:  # older jax: fall back to XLA's choice
        return None
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return None  # CPU/GPU layout support differs; only TPU is profiled
    shard = SingleDeviceSharding(dev)
    shapes = jax.eval_shape(lambda: init_engine_state(cfg))
    # the merged-mel-ring knob changes the state tree for the same cfg;
    # it must join the lru key or a mid-process knob flip (bench A/B)
    # serves a stale-structure axes tree against the fresh eval_shape
    axes = _stream_axes(cfg, chain.merged_mel_ring_enabled())

    # b-major [B, R, C] carries (the fine-rate upsampler tap windows and
    # the final-conv state) want the same B-on-lanes layout: profiled at
    # 17408, XLA gave up[2]/up[3] B-minor entry layouts on its own but
    # left up[1] at {2,1,0}, paying a 0.094 ms relayout copy each tick.
    # BEATRICE_BMAJOR_PIN=0 reverts to XLA's choice for A/B.
    pin_bmajor = os.environ.get("BEATRICE_BMAJOR_PIN", "1") == "1"

    def fmt(leaf, axis):
        if leaf.ndim == 3 and axis == 1:  # ring-major [R, B, C]
            return Format(Layout(major_to_minor=(0, 2, 1)), shard)
        if pin_bmajor and leaf.ndim == 3 and axis == 0:  # b-major [B, R, C]
            return Format(Layout(major_to_minor=(1, 2, 0)), shard)
        return Format()

    out = jax.tree_util.tree_map(lambda _: Format(), shapes)
    out["model"] = jax.tree_util.tree_map(fmt, shapes["model"], axes["model"])
    return out


@functools.lru_cache(maxsize=16)
def _jitted_reset(cfg: EngineConfig, _merged=None):
    """Zero the carries of masked stream slots (admission / ResetContext,
    processor.cc:88-98): fresh model/resampler/gain state, controls kept.
    One fused computation regardless of how many streams reset."""
    axes = _stream_axes(cfg, _merged)

    @jax.jit
    def reset(state, mask):
        def zero_slot(leaf, axis):
            m = mask.reshape(
                (1,) * axis + mask.shape + (1,) * (leaf.ndim - 1 - axis)
            )
            return jnp.where(m, jnp.zeros((), leaf.dtype), leaf)

        out = dict(state)
        for key in ("model", "rs_in", "rs_out"):
            out[key] = jax.tree_util.tree_map(zero_slot, state[key], axes[key])
        out["gain_in_db"] = jnp.where(
            mask, state["controls"]["input_gain_db"], state["gain_in_db"]
        )
        out["gain_out_db"] = jnp.where(
            mask, state["controls"]["output_gain_db"], state["gain_out_db"]
        )
        out["frame_counter"] = jnp.where(mask, 0, state["frame_counter"])
        return out

    return reset


def reset_streams(state, cfg: EngineConfig, idx):
    """Reset the given stream slots (array of indices)."""
    mask = jnp.zeros((cfg.capacity,), bool).at[jnp.asarray(idx)].set(True)
    # the BEATRICE_MERGED_MEL_RING knob changes the state tree for the
    # same cfg -- it must be part of the cache key or a mid-process knob
    # flip serves a stale-structure reset/axes tree
    return _jitted_reset(cfg, chain.merged_mel_ring_enabled())(state, mask)


class StreamEngine:
    """Host-side wrapper: owns params/bank/state + jitted tick, stream
    table (admit/evict), and the control stage.

    Typical loop (the scheduler tick, one per 10 ms):
        engine.flush_controls()            # staged edits -> device
        out48 = engine.tick(in48)          # [capacity, 480] -> [capacity, 480]
    """

    def __init__(self, cfg: EngineConfig, params, bank, jit: bool = True):
        self.cfg = cfg
        self.params = params
        self.bank = cast_bank(
            bank, cfg.dtype,
            quantize_codebook=cfg.quantize_conditioning and cfg.dtype is not None,
        )
        if cfg.kv_cache_mode == "slots" and cfg.spec.has_kv and "kv" in bank:
            from ..models import waveform_generator as wg_mod

            proj = wg_mod.project_kv(
                params["wg"], cfg.model.wg, self.bank["kv"], cfg.dtype
            )
            if cfg.quantize_kv_cache and cfg.dtype is not None:
                from ..models.layers import quantize_rows

                for name in ("k", "v"):
                    q, s = quantize_rows(proj[name])
                    self.bank[f"kv_proj_{name}"] = q
                    self.bank[f"kv_proj_{name}_scale"] = s
            else:
                dt = cfg.dtype or jnp.float32
                self.bank["kv_proj_k"] = proj["k"].astype(dt)
                self.bank["kv_proj_v"] = proj["v"].astype(dt)
        self.state = init_engine_state(cfg)
        self.stage = ControlStage()
        # min-heap: admit() always takes the SMALLEST free index so the
        # server's low-row D2H slice stays small under session churn (a
        # plain LIFO list drifts toward high indices after evictions)
        self._free = list(range(cfg.capacity))
        self._morph_dirty: set[int] = set()
        tick = functools.partial(engine_tick, cfg=cfg)
        self._fmts = None
        if jit:
            fmts = _ring_layout_formats(cfg)
            if fmts is not None:
                from jax.experimental.layout import Format

                self._fmts = fmts
                self._tick = jax.jit(
                    tick, donate_argnums=(2,),
                    in_shardings=(Format(), Format(), fmts, Format()),
                    out_shardings=(Format(), fmts),
                )
            else:
                self._tick = jax.jit(tick, donate_argnums=(2,))
        else:
            self._tick = tick
        if self._fmts is not None:
            self.state = jax.device_put(self.state, self._fmts)
        from .metrics import EngineMetrics

        self.metrics = EngineMetrics()
        self.counters = {"admitted": 0, "evicted": 0}
        self._pending_reset: set[int] = set()
        self._slot_used = [False] * cfg.capacity
        self._kv_dirty: set[int] = set()
        # slots-mode morph bookkeeping (host side): stream -> leased slot,
        # last staged dominant morph speaker, streams currently in morph
        # mode, and streams whose leased slot needs re-projection
        self._n_speakers = bank["additive"].shape[0]
        self._slots_mode = cfg.kv_cache_mode == "slots" and cfg.spec.has_kv
        self._free_morph_slots = list(range(cfg.n_morph_slots - 1, -1, -1))
        self._morph_slot: dict[int, int] = {}
        self._morph_mode: set[int] = set()
        self._last_top: dict[int, int] = {}
        self._slot_dirty: set[int] = set()
        # host-side shadow of every control set via set_control(), keyed
        # stream -> field -> last value; recover() replays it so a raw
        # engine user (no ModelHost) keeps their controls across recovery
        self._applied: dict[int, dict[str, np.ndarray]] = {}

    # ---- stream table ----

    def admit(self) -> int:
        """Allocate a stream slot; returns its index (raises if full)."""
        if not self._free:
            raise RuntimeError("stream capacity exhausted")
        idx = heapq.heappop(self._free)
        # always reset on admission (lazily, in one batched masked update at
        # the next flush): inactive rows still run the model on whatever the
        # host left in their input rows (only the OUTPUT is masked), so even
        # a never-used slot may hold garbage-driven carries -- and a
        # recycled slot must not leak the previous tenant's audio context
        # into the new stream (processor.cc:88-98 ResetContext semantics)
        self._pending_reset.add(idx)
        self._slot_used[idx] = True
        self._applied.pop(idx, None)  # fresh tenant starts from defaults
        self.stage.stage(idx, "active", True)
        self._kv_dirty.add(idx)
        if self._slots_mode:
            self._release_morph_slot(idx)
            self._morph_mode.discard(idx)
            self.stage.stage(idx, "kv_slot", 0)
        self.counters["admitted"] += 1
        return idx

    def evict(self, idx: int) -> None:
        self.stage.stage(idx, "active", False)
        heapq.heappush(self._free, idx)
        self._applied.pop(idx, None)
        if self._slots_mode:
            self._release_morph_slot(idx)
            self._morph_mode.discard(idx)
        self.counters["evicted"] += 1

    # ---- controls ----

    def _lease_morph_slot(self, idx: int):
        if idx in self._morph_slot:
            return self._morph_slot[idx]
        if self._free_morph_slots:
            s = self._free_morph_slots.pop()
            self._morph_slot[idx] = s
            return s
        return None

    def _release_morph_slot(self, idx: int) -> None:
        s = self._morph_slot.pop(idx, None)
        if s is not None:
            self._free_morph_slots.append(s)

    def _stage_kv_slot(self, idx: int) -> None:
        """Point the stream at the right row of the KV slot bank."""
        if idx in self._morph_mode:
            slot = self._lease_morph_slot(idx)
            if slot is not None:
                self.stage.stage(idx, "kv_slot", self._n_speakers + slot)
                self._slot_dirty.add(idx)
            else:
                # slot pool exhausted: KV falls back to the dominant morph
                # speaker's base slot (additive morphing stays exact)
                self.stage.stage(idx, "kv_slot", self._last_top.get(idx, 0))

    def set_control(self, idx: int, field: str, value) -> None:
        self.stage.stage(idx, field, value)
        self._applied.setdefault(int(idx), {})[field] = np.asarray(value)
        if field in ("morph_weights", "morph_top_idx"):
            self._morph_dirty.add(int(idx))
            self._kv_dirty.add(int(idx))
            if self._slots_mode:
                if field == "morph_top_idx":
                    self._last_top[int(idx)] = int(np.asarray(value).ravel()[0])
                self._stage_kv_slot(int(idx))
        elif field == "target_speaker":
            self._kv_dirty.add(int(idx))
            if self._slots_mode:
                i, v = int(idx), int(value)
                if v >= self._n_speakers:  # morph mode
                    self._morph_mode.add(i)
                    self._stage_kv_slot(i)
                else:
                    # direct speakers derive their slot from target_speaker
                    # inside the tick; just return any leased slot
                    self._morph_mode.discard(i)
                    self._release_morph_slot(i)

    def flush_controls(self) -> None:
        state_before = self.state
        if self.stage.pending():
            self.state = apply_control_updates(self.state, self.stage.drain())
        if self._pending_reset:
            idx = jnp.asarray(sorted(self._pending_reset), jnp.int32)
            self.state = reset_streams(self.state, self.cfg, idx)
            self._pending_reset.clear()
        if self._morph_dirty:
            idx = jnp.asarray(sorted(self._morph_dirty), jnp.int32)
            self.state = refresh_morphed(self.state, self.bank, idx)
            self._morph_dirty.clear()
        if self._kv_dirty and self.cfg.spec.has_kv and not self._slots_mode:
            idx = jnp.asarray(sorted(self._kv_dirty), jnp.int32)
            self.state = refresh_kv_cache(
                self.params, self.bank, self.state, self.cfg, idx
            )
        self._kv_dirty.clear()
        if self._slot_dirty:
            streams = sorted(
                s for s in self._slot_dirty if s in self._morph_slot
            )
            if streams:
                rows = [self._morph_slot[s] for s in streams]
                self.state = refresh_kv_slots(
                    self.params, self.state, self.cfg,
                    jnp.asarray(streams, jnp.int32),
                    jnp.asarray(rows, jnp.int32),
                )
            self._slot_dirty.clear()
        if self._fmts is not None and self.state is not state_before:
            # State produced OUTSIDE the pinned tick (initial zeros, the
            # event-driven refresh/reset/update jits above) carries
            # whatever layouts XLA chose for those programs; the tick's
            # in_shardings layout pin REJECTS mismatched committed
            # arrays rather than relayouting (seen: b-major [256,3,256]
            # at frames_per_tick=25).  One device_put re-places only the
            # leaves whose layout differs -- event-cost, not tick-cost.
            self.state = jax.device_put(self.state, self._fmts)

    # ---- the tick ----

    def tick(self, audio48_in) -> jax.Array:
        """audio48_in: [capacity, T*480] -> [capacity, T*480]."""
        from .metrics import Timer

        self.flush_controls()
        with Timer() as t:
            out, self.state = self._tick(self.params, self.bank, self.state, audio48_in)
        self.metrics.record_tick(t.duration, self.n_active, self.cfg.frames_per_tick)
        return out

    def recover(self) -> list[int]:
        """Elastic recovery after a device failure (SURVEY.md section 5.3):
        rebuild the device state from scratch while keeping the host-side
        stream table AND the last-applied per-stream controls.  Occupied
        slots are re-activated, every control ever set through
        set_control() is replayed from the host-side shadow (so a raw
        engine user needs no external control plane; ModelHost's
        ParameterState replay on top of this is idempotent), and KV/morph
        conditioning is marked dirty so the next flush re-primes it.
        Streaming contexts reset to zero -- the reference itself never
        persists contexts (processor.cc:88-98), so this is a ResetContext
        across the batch, not data loss.

        Returns the indices of the re-activated slots.
        """
        self.state = init_engine_state(self.cfg)
        if self._fmts is not None:
            # Re-place the fresh state with the pinned ring layouts
            # (mirrors __init__): without this, a recovery with no pending
            # control changes leaves default-layout arrays that the tick's
            # pinned in_shardings reject -- an unrecoverable recovery storm.
            self.state = jax.device_put(self.state, self._fmts)
        self.stage = ControlStage()
        self._pending_reset.clear()
        self._morph_dirty.clear()
        self._kv_dirty.clear()
        self._slot_dirty.clear()
        active = [i for i in range(self.cfg.capacity)
                  if self._slot_used[i] and i not in self._free]
        for idx in active:
            self.stage.stage(idx, "active", True)
            self._kv_dirty.add(idx)
            # replay the control shadow in original set order (dict
            # insertion order == the order the user first set each field)
            for field, value in list(self._applied.get(idx, {}).items()):
                self.set_control(idx, field, value)
            if self._slots_mode:
                slot = self._morph_slot.get(idx)
                if slot is not None:
                    self._morph_dirty.add(idx)
                    self._slot_dirty.add(idx)
        self.counters["recoveries"] = self.counters.get("recoveries", 0) + 1
        return active

    def metrics_snapshot(self) -> dict:
        return {**self.metrics.snapshot(self.n_active), **self.counters}

    @property
    def n_active(self) -> int:
        return self.cfg.capacity - len(self._free)
