"""Training data pipeline: recorded-pair WAV datasets.

The practical path to parity with the closed reference weights is
distillation on (input, converted-output) pairs recorded from the
reference plugin offline (SURVEY.md §7 hard parts).  This module turns a
directory of such recordings into the fixed-shape batches the train steps
consume:

    data_dir/
      inputs/<name>.wav    any sample rate (resampled to 16 kHz here)
      targets/<name>.wav   any sample rate (resampled to 24 kHz here)
      [speakers.json]      optional {"<name>": speaker_id} map

If `targets/` is absent, the dataset runs in **identity mode**: the target
is the input resampled to 24 kHz — the self-supervised pre-training task
(teach the chain to be a transparent codec before distilling conversion
behavior), usable with any public speech corpus.

Everything here is host-side NumPy (the C++ host-edge polyphase resampler
when available); batches are static-shape [B, frames*160] / [B, frames*240]
aligned at the same 10 ms frame grid, so the jitted train step never
recompiles.
"""

from __future__ import annotations

import json
import os
import threading
import queue as _queue

import numpy as np

from ..audio_io import read_wav
from ..constants import IN_SAMPLE_RATE, OUT_SAMPLE_RATE
from ..native.host import HostResampler


def _to_rate(audio: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    if rate_in == rate_out:
        return audio.astype(np.float32)
    r = HostResampler(float(rate_in), float(rate_out))
    out = r.process(audio.astype(np.float32))
    # flush the filter tail so short files don't lose their end
    tail = r.process(np.zeros(256, np.float32))
    return np.concatenate([out, tail])


class PairDataset:
    """Loads and caches every utterance in memory (VC corpora are small:
    minutes-to-hours of 16 kHz mono; a full hour is ~230 MB as float32).

    Each item also carries a 10 ms-grid F0 track of the input audio
    (autocorrelation tracker, training/quality.py; 0 where unvoiced) --
    the pitch-supervision signal (distill.py:distillation_loss f0_bin)
    that anchors the pitch estimator's bin scale to physical frequency.
    """

    def __init__(self, data_dir: str, name_filter=None):
        """name_filter: optional callable(name)->bool selecting utterances
        by basename (e.g. the OOD protocol excluding held-out speakers)."""
        in_dir = os.path.join(data_dir, "inputs")
        tgt_dir = os.path.join(data_dir, "targets")
        if not os.path.isdir(in_dir):
            raise FileNotFoundError(f"{in_dir} not found")
        self.identity_mode = not os.path.isdir(tgt_dir)
        spk_path = os.path.join(data_dir, "speakers.json")
        spk_map = {}
        if os.path.exists(spk_path):
            with open(spk_path) as f:
                spk_map = json.load(f)
        # Exact F0 labels (r6): a synthetic corpus writes its plan
        # contours to f0_plan.npz (make_corpus.py) -- ground truth with
        # zero tracker error.  Real-recording corpora fall back to the
        # autocorrelation tracker below.
        plan_path = os.path.join(data_dir, "f0_plan.npz")
        f0_plan = dict(np.load(plan_path)) if os.path.exists(plan_path) \
            else {}
        self.items = []  # (audio16, target24, speaker_id, f0_hz [frames])
        for fn in sorted(os.listdir(in_dir)):
            if not fn.lower().endswith(".wav"):
                continue
            name = os.path.splitext(fn)[0]
            if name_filter is not None and not name_filter(name):
                continue
            a, sr = read_wav(os.path.join(in_dir, fn))
            a16 = _to_rate(a, sr, IN_SAMPLE_RATE)
            if self.identity_mode:
                t24 = _to_rate(a, sr, OUT_SAMPLE_RATE)
            else:
                tp = os.path.join(tgt_dir, fn)
                if not os.path.exists(tp):
                    continue
                t, tsr = read_wav(tp)
                t24 = _to_rate(t, tsr, OUT_SAMPLE_RATE)
            # align to the common frame grid
            n_frames = min(len(a16) // 160, len(t24) // 240)
            if n_frames < 2:
                continue
            a16 = a16[: n_frames * 160]
            if name in f0_plan:
                f0 = np.asarray(f0_plan[name], np.float32)
            else:
                from .quality import f0_track

                # Align the tracker grid with the model frame grid: the
                # tracker's window i spans [i*160, i*160+640) (center
                # i*160+320) while model frame i is centered at i*160+80.
                # Pre-padding 240 samples shifts every window center to
                # exactly i*160+80 so the CE/voicing targets hit the
                # frames they supervise (previously lagged ~1.5 frames).
                f0, voiced = f0_track(
                    np.pad(a16, (240, 0)), IN_SAMPLE_RATE)
                f0 = np.where(voiced, f0, 0.0).astype(np.float32)
            if len(f0) < n_frames:  # tracker window vs frame grid edge
                f0 = np.pad(f0, (0, n_frames - len(f0)), mode="edge")
            self.items.append(
                (
                    a16,
                    t24[: n_frames * 240],
                    int(spk_map.get(name, 0)),
                    f0[:n_frames],
                )
            )
        if not self.items:
            raise ValueError(f"no usable wav pairs under {data_dir}")

    def n_frames_total(self) -> int:
        return sum(len(a) // 160 for a, *_ in self.items)


def make_pair_batcher(dataset: PairDataset, cfg, bank, *, batch: int,
                      frames: int, seed: int = 0, prefetch: int = 2,
                      register_boost: float = 1.0):
    """Yield {audio16, target24, cond} batches of random aligned crops.

    Per-example speaker ids come from speakers.json (so one dataset can
    hold recordings converted to several target voices); the cond tensor
    is rebuilt per batch with those ids.

    register_boost: sampling weight multiplier for high-register pairs.
    The r6 pitch diagnosis (docs/PITCH_DIAGNOSIS.json) showed converted-F0
    RMSE is dominated by renderer collapse on high-register utterances
    (forced-bin renders at 1300-1600 cents with tracker voiced_frac ~0.3
    on the top-band eval utterance, vs 35-100 cents elsewhere): only
    ~15-20%% of the corpus sits in the stratified top band, so the
    waveform/GAN losses see too little high-F0 material to sharpen those
    harmonics.  Weight w(i) ramps 1 -> register_boost as the pair's mean
    voiced F0 crosses 240 -> 320 Hz; 1.0 keeps legacy uniform sampling."""
    import jax.numpy as jnp

    from ..runtime.offline import ConversionSettings, build_cond

    import jax

    rng = np.random.default_rng(seed)
    n16 = frames * 160
    usable = [i for i, (a, *_) in enumerate(dataset.items)
              if len(a) >= n16]
    if not usable:
        raise ValueError(f"no utterance has >= {frames} frames")
    if register_boost != 1.0:
        w = np.empty(len(usable), np.float64)
        for k, i in enumerate(usable):
            f0_hz = dataset.items[i][3]
            voiced = f0_hz[f0_hz > 0]
            mean_f0 = float(voiced.mean()) if len(voiced) else 0.0
            ramp = min(1.0, max(0.0, (mean_f0 - 240.0) / 80.0))
            w[k] = 1.0 + (register_boost - 1.0) * ramp
        p_usable = w / w.sum()
    else:
        p_usable = None

    # Per-speaker cond rows are STATIC: build each one once, keep them as
    # host numpy, and assemble per-batch conds with one gather + one
    # device transfer per leaf.  The previous per-example build_cond
    # (batch calls x dozens of eager jnp ops each) was both the training
    # bottleneck through the dev relay (every op a sync round trip) and a
    # steady host-memory leak (~1 batch of relay-backed buffers per step).
    n_speakers = bank["additive"].shape[0]
    per_spk = [build_cond(cfg, bank, ConversionSettings(target_speaker=s),
                          batch=1) for s in range(n_speakers)]
    cond_table = jax.tree_util.tree_map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
        *per_spk,
    )  # each leaf: [n_speakers, ...]

    def make_batch():
        a_out = np.zeros((batch, frames * 160), np.float32)
        t_out = np.zeros((batch, frames * 240), np.float32)
        f0_out = np.zeros((batch, frames), np.float32)
        spk = np.zeros((batch,), np.int32)
        for b in range(batch):
            idx = (int(rng.choice(len(usable), p=p_usable))
                   if p_usable is not None else int(rng.integers(len(usable))))
            a, t, sid, f0_hz = dataset.items[usable[idx]]
            f_max = len(a) // 160 - frames
            f0 = int(rng.integers(f_max + 1))
            a_out[b] = a[f0 * 160: (f0 + frames) * 160]
            t_out[b] = t[f0 * 240: (f0 + frames) * 240]
            f0_out[b] = f0_hz[f0: f0 + frames]
            spk[b] = sid
        cond = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[spk]), cond_table
        )
        from .distill import f0_to_bin

        return {
            "audio16": jnp.asarray(a_out),
            "target24": jnp.asarray(t_out),
            "cond": cond,
            "f0_bin": jnp.asarray(
                f0_to_bin(f0_out, cfg.pitch.pitch_bins)),
        }

    if prefetch <= 0:
        while True:
            yield make_batch()

    q: "_queue.Queue" = _queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            try:
                q.put(make_batch(), timeout=1.0)
            except _queue.Full:
                continue

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
