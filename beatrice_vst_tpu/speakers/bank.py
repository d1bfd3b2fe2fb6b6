"""Speaker embedding banks: the weight-container replacement for the
reference's `speaker_embeddings.bin` / `formant_shift_embeddings.bin`.

Contents per version (contract from beatrice.h:94-101,272-290 and
processor_core_2.cc:327-366):
  20a2/20b1:  embeddings [n+1, 256]  (slot n = morph result),
              formant    [9, 256]
  20rc0:      codebooks  [n, 512, 128]
              additive   [n+1, 256]
              formant    [9, 256]
              kv         [n+1, 384, 128]

The "+1" morph slots exist in the reference because morph results are
written back into the bank; in the TPU design morph results live in
per-stream state instead (they differ per stream!), so banks store only
the n real speakers.  Banks are plain dicts of arrays; stored on disk as
.npz (our format) with a raw-float32 reader for a2/b1-style flat files.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..constants import (
    MAX_N_SPEAKERS,
    N_FORMANT_SHIFT_EMBEDDINGS,
    VersionSpec,
    WAVEFORM_GENERATOR_HIDDEN_CHANNELS as HID,
)
from ..errors import BeatriceError, ErrorCode


def random_bank(key, spec: VersionSpec, n_speakers: int, scale=0.5):
    """Random bank for tests/benchmarks (no trained weights exist yet)."""
    import jax

    if not 1 <= n_speakers <= MAX_N_SPEAKERS:
        raise BeatriceError(ErrorCode.SPEAKER_ID_OUT_OF_RANGE, str(n_speakers))
    ks = jax.random.split(key, 4)
    bank = {
        "additive": jax.random.normal(ks[0], (n_speakers, HID)) * scale,
        "formant": jax.random.normal(ks[1], (N_FORMANT_SHIFT_EMBEDDINGS, HID)) * (scale * 0.2),
    }
    if spec.has_vq:
        bank["codebook"] = jax.random.normal(
            ks[2], (n_speakers, spec.codebook_size, spec.phone_channels)
        )
    if spec.has_kv:
        bank["kv"] = jax.random.normal(
            ks[3], (n_speakers, spec.kv_length, spec.kv_channels)
        ) * scale
    return bank


def n_speakers(bank) -> int:
    return bank["additive"].shape[0]


def save(path: str, bank) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in bank.items()})


def load(path: str, spec: VersionSpec):
    """Load a bank: .npz (ours) or raw float32 flat file (a2/b1-style,
    n_speakers inferred from size as the reference's ReadNSpeakers does)."""
    if not os.path.exists(path):
        raise BeatriceError(ErrorCode.FILE_OPEN_ERROR, path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            bank = {k: jnp.asarray(z[k]) for k in z.files}
        _validate(bank, spec)
        return bank
    # raw float32: [n, 256] additive embeddings (20a2/20b1 format).  The
    # reference stores formant-shift embeddings as a sibling raw file of
    # 9x256 floats loaded alongside (processor_core_0.cc:165-218); honor
    # the same layout when present.
    raw = np.fromfile(path, dtype=np.float32)
    if raw.size == 0:
        raise BeatriceError(ErrorCode.FILE_TOO_SMALL, path)
    if raw.size % HID:
        raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, path)
    n = raw.size // HID
    if n > MAX_N_SPEAKERS:
        raise BeatriceError(ErrorCode.FILE_TOO_LARGE, path)
    sibling = os.path.join(
        os.path.dirname(path), "formant_shift_embeddings.bin"
    )
    formant = (
        load_raw_formant(sibling)
        if os.path.exists(sibling)
        else jnp.zeros((N_FORMANT_SHIFT_EMBEDDINGS, HID))
    )
    return {
        "additive": jnp.asarray(raw.reshape(n, HID)),
        "formant": formant,
    }


def load_raw_rc0_dir(dirpath: str, spec: VersionSpec):
    """Load a 20rc0-style directory of raw float32 embedding files
    (the reference's per-model layout, processor_core_2.cc:300-366):

        speaker_embeddings.bin          n x 512 x 128  (VQ codebooks)
        embedding_setter.bin additions come as separate raw banks:
        additive_speaker_embeddings.bin n x 256
        formant_shift_embeddings.bin    9 x 256
        key_value_speaker_embeddings.bin n x 384 x 128

    n is inferred from the additive file's size (ReadNSpeakers analogue);
    every other file is validated against it."""
    add_path = os.path.join(dirpath, "additive_speaker_embeddings.bin")
    if not os.path.exists(add_path):
        raise BeatriceError(ErrorCode.FILE_OPEN_ERROR, add_path)
    raw = np.fromfile(add_path, dtype=np.float32)
    if raw.size == 0:
        raise BeatriceError(ErrorCode.FILE_TOO_SMALL, add_path)
    if raw.size % HID:
        raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, add_path)
    n = raw.size // HID
    if n > MAX_N_SPEAKERS:
        raise BeatriceError(ErrorCode.FILE_TOO_LARGE, add_path)
    bank = {"additive": jnp.asarray(raw.reshape(n, HID))}

    formant_path = os.path.join(dirpath, "formant_shift_embeddings.bin")
    bank["formant"] = (
        load_raw_formant(formant_path)
        if os.path.exists(formant_path)
        else jnp.zeros((N_FORMANT_SHIFT_EMBEDDINGS, HID))
    )

    def read_exact(name, shape):
        p = os.path.join(dirpath, name)
        if not os.path.exists(p):
            raise BeatriceError(ErrorCode.FILE_OPEN_ERROR, p)
        want = int(np.prod(shape))
        arr = np.fromfile(p, dtype=np.float32)
        if arr.size < want:
            raise BeatriceError(ErrorCode.FILE_TOO_SMALL, p)
        if arr.size > want:
            raise BeatriceError(ErrorCode.FILE_TOO_LARGE, p)
        return jnp.asarray(arr.reshape(shape))

    if spec.has_vq:
        bank["codebook"] = read_exact(
            "speaker_embeddings.bin",
            (n, spec.codebook_size, spec.phone_channels),
        )
    if spec.has_kv:
        bank["kv"] = read_exact(
            "key_value_speaker_embeddings.bin",
            (n, spec.kv_length, spec.kv_channels),
        )
    _validate(bank, spec)
    return bank


def load_raw_formant(path: str):
    """Raw float32 formant-shift embedding file: exactly 9x256 floats
    (-2..+2 semitones in 0.5 steps, beatrice.h:98-101)."""
    if not os.path.exists(path):
        raise BeatriceError(ErrorCode.FILE_OPEN_ERROR, path)
    raw = np.fromfile(path, dtype=np.float32)
    want = N_FORMANT_SHIFT_EMBEDDINGS * HID
    if raw.size < want:
        raise BeatriceError(ErrorCode.FILE_TOO_SMALL, path)
    if raw.size > want:
        raise BeatriceError(ErrorCode.FILE_TOO_LARGE, path)
    return jnp.asarray(raw.reshape(N_FORMANT_SHIFT_EMBEDDINGS, HID))


def _validate(bank, spec: VersionSpec) -> None:
    if "additive" not in bank or bank["additive"].ndim != 2:
        raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, "missing additive embeddings")
    n = bank["additive"].shape[0]
    if not 1 <= n <= MAX_N_SPEAKERS:
        raise BeatriceError(ErrorCode.SPEAKER_ID_OUT_OF_RANGE, str(n))
    if bank["additive"].shape[1] != HID:
        raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, "additive dim")
    if spec.has_vq and "codebook" in bank:
        if bank["codebook"].shape != (n, spec.codebook_size, spec.phone_channels):
            raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, "codebook shape")
    if spec.has_kv and "kv" in bank:
        if bank["kv"].shape != (n, spec.kv_length, spec.kv_channels):
            raise BeatriceError(ErrorCode.INVALID_FILE_SIZE, "kv shape")
