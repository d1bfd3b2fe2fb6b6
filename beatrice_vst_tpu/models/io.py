"""Model directory IO: the replacement for the reference's weight files.

A model directory contains (processor_core_2.cc:300-351 analogue):
    config.toml    model card (params/model_config.py)
    weights.npz    chain parameters, flattened "a/b/0/w" -> array
    speakers.npz   speaker bank (speakers/bank.py)

np.savez is the container (portable, mmap-able, no pickle).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import VERSIONS
from ..errors import BeatriceError, ErrorCode
from ..params.model_config import ModelConfig, load_model_config, write_model_config
from ..speakers import bank as bank_mod
from . import chain
from .chain import VoiceConverterConfig

WEIGHTS_FILE = "weights.npz"
SPEAKERS_FILE = "speakers.npz"
CONFIG_FILE = "config.toml"


def flatten_params(params, prefix=""):
    out = {}
    if isinstance(params, dict):
        items = params.items()
    elif isinstance(params, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(params))
    else:
        raise TypeError(type(params))
    for k, v in items:
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            out.update(flatten_params(v, key))
        else:
            out[key] = v
    return out


def unflatten_params(flat):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_weights(path: str, params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in flatten_params(params).items()})


def load_weights(path: str):
    if not os.path.exists(path):
        raise BeatriceError(ErrorCode.FILE_OPEN_ERROR, path)
    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k]) for k in z.files}
    return unflatten_params(flat)


def save_model_dir(dirpath: str, config: ModelConfig, params, bank) -> None:
    os.makedirs(dirpath, exist_ok=True)
    write_model_config(config, os.path.join(dirpath, CONFIG_FILE))
    save_weights(os.path.join(dirpath, WEIGHTS_FILE), params)
    bank_mod.save(os.path.join(dirpath, SPEAKERS_FILE), bank)


def load_model_dir(path: str):
    """Load (config, model_cfg, params, bank) from a model directory or its
    config.toml path."""
    if path.endswith(".toml"):
        config = load_model_config(path)
        dirpath = os.path.dirname(os.path.abspath(path))
    else:
        dirpath = path
        config = load_model_config(os.path.join(dirpath, CONFIG_FILE))
    spec = config.spec
    model_cfg = VoiceConverterConfig.for_version(spec)
    params = load_weights(os.path.join(dirpath, WEIGHTS_FILE))
    bank = bank_mod.load(os.path.join(dirpath, SPEAKERS_FILE), spec)
    if bank_mod.n_speakers(bank) < config.voice_count:
        raise BeatriceError(
            ErrorCode.INVALID_MODEL_CONFIG,
            f"bank has {bank_mod.n_speakers(bank)} speakers, card lists {config.voice_count}",
        )
    return config, model_cfg, params, bank


def init_random_model_dir(dirpath: str, version: str = "2.0.0-rc.0",
                          n_voices: int = 4, seed: int = 0,
                          name: str = "random-init"):
    """Create a runnable (untrained) model directory -- used by tests, the
    CLI quickstart, and benchmarks."""
    from ..params.model_config import Portrait, Voice

    spec = VERSIONS[version]
    model_cfg = VoiceConverterConfig.for_version(spec)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = chain.init(k1, model_cfg)
    bank = bank_mod.random_bank(k2, spec, n_voices)
    config = ModelConfig(
        version=version, name=name, description="randomly initialized model",
        voices=tuple(
            Voice(name=f"voice{i}", description="", average_pitch=60.0,
                  portrait=Portrait())
            for i in range(n_voices)
        ),
        path=os.path.abspath(dirpath),
    )
    save_model_dir(dirpath, config, params, bank)
    return config, model_cfg, params, bank
