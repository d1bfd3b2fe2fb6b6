"""Training checkpoint/resume.

The reference's only persistence is the ParameterState blob (SURVEY.md
§3.5); training needs real checkpoints: generator + discriminator params,
both optimizer states, and the step counter, atomically on disk.

Format: one `ckpt_<step>.npz` per checkpoint holding the flattened leaves
of the full training pytree (`leaf_00000`...), restored against a `like`
tree for structure — the same flattened-arrays-on-disk convention as
`models/io.py` weights, with no pickled code objects (checkpoints stay
loadable across refactors and are safe to share)."""

from __future__ import annotations

import os
import re
import tempfile

import jax
import numpy as np

_PAT = re.compile(r"^ckpt_(\d+)\.npz$")


def save_checkpoint(ckpt_dir: str, step: int, tree) -> str:
    """Atomically write the training pytree at `step`."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def available_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    steps = []
    for fn in os.listdir(ckpt_dir):
        m = _PAT.match(fn)
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def latest_step(ckpt_dir: str):
    steps = available_steps(ckpt_dir)
    return steps[-1] if steps else None


def restore_checkpoint(ckpt_dir: str, like, step: int | None = None):
    """Restore the pytree saved at `step` (default: latest) using `like`
    for structure.  Returns (step, tree).  Raises FileNotFoundError if no
    checkpoint exists."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    treedef = jax.tree_util.tree_structure(like)
    like_leaves = jax.tree_util.tree_leaves(like)
    with np.load(path) as z:
        keys = sorted(z.files)
        if len(keys) != len(like_leaves):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves, expected "
                f"{len(like_leaves)} (structure changed?)"
            )
        leaves = []
        for k, ref in zip(keys, like_leaves):
            arr = z[k]
            ref_shape = getattr(ref, "shape", None)
            if ref_shape is not None and tuple(arr.shape) != tuple(ref_shape):
                raise ValueError(
                    f"leaf {k}: shape {arr.shape} != expected {ref_shape}"
                )
            # scalars that were python ints/floats in `like` stay that way
            if ref_shape is None:
                leaves.append(arr.item())
            else:
                import jax.numpy as jnp

                leaves.append(jnp.asarray(arr, dtype=ref.dtype))
        return step, jax.tree_util.tree_unflatten(treedef, leaves)


def prune_checkpoints(ckpt_dir: str, keep: int = 3) -> None:
    steps = available_steps(ckpt_dir)
    for s in steps[:-keep] if keep > 0 else steps:
        os.unlink(os.path.join(ckpt_dir, f"ckpt_{s:08d}.npz"))
