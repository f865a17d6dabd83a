"""Pytree checkpoint/resume.

The reference's closest analogue is progressive-accumulation state that
resets on scene change and the screenshot resolve path
(``OptiXRenderer/Renderer.cpp:1202-1256``, SURVEY.md §5 "Checkpoint /
resume"). On TPU every piece of renderer state — accumulation buffers,
sample counts, inverse-rendering parameters and optimizer moments — is a
pytree of arrays, so checkpointing is generic: flatten with named paths,
store as one ``.npz`` (atomic rename), restore into the original treedef.

Kept dependency-light on purpose (plain npz + json sidecar in the same
file), but the functions accept/return ordinary pytrees so swapping in
orbax for multi-host async checkpointing is a one-line change at the call
site.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

_META_KEY = "__checkpoint_meta__"


def _path_str(path) -> str:
    out = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            out.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            out.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return "/".join(out) if out else "<root>"


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None,
                    metadata: Optional[dict] = None) -> str:
    """Write a pytree of arrays to ``path`` (npz). Atomic: writes to a
    temp file in the same directory, then renames. Returns ``path``."""
    leaves_with_paths, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    names = []
    for i, (kp, leaf) in enumerate(leaves_with_paths):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
        names.append(_path_str(kp))
    meta = {"names": names, "step": step, "metadata": metadata or {}}
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, like: Any = None):
    """Load a checkpoint. Returns ``(tree, step, metadata)``.

    With ``like`` (a pytree of the same structure, e.g. the freshly
    initialized state), leaves are restored INTO that structure — names are
    validated against the saved ones so silent reordering is impossible.
    Without ``like``, returns a flat ``{name: array}`` dict.
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
        leaves = [data[f"leaf_{i}"] for i in range(len(meta["names"]))]

    if like is None:
        tree = dict(zip(meta["names"], leaves))
    else:
        like_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
        if len(like_paths) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, template has "
                f"{len(like_paths)}")
        for (kp, template), name in zip(like_paths, meta["names"]):
            if _path_str(kp) != name:
                raise ValueError(
                    f"leaf mismatch: checkpoint '{name}' vs template "
                    f"'{_path_str(kp)}'")
        restored = [
            jnp.asarray(leaf, dtype=template.dtype) if hasattr(template, "dtype")
            else leaf
            for (kp, template), leaf in zip(like_paths, leaves)]
        tree = jax.tree_util.tree_unflatten(treedef, restored)
    return tree, meta.get("step"), meta.get("metadata", {})


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """Highest-step ``{prefix}{step}.npz`` in ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if not (name.startswith(prefix) and name.endswith(".npz")):
            continue
        try:
            step = int(name[len(prefix):-4])
        except ValueError:
            continue
        if step > best_step:
            best, best_step = os.path.join(directory, name), step
    return best
