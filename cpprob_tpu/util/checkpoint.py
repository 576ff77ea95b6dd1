"""Checkpoint/resume for trained parameters — counterpart of the reference's
NN checkpointing (``infcomp/nn/nn.py:57-64`` torch.save of the module,
periodic saves ``util.py:29-37``, ``--resume`` picks the latest file
``main.py:38,56-57``).

Pytrees are saved as ``.npz`` (leaves) + a structure descriptor — no pickle of
code, safe to reload across versions.  Uses orbax-compatible layout names so a
later orbax backend is drop-in.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any, Optional, Tuple

import jax
import numpy as np

__all__ = [
    "save_pytree",
    "load_pytree",
    "latest_checkpoint",
    "periodic_saver",
    "save_pytree_orbax",
    "load_pytree_orbax",
]


def save_pytree(path: str, tree: Any) -> str:
    """Save a pytree of arrays; returns the written path (``<path>.npz``)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)
    return path if path.endswith(".npz") else path + ".npz"


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (shape/dtype-checked)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    loaded = [data[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(loaded, leaves)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"leaf {i}: checkpoint shape {np.shape(a)} != expected {np.shape(b)}"
            )
    return jax.tree_util.tree_unflatten(treedef, loaded)


def latest_checkpoint(directory: str, prefix: str = "ckpt") -> Optional[str]:
    """Most recent ``<prefix>-*.npz`` in ``directory`` (the --resume rule)."""
    paths = glob.glob(os.path.join(directory, f"{prefix}-*.npz"))
    return max(paths, key=os.path.getmtime) if paths else None


def save_pytree_orbax(path: str, tree: Any) -> str:
    """Orbax-backed checkpoint (sharding-aware; the multi-host-safe backend —
    each process writes its shard).  Requires an absolute path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ocp.PyTreeCheckpointer().save(path, tree)
    return path


def load_pytree_orbax(path: str, like: Any = None) -> Any:
    """Restore an orbax checkpoint; ``like`` (optional) provides the target
    structure/shardings for restoration on a different topology."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), item=like)
    return ckptr.restore(os.path.abspath(path))


class periodic_saver:
    """Save every ``every_n_traces`` processed traces
    (``--save_after_n_traces``, ``util.py:29-37``)."""

    def __init__(self, directory: str, every_n_traces: int, prefix: str = "ckpt"):
        self.directory = directory
        self.every = every_n_traces
        self.prefix = prefix
        self._since = 0
        self._count = 0

    def maybe_save(self, tree: Any, n_new_traces: int) -> Optional[str]:
        self._since += n_new_traces
        if self._since >= self.every:
            self._since = 0
            self._count += 1
            # timestamp + sequence number: several saves within one second
            # must not overwrite each other
            name = os.path.join(
                self.directory,
                f"{self.prefix}-{int(time.time())}-{self._count:05d}",
            )
            return save_pytree(name, tree)
        return None
