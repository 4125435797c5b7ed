"""Checkpoint / resume and model-history snapshots.

The reference has no persistence beyond in-memory model snapshot lists
(`iA`/`iP` appended every `_isave` fit iterations, reference
model.py:132-135,201-204). Long batched sweeps on TPU need real
checkpointing: orbax-backed save/restore of arbitrary pytrees (model
operator, RLS state, fleet cursor, PRNG keys), with complex arrays split
into (re, im) pairs so checkpoints are portable to backends without complex
transfer support (see utils/cxio.py).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax

from .cxio import split_cx, merge_cx, fetch_cx

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but stay safe
    ocp = None
    _HAS_ORBAX = False


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (may contain complex leaves) to `path`."""
    host = fetch_cx(tree)  # device -> host, complex-safe
    split = split_cx(host)
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), split, force=True)
    else:
        leaves, treedef = jax.tree.flatten(split)
        np.savez(path + ".npz", *[np.asarray(l) for l in leaves])


def restore_checkpoint(path: str, like: Any) -> Any:
    """Restore a pytree saved by `save_checkpoint`; `like` provides the
    structure (and static fields) to restore into."""
    split_like = split_cx(fetch_cx(like))
    if _HAS_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path), item=split_like)
    else:
        data = np.load(path + ".npz")
        leaves_like, treedef = jax.tree.flatten(split_like)
        restored = jax.tree.unflatten(treedef, [data[k] for k in data.files])
    return merge_cx(restored)


class ModelHistory:
    """Host-side snapshot recorder for streaming model states - the role of
    the reference's `iA`/`iP` lists with `_isave` cadence
    (reference model.py:132-135): call `record(model_state)` after updates;
    every `every`-th call stores a host copy."""

    def __init__(self, every: int = 10):
        self.every = int(every)
        self._count = 0
        self.snapshots: list = []

    def record(self, model_state) -> None:
        self._count += 1
        if self._count % self.every == 0:
            self.snapshots.append(fetch_cx(model_state))

    def __len__(self) -> int:
        return len(self.snapshots)
