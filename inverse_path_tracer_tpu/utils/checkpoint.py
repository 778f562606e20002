"""Checkpoint / resume.

The reference never saves model weights (SURVEY.md §5); its only
artifacts are ad-hoc torch.save dumps of the dataset.  Here any pytree
(GCN params, recovery theta, optimizer state) checkpoints to a
self-describing npz with deterministic resume — counter-based RNG makes
renders reproducible across restarts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import numpy as np
import jax


def save_checkpoint(path: str, pytree: Any, step: int = 0, **meta) -> None:
    leaves, treedef = jax.tree.flatten(pytree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"step": step, "treedef": str(treedef), **meta}).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str, like: Any) -> Tuple[Any, int]:
    """Restore into the structure of `like`; returns (pytree, step)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves, treedef = jax.tree.flatten(like)
        restored = [
            jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
        ]
        return jax.tree.unflatten(treedef, restored), int(meta.get("step", 0))
