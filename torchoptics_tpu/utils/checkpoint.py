"""Checkpoint / resume for lens-optimization state.

The reference has no save/load at all (SURVEY §5); its closest artifact is
the YAML lens prescription. This provides both:

* :func:`save` / :func:`restore` — full pytree checkpoints (lens params +
  optimizer state + step) via orbax when available, with a pure-numpy ``.npz``
  fallback so checkpointing never depends on optional packages.
* YAML export of the current design lives in :mod:`torchoptics_tpu.models.io`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save(path: str, tree: Any, metadata: Optional[Dict[str, Any]] = None
         ) -> None:
    """Save a pytree of arrays to ``path`` (.npz archive + json sidecar)."""
    paths, leaves, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    meta = {"paths": paths, "metadata": metadata or {}}
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved with :func:`save`, using ``like`` for the tree
    structure.

    Raises ``ValueError`` (never a stripped-under-``-O`` assert) when the
    checkpoint does not match ``like``: leaf-count mismatch, or — when the
    ``.meta.json`` sidecar is present — a tree-path mismatch, reporting the
    first differing path on each side."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    like_paths, like_leaves, treedef = _flatten_with_paths(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint {path!r} has {len(leaves)} leaves, but the "
            f"template has {len(like_leaves)}; was it saved from a "
            "different structure?")
    meta_file = _meta_path(path)
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            saved_paths = json.load(f).get("paths")
        if saved_paths is not None and list(saved_paths) != list(like_paths):
            diffs = [(s, l) for s, l in zip(saved_paths, like_paths)
                     if s != l]
            raise ValueError(
                f"checkpoint {path!r} tree structure does not match the "
                f"template: first differing leaf path is "
                f"{diffs[0][0]!r} (saved) vs {diffs[0][1]!r} (template)")
    import jax.numpy as jnp
    leaves = [jnp.asarray(v) for v in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> Dict[str, Any]:
    with open(_meta_path(path)) as f:
        return json.load(f)["metadata"]


def save_orbax(path: str, tree: Any) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-safe); falls back
    to :func:`save` if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save(path, tree)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)


def restore_orbax(path: str, like: Any) -> Any:
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return restore(path, like)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=like)
