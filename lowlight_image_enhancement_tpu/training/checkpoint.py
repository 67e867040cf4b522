"""Checkpoint save / auto-resume (orbax).

Rebuild of the reference's dual-file scheme (``base_model.py:194-333``,
``train.py:182-204``): per-save-point network weights + full training
state, automatic resume from the highest-step checkpoint. In the TPU
framework both live in one orbax checkpoint
``training_states/<step>/`` = ``{params, opt_state, step, log_sigma}``,
and ``save_network`` additionally writes a params-only checkpoint under
``models/net_g_<step>`` (+ ``net_g_latest`` mirror) for inference-only
loading, matching the reference's ``net_g_<iter>.pth`` / ``.state`` split.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from lowlight_image_enhancement_tpu.training.train_step import TrainState


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_training_state(root: str, state: TrainState) -> str:
    """Write the full train state under ``root/<step>/``."""
    step = int(jax.device_get(state.step))
    path = os.path.join(os.path.abspath(root), f"{step:08d}")
    _ckptr().save(path, jax.device_get(state), force=True)
    return path


def save_network(root: str, state: TrainState, latest: bool = True) -> str:
    """Write a params-only checkpoint ``root/net_g_<step>``
    (+ ``net_g_latest``)."""
    step = int(jax.device_get(state.step))
    params = jax.device_get(state.params)
    path = os.path.join(os.path.abspath(root), f"net_g_{step:08d}")
    _ckptr().save(path, params, force=True)
    if latest:
        _ckptr().save(
            os.path.join(os.path.abspath(root), "net_g_latest"),
            params, force=True,
        )
    return path


def latest_training_state(root: str) -> Optional[str]:
    """Scan ``root`` for the max-step state dir (reference auto-resume,
    ``train.py:182-204``)."""
    if not os.path.isdir(root):
        return None
    best, best_step = None, -1
    for entry in os.listdir(root):
        if re.fullmatch(r"\d+", entry):
            step = int(entry)
            if step > best_step:
                best, best_step = entry, step
    return os.path.join(os.path.abspath(root), best) if best else None


def restore_training_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_training_state`.

    ``template`` (an initialized state) provides the tree structure and
    shapes/dtypes for orbax restoration.
    """
    restored = _ckptr().restore(
        os.path.abspath(path), item=jax.device_get(template)
    )
    return jax.tree_util.tree_map(jax.numpy.asarray, restored)


def restore_network(path: str, params_template: Any,
                    strict: bool = True) -> Any:
    """Restore a params-only checkpoint.

    ``strict=False`` mirrors the reference's tolerant ``load_network``
    (``base_model.py:262-287``): parameters present in both trees with
    matching shapes load; missing keys keep the template's values and
    shape mismatches are skipped with a warning.
    """
    if strict:
        restored = _ckptr().restore(
            os.path.abspath(path), item=jax.device_get(params_template)
        )
        return jax.tree_util.tree_map(jax.numpy.asarray, restored)
    restored_raw = _ckptr().restore(os.path.abspath(path))
    return merge_params(params_template, restored_raw)


def merge_params(template: Any, restored: Any) -> Any:
    """Non-strict merge: copy leaves from ``restored`` into ``template``
    where paths exist and shapes match; warn on skips."""
    import warnings

    import numpy as np

    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    flat_t = {
        tuple(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    flat_r = {
        tuple(str(p.key) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(restored)[0]
    }
    merged = dict(flat_t)
    skipped = []
    for key, leaf in flat_r.items():
        if key not in flat_t:
            skipped.append(("unexpected", key))
            continue
        if np.shape(flat_t[key]) != np.shape(leaf):
            skipped.append(("shape-mismatch", key))
            continue
        merged[key] = jax.numpy.asarray(leaf)
    for key in flat_t:
        if key not in flat_r:
            skipped.append(("missing", key))
    if skipped:
        warnings.warn(
            f"non-strict load skipped {len(skipped)} entries "
            f"(first few: {skipped[:4]})", stacklevel=2,
        )
    # rebuild the tree structure from the template
    treedef = jax.tree_util.tree_structure(template)
    paths = [
        tuple(str(p.key) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(template)[0]
    ]
    leaves = [merged[p] for p in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def auto_resume(root: str, template: TrainState) -> Optional[TrainState]:
    """Resume from the latest state under ``root`` if one exists."""
    path = latest_training_state(root)
    if path is None:
        return None
    return restore_training_state(path, template)
