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


def restore_network(path: str, params_template: Any) -> Any:
    """Restore a params-only checkpoint."""
    restored = _ckptr().restore(
        os.path.abspath(path), item=jax.device_get(params_template)
    )
    return jax.tree_util.tree_map(jax.numpy.asarray, restored)


def auto_resume(root: str, template: TrainState) -> Optional[TrainState]:
    """Resume from the latest state under ``root`` if one exists."""
    path = latest_training_state(root)
    if path is None:
        return None
    return restore_training_state(path, template)
