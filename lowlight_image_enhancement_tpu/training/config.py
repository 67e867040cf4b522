"""YAML experiment-config system (reference ``basicsr/utils/options.py``).

``parse(opt_path, is_train)`` loads a reference-compatible YAML into a
nested dict and applies the same derivations:

- env-var expansion ``${VAR}`` in string values (plus ``SID_ROOT``
  auto-detection, reference ``utils/sid_paths.py``),
- phase-splitting of ``datasets:`` keys (``test_1`` -> phase ``test``),
- ``scale`` propagation into each dataset,
- derived experiment dirs ``experiments/<name>/{models,training_states,
  visualization}`` (train) or ``results/<name>`` (test),
- **debug-mode overrides** when ``'debug' in name``: ``val_freq=8,
  print_freq=1, save_checkpoint_freq=8`` (``options.py:138-143``),
- ``dist/rank/world_size`` defaults for the single-process JAX runtime.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

_ENV_RE = re.compile(r"\$\{(\w+)\}")

_SID_MARKERS = ("SID_assets", "SID_lmdb", "SID_raw", "SID_experiments",
                "SID_pack")


def find_sid_root(start: Optional[str] = None) -> Optional[str]:
    """Resolve the SID data root (reference ``sid_paths.py:12-107``):
    env ``SID_ROOT``/``LOWLIGHT_ROOT``, else walk up from ``start`` looking
    for a directory containing >= 2 marker subdirectories."""
    for var in ("SID_ROOT", "LOWLIGHT_ROOT"):
        val = os.environ.get(var)
        if val and os.path.isdir(val):
            return val
    cur = Path(start or os.getcwd()).resolve()
    for cand in (cur, *cur.parents):
        hits = sum((cand / m).is_dir() for m in _SID_MARKERS)
        if hits >= 2:
            return str(cand)
    return None


def _default_debug_sid_root() -> str:
    """Self-provision the hermetic debug fixture set when a config
    references ``${DEBUG_SID_ROOT}`` and the variable is unset, so
    ``train -opt configs/debug/...`` works with zero setup (the debug
    configs are hermetic by design — reference ``data/debug_sid/``
    scheme, C63). Idempotent: generation is skipped when the manifest
    already exists."""
    uid = getattr(os, "getuid", lambda: "u")()
    root = os.path.join(tempfile.gettempdir(), f"llie_debug_sid_{uid}")
    if not os.path.exists(os.path.join(root, "manifest_sid_debug.json")):
        from lowlight_image_enhancement_tpu.data.debug_fixtures import (
            make_debug_sid,
        )

        # build into a private dir, then atomically claim `root` — two
        # concurrent parses never see half-written packs
        tmp = f"{root}.build{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            make_debug_sid(tmp)
            try:
                os.rename(tmp, root)
            except OSError:
                # lost the race to a concurrent builder, or a stale/
                # partial `root` from an interrupted build: keep whoever
                # has a manifest, else replace the partial dir. The
                # replacement rename can itself lose a second race —
                # accept the winner's tree if a manifest appeared.
                manifest = os.path.join(root, "manifest_sid_debug.json")
                if not os.path.exists(manifest):
                    shutil.rmtree(root, ignore_errors=True)
                    try:
                        os.rename(tmp, root)
                    except OSError:
                        if not os.path.exists(manifest):
                            raise
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        logging.getLogger(__name__).info(
            "DEBUG_SID_ROOT unset — generated synthetic debug fixtures "
            "at %s", root)
    os.environ["DEBUG_SID_ROOT"] = root
    return root


def _expand_value(val: Any, env: Dict[str, str]) -> Any:
    if isinstance(val, str):
        def sub(m):
            name = m.group(1)
            if name in env:
                return env[name]
            if name in os.environ:
                return os.environ[name]
            if name == "DEBUG_SID_ROOT":
                return _default_debug_sid_root()
            return m.group(0)

        return _ENV_RE.sub(sub, val)
    if isinstance(val, dict):
        return {k: _expand_value(v, env) for k, v in val.items()}
    if isinstance(val, list):
        return [_expand_value(v, env) for v in val]
    return val


def parse(opt_path: str, is_train: bool = True,
          root_dir: Optional[str] = None) -> Dict[str, Any]:
    with open(opt_path) as f:
        opt = yaml.safe_load(f)

    env: Dict[str, str] = {}
    sid_root = find_sid_root()
    if sid_root:
        env["SID_ROOT"] = sid_root
    opt = _expand_value(opt, env)

    opt["is_train"] = is_train
    opt.setdefault("dist", False)
    opt.setdefault("rank", 0)
    opt.setdefault("world_size", 1)
    opt.setdefault("manual_seed", 0)
    scale = opt.get("scale", 1)
    opt["scale"] = scale

    # datasets: phase splitting + scale propagation
    for phase_key, ds in list((opt.get("datasets") or {}).items()):
        phase = phase_key.split("_")[0]
        if isinstance(ds, dict):
            ds["phase"] = ds.get("phase", phase)
            ds["scale"] = scale

    # derived paths
    root = Path(root_dir or os.getcwd())
    name = opt.get("name", "experiment")
    path_opt = opt.setdefault("path", {})
    if is_train:
        exp_root = root / "experiments" / name
        path_opt["experiments_root"] = str(exp_root)
        path_opt["models"] = str(exp_root / "models")
        path_opt["training_states"] = str(exp_root / "training_states")
        path_opt["log"] = str(exp_root)
        path_opt["visualization"] = str(exp_root / "visualization")
        # debug-name convention flips frequencies (options.py:138-143)
        if "debug" in name:
            opt.setdefault("val", {})["val_freq"] = 8
            logger_opt = opt.setdefault("logger", {})
            logger_opt["print_freq"] = 1
            logger_opt["save_checkpoint_freq"] = 8
    else:
        results_root = root / "results" / name
        path_opt["results_root"] = str(results_root)
        path_opt["log"] = str(results_root)
        path_opt["visualization"] = str(results_root / "visualization")
    return opt


def dict2str(opt: Dict[str, Any], indent: int = 1) -> str:
    """Pretty-print a nested config (reference ``dict2str``)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent * 2) + f"{k}:\n" + dict2str(v, indent + 1)
        else:
            msg += " " * (indent * 2) + f"{k}: {v}\n"
    return msg
