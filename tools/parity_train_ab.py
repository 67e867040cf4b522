#!/usr/bin/env python
"""Training-trajectory parity A/B: reference torch vs this framework.

Forward parity (tests/test_torch_parity.py) proves the *networks* match;
this tool proves the *training loop* matches. It runs N optimizer steps
of the same objective on both frameworks from identical weights and
identical data:

* **reference side** — the reference's own torch ``NAFNet`` and
  ``CrosstalkPSF`` executed in place (never copied), torch ``AdamW``
  (lr 5e-4, wd 0.01) with ``clip_grad_norm_(0.01)`` — the reference
  recipe's optimizer semantics (``image_restoration_model.py:112-142``,
  clip at ``:305``);
* **TPU side** — this framework's jitted ``make_train_step`` (same
  objective via ``HybridLossPlus``, optax ``clip_by_global_norm(0.01)``
  + ``adamw``) from the converted initial ``state_dict``.

The objective is the weight-free subset of the recipe — ``L1(raw) +
w_phys * phys_srgb`` (``NewBP_model/losses.py:158-220``) — so the run
is hermetic (no pretrained VGG needed, and the reference's perceptual
class would require torchvision). A matching trajectory composes every
backward (LayerNorm2d custom grad, conv/dwconv grads, the PSF depthwise
conv in the loss graph), the grad-clip + AdamW update math, and the
batch wiring into one end-to-end check.

Both sides run fp32 on CPU. Framework float differences (conv algorithms,
summation order) compound chaotically through the optimizer, so per-step
agreement degrades gracefully with N; the default 12 steps stay within
~1e-3 relative.

Usage: python tools/parity_train_ab.py [--steps 12] [--side 32]
       [--json out.json]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_ROOT = os.environ.get("LLIE_REFERENCE_ROOT", "/root/reference")
_ARCHS = "NAFNet_base/basicsr/models/archs"

GEOMETRY = dict(img_channel=3, width=8, middle_blk_num=2,
                enc_blk_nums=(1, 2), dec_blk_nums=(1, 1))
LR, WD, CLIP, W_PHYS, RHO = 5e-4, 0.01, 0.01, 0.10, 5.0


def reference_available() -> bool:
    return os.path.exists(os.path.join(REFERENCE_ROOT, _ARCHS,
                                       "NAFNet_arch.py"))


def _load_ref(fname: str, modname: str, root: str = ""):
    path = os.path.join(REFERENCE_ROOT, root, fname)
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Reference NAFNet + CrosstalkPSF, imported in place (read-only)."""
    import torch  # noqa: F401  (fail fast)

    for name in ("basicsr", "basicsr.models", "basicsr.models.archs",
                 "basicsr.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["basicsr.utils"].get_root_logger = (
        lambda *a, **k: __import__("logging").getLogger("stub")
    )
    _load_ref("arch_util.py", "basicsr.models.archs.arch_util", _ARCHS)
    _load_ref("local_arch.py", "basicsr.models.archs.local_arch", _ARCHS)
    arch = _load_ref("NAFNet_arch.py", "basicsr.models.archs.NAFNet_arch",
                     _ARCHS)
    layer = _load_ref("newbp_layer.py", "ref_newbp_layer", "NewBP_model")
    return arch.NAFNet, layer


def make_batch(side: int, n: int = 2):
    import numpy as np

    rng = np.random.default_rng(7)
    short_raw = rng.uniform(0, 0.18, (n, side, side, 3)).astype(np.float32)
    lq = np.clip(short_raw * RHO, 0, 1).astype(np.float32)
    gt = np.clip(lq + rng.uniform(-0.05, 0.08, lq.shape), 0, 1).astype(
        np.float32)
    return {"lq": lq, "gt": gt, "short_raw": short_raw, "long_raw": gt,
            "short_obs": short_raw}


def run_torch(steps: int, side: int):
    """Reference-side trajectory. Returns (losses, init_sd, final_sd)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    TorchNAFNet, layer = load_reference_modules()
    torch.manual_seed(0)
    net = TorchNAFNet(**{k: list(v) if isinstance(v, tuple) else v
                         for k, v in GEOMETRY.items()})
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    init_sd = {k: v.detach().clone().numpy()
               for k, v in net.state_dict().items()}

    # reference PSF: mono P2, energy-normalized buffer (newbp_layer.py)
    kernels = layer.build_psf_kernels("mono", "P2")
    psf = layer.CrosstalkPSF("mono", kernels)

    b = make_batch(side)
    to_t = lambda a: torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    lq_t, gt_t, obs_t = to_t(b["lq"]), to_t(b["gt"]), to_t(b["short_obs"])
    align = (obs_t.clamp(0, 1) * RHO).clamp(0, 1)

    opt = torch.optim.AdamW(net.parameters(), lr=LR, betas=(0.9, 0.999),
                            weight_decay=WD)
    losses = []
    net.train()
    for _ in range(steps):
        opt.zero_grad()
        out = net(lq_t)
        l1 = F.l1_loss(out, gt_t)
        phys = F.l1_loss(psf(out.clamp(0, 1)), align)
        total = l1 + W_PHYS * phys
        total.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), CLIP)
        opt.step()
        losses.append(float(total.detach()))
    final_sd = {k: v.detach().clone().numpy()
                for k, v in net.state_dict().items()}
    return losses, init_sd, final_sd


def run_jax(steps: int, side: int, init_sd):
    """Framework-side trajectory from the converted torch init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convert_torch_nafnet import convert_state_dict, flat_to_tree
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import NAFNet
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training.train_step import (
        TrainState, make_optimizer, make_train_step)

    net = NAFNet(**GEOMETRY)
    params = flat_to_tree(convert_state_dict(init_sd))
    loss = HybridLossPlus(
        use_perc=False, use_deltaE=False, use_ssim=False, use_phys=True,
        w_phys=W_PHYS, physics_psf_module=create_crosstalk_psf("mono", "P2"),
    )
    tx = make_optimizer(LR)   # AdamW(wd 0.01) + global-norm clip 0.01
    trainable = {"params": params, "log_sigma": {}}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(trainable), log_sigma={})
    step = make_train_step(net, loss, tx, donate=False)

    b = make_batch(side)
    expo = np.full((b["lq"].shape[0],), RHO, np.float32)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    batch["expo_ratio"] = jnp.asarray(expo)

    losses = []
    for _ in range(steps):
        state, logs = step(state, batch)
        losses.append(float(logs["l_total"]))
    return losses, jax.device_get(state.params)


def compare_params(final_sd, jax_params):
    """Max |delta| between the torch final params (converted) and ours."""
    import numpy as np

    from convert_torch_nafnet import convert_state_dict, flat_to_tree
    import jax

    ref_tree = flat_to_tree(convert_state_dict(final_sd))
    leaves_r = jax.tree_util.tree_leaves_with_path(ref_tree)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(jax_params))
    worst, worst_key = 0.0, None
    for path, leaf in leaves_r:
        other = flat_j.get(path)
        if other is None:
            continue
        d = float(np.max(np.abs(np.asarray(leaf) - np.asarray(other))))
        if d > worst:
            worst, worst_key = d, jax.tree_util.keystr(path)
    return worst, worst_key


def run_parity(steps: int = 12, side: int = 32) -> dict:
    t_losses, init_sd, final_sd = run_torch(steps, side)
    j_losses, j_params = run_jax(steps, side, init_sd)
    rel = [abs(a - b) / max(abs(a), 1e-12)
           for a, b in zip(t_losses, j_losses)]
    dparam, dkey = compare_params(final_sd, j_params)
    return {
        "protocol": {"steps": steps, "side": side, "geometry": GEOMETRY,
                     "objective": f"l1_raw + {W_PHYS}*phys_srgb(mono P2)",
                     "optimizer": f"AdamW lr={LR} wd={WD} clip={CLIP}",
                     "dtype": "float32 (CPU, both sides)"},
        "loss_torch": t_losses,
        "loss_jax": j_losses,
        "max_rel_loss_diff": max(rel),
        "final_param_max_abs_diff": dparam,
        "final_param_worst_leaf": dkey,
        "torch_loss_decreased": t_losses[-1] < t_losses[0],
        "jax_loss_decreased": j_losses[-1] < j_losses[0],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if not reference_available():
        print("reference checkout not found — nothing to compare against")
        sys.exit(2)
    report = run_parity(args.steps, args.side)
    out = json.dumps(report, indent=2, default=str)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
