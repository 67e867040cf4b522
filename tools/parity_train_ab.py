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
LR, WD, CLIP, W_PHYS, W_PERC, RHO = 5e-4, 0.01, 0.01, 0.10, 0.02, 5.0
# the reference HybridLossPlus defaults (losses.py:228-244)
W_DELTAE, W_SSIM = 0.02, 0.05

# torchvision vgg19.features conv indices (same trunk layout both sides)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


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


def make_batch(side: int, n: int = 2, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(seed)
    short_raw = rng.uniform(0, 0.18, (n, side, side, 3)).astype(np.float32)
    lq = np.clip(short_raw * RHO, 0, 1).astype(np.float32)
    gt = np.clip(lq + rng.uniform(-0.05, 0.08, lq.shape), 0, 1).astype(
        np.float32)
    return {"lq": lq, "gt": gt, "short_raw": short_raw, "long_raw": gt,
            "short_obs": short_raw}


def make_shared_vgg(tmpdir: str):
    """One random-init VGG19 trunk used by BOTH sides.

    Returns ``(torch_features_sequential, npz_path)``: the torch
    ``nn.Sequential`` in exact torchvision ``vgg19().features`` layout
    (consumed by the reference's ``PerceptualLoss``,
    ``NewBP_model/losses.py:39-53``, via a stub ``torchvision``), and an
    npz of the same weights in the framework's converter format
    (``tools/convert_vgg_weights.py``) for our ``PerceptualLoss``.
    """
    import numpy as np
    import torch

    from convert_vgg_weights import _IDX_TO_NAME

    torch.manual_seed(123)
    layers, in_ch = [], 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    feats = torch.nn.Sequential(*layers)
    out = {}
    for idx, name in _IDX_TO_NAME.items():
        out[f"{name}.weight"] = feats[idx].weight.detach().numpy()
        out[f"{name}.bias"] = feats[idx].bias.detach().numpy()
    npz_path = os.path.join(tmpdir, "parity_vgg19.npz")
    np.savez(npz_path, **out)
    return feats, npz_path


def _torch_rgb_to_lab(img):
    """Faithful torch port of kornia's ``rgb_to_lab`` (D65/2deg, the
    reference's Lab source) — same constants/branches as the framework's
    ``ops/color.py:rgb_to_lab`` so the ONLY untested piece left in the
    DeltaE00 term is the conversion itself, which the Sharma gold-pair
    fixture already pins on the jax side. Input/output [N,3,H,W]."""
    import torch

    lin = torch.where(img > 0.04045,
                      ((img + 0.055) / 1.055).clamp(min=1e-12) ** 2.4,
                      img / 12.92)
    M = torch.tensor([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]], dtype=lin.dtype)
    xyz = torch.einsum("nchw,dc->ndhw", lin, M)
    white = torch.tensor([0.95047, 1.0, 1.08883],
                         dtype=lin.dtype).view(1, 3, 1, 1)
    t = xyz / white
    delta = 6.0 / 29.0
    f = torch.where(t > delta**3, t.clamp(min=1e-12) ** (1.0 / 3.0),
                    t / (3.0 * delta**2) + 4.0 / 29.0)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    return torch.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                        200.0 * (fy - fz)], 1)


def _make_torch_ssim_loss():
    """kornia.losses.SSIMLoss stand-in: DSSIM ``mean((1 - ssim)/2)`` with
    gaussian 11x11 sigma 1.5, reflect padding, k1/k2 = .01/.03 — the
    documented kornia semantics the reference wraps
    (``NewBP_model/losses.py:146-155``) and the framework's
    ``SSIMLoss``/``ssim_linear`` contract (``metrics/linear.py``)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    class SSIMLoss(torch.nn.Module):
        def __init__(self, window_size=11, max_val=1.0, reduction="mean"):
            super().__init__()
            assert reduction == "mean"
            self.window_size = window_size
            self.max_val = max_val
            ax = np.arange(window_size, dtype=np.float64) \
                - (window_size - 1) / 2.0
            w = np.exp(-(ax**2) / (2.0 * 1.5**2))
            self.register_buffer(
                "win", torch.tensor((w / w.sum()).astype(np.float32)))

        def _blur(self, z):
            c = z.shape[1]
            p = self.window_size // 2
            kcol = self.win.view(1, 1, -1, 1).expand(c, 1, -1, 1)
            krow = self.win.view(1, 1, 1, -1).expand(c, 1, 1, -1)
            z = F.pad(z, (0, 0, p, p), mode="reflect")
            z = F.conv2d(z, kcol, groups=c)
            z = F.pad(z, (p, p, 0, 0), mode="reflect")
            return F.conv2d(z, krow, groups=c)

        def forward(self, x, y):
            mu_x, mu_y = self._blur(x), self._blur(y)
            mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
            sx = (self._blur(x * x) - mu_x2).clamp(min=0.0)
            sy = (self._blur(y * y) - mu_y2).clamp(min=0.0)
            sxy = self._blur(x * y) - mu_xy
            c1 = (0.01 * self.max_val) ** 2
            c2 = (0.03 * self.max_val) ** 2
            ssim = ((2 * mu_xy + c1) * (2 * sxy + c2)) / (
                (mu_x2 + mu_y2 + c1) * (sx + sy + c2))
            return torch.mean((1.0 - ssim) / 2.0)

    return SSIMLoss


def _install_kornia_stub():
    """Install a ``kornia`` stub so the reference's DeltaE00Loss /
    SSIMLoss classes (``NewBP_model/losses.py:92-155``) import and run
    in place — kornia is absent in this image. The stub supplies only
    what those classes consume: ``kornia.color.rgb_to_lab`` and
    ``kornia.losses.SSIMLoss``."""
    if "kornia" in sys.modules:
        return
    K = types.ModuleType("kornia")
    Kc = types.ModuleType("kornia.color")
    Kc.rgb_to_lab = _torch_rgb_to_lab
    Kl = types.ModuleType("kornia.losses")
    Kl.SSIMLoss = _make_torch_ssim_loss()
    K.color, K.losses = Kc, Kl
    sys.modules["kornia"] = K
    sys.modules["kornia.color"] = Kc
    sys.modules["kornia.losses"] = Kl


def _load_reference_color_losses():
    """The reference's own DeltaE00Loss + SSIMLoss classes, executed in
    place over the kornia stub."""
    _install_kornia_stub()
    # losses.py also imports torchvision at module level
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.vgg19 = lambda *a, **k: None
        tvm.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    ref_losses = _load_ref("losses.py", "ref_newbp_losses_color",
                           "NewBP_model")
    return ref_losses.DeltaE00Loss, ref_losses.SSIMLoss


def _load_reference_perceptual(torch_feats):
    """The reference's own ``PerceptualLoss`` (``NewBP_model/losses.py:
    32-69``) built around a caller-supplied feature trunk — torchvision
    is absent in this image, so a stub module hands the reference class
    our shared-weights trunk instead."""
    import types

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda *a, **k: types.SimpleNamespace(features=torch_feats)
    tvm.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    ref_losses = _load_ref("losses.py", "ref_newbp_losses", "NewBP_model")
    return ref_losses.PerceptualLoss(device="cpu", use_mse=True)


def run_torch(steps: int, side: int, geometry=None, torch_feats=None,
              use_color=False):
    """Reference-side trajectory. Returns (losses, init_sd, final_sd,
    final_outputs_on_val)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    geometry = geometry or GEOMETRY
    TorchNAFNet, layer = load_reference_modules()
    perc = (_load_reference_perceptual(torch_feats)
            if torch_feats is not None else None)
    de_loss = ssim_loss = None
    if use_color:
        RefDeltaE, RefSSIM = _load_reference_color_losses()
        de_loss = RefDeltaE()
        ssim_loss = RefSSIM(window_size=11, max_val=1.0)
    torch.manual_seed(0)
    net = TorchNAFNet(**{k: list(v) if isinstance(v, tuple) else v
                         for k, v in geometry.items()})
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
        if perc is not None:
            total = total + W_PERC * perc(out, gt_t)
        if de_loss is not None:
            # srgb01 views exactly as the framework's train step maps
            # them (train_step.py: Bhat_srgb01=clip(out), B_srgb01=gt)
            out01 = out.clamp(0, 1)
            total = total + W_DELTAE * de_loss(out01, gt_t)
            total = total + W_SSIM * ssim_loss(out01.clamp(0, 1),
                                               gt_t.clamp(0, 1))
        total.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), CLIP)
        opt.step()
        losses.append(float(total.detach()))
    final_sd = {k: v.detach().clone().numpy()
                for k, v in net.state_dict().items()}
    net.eval()
    vb = make_batch(side, seed=1234)
    with torch.no_grad():
        val_out = net(to_t(vb["lq"])).clamp(0, 1).numpy()
    val_out = np.transpose(val_out, (0, 2, 3, 1))
    return losses, init_sd, final_sd, (val_out, vb["gt"])


def run_jax(steps: int, side: int, init_sd, geometry=None, vgg_npz=None,
            use_color=False):
    """Framework-side trajectory from the converted torch init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convert_torch_nafnet import convert_state_dict, flat_to_tree
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.losses.components import (
        PerceptualLoss)
    from lowlight_image_enhancement_tpu.models import NAFNet
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training.train_step import (
        TrainState, make_optimizer, make_train_step)

    geometry = geometry or GEOMETRY
    net = NAFNet(**geometry)
    params = flat_to_tree(convert_state_dict(init_sd))
    perceptual = (PerceptualLoss(weights_path=vgg_npz, dtype=jnp.float32)
                  if vgg_npz else None)
    loss = HybridLossPlus(
        use_perc=perceptual is not None, w_perc=W_PERC,
        perceptual=perceptual,
        use_deltaE=use_color, w_deltaE=W_DELTAE,
        use_ssim=use_color, w_ssim=W_SSIM, use_phys=True,
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

    vb = make_batch(side, seed=1234)
    val_out = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        state.params, jnp.asarray(vb["lq"]))
    val_out = np.clip(np.asarray(val_out), 0.0, 1.0)
    return losses, jax.device_get(state.params), (val_out, vb["gt"])


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


def _val_metrics(out, gt):
    """PSNR/SSIM of a trained model's val outputs (same function applied
    to both sides' outputs, so the delta isolates the trained models)."""
    import numpy as np

    from lowlight_image_enhancement_tpu.metrics.psnr_ssim_img import (
        calculate_psnr_img, calculate_ssim_img)

    o8 = (np.clip(out, 0, 1) * 255.0).round().astype(np.uint8)
    g8 = (np.clip(gt, 0, 1) * 255.0).round().astype(np.uint8)
    psnr = float(np.mean([calculate_psnr_img(o, g, crop_border=0)
                          for o, g in zip(o8, g8)]))
    ssim = float(np.mean([calculate_ssim_img(o, g, crop_border=0)
                          for o, g in zip(o8, g8)]))
    return psnr, ssim


def run_parity(steps: int = 12, side: int = 32, width: int = None,
               use_perc: bool = False, use_color: bool = False) -> dict:
    import tempfile

    geometry = dict(GEOMETRY)
    if width:
        geometry["width"] = width

    torch_feats, vgg_npz = (None, None)
    if use_perc:
        tmpdir = tempfile.mkdtemp(prefix="parity_vgg_")
        torch_feats, vgg_npz = make_shared_vgg(tmpdir)

    t_losses, init_sd, final_sd, t_val = run_torch(
        steps, side, geometry=geometry, torch_feats=torch_feats,
        use_color=use_color)
    j_losses, j_params, j_val = run_jax(
        steps, side, init_sd, geometry=geometry, vgg_npz=vgg_npz,
        use_color=use_color)
    rel = [abs(a - b) / max(abs(a), 1e-12)
           for a, b in zip(t_losses, j_losses)]
    dparam, dkey = compare_params(final_sd, j_params)
    t_psnr, t_ssim = _val_metrics(*t_val)
    j_psnr, j_ssim = _val_metrics(*j_val)
    objective = f"l1_raw + {W_PHYS}*phys_srgb(mono P2)"
    if use_perc:
        objective += (f" + {W_PERC}*perceptual(shared random-init VGG19, "
                      "identical weights both sides)")
    if use_color:
        objective += (
            f" + {W_DELTAE}*deltaE00 + {W_SSIM}*ssim — torch side runs "
            "the reference's OWN DeltaE00Loss/SSIMLoss classes "
            "(NewBP_model/losses.py:92-155) over a kornia stub "
            "(faithful rgb_to_lab + gaussian-11/1.5 SSIM); jax side is "
            "HybridLossPlus with use_deltaE/use_ssim — the FULL hybrid "
            "objective, every term gradient-coupled")
    return {
        "protocol": {"steps": steps, "side": side, "geometry": geometry,
                     "objective": objective,
                     "optimizer": f"AdamW lr={LR} wd={WD} clip={CLIP}",
                     "dtype": "float32 (CPU, both sides)"},
        "loss_torch": t_losses[:20] + (["..."] if steps > 20 else []),
        "loss_jax": j_losses[:20] + (["..."] if steps > 20 else []),
        "loss_torch_final": t_losses[-1],
        "loss_jax_final": j_losses[-1],
        "max_rel_loss_diff": max(rel),
        "final_rel_loss_diff": rel[-1],
        "final_param_max_abs_diff": dparam,
        "final_param_worst_leaf": dkey,
        "val_psnr_torch": t_psnr, "val_psnr_jax": j_psnr,
        "val_psnr_abs_diff": abs(t_psnr - j_psnr),
        "val_ssim_torch": t_ssim, "val_ssim_jax": j_ssim,
        "val_ssim_abs_diff": abs(t_ssim - j_ssim),
        "targets": {"psnr_abs_diff": 0.05, "ssim_abs_diff": 0.001},
        "pass": (abs(t_psnr - j_psnr) <= 0.05
                 and abs(t_ssim - j_ssim) <= 0.001),
        "torch_loss_decreased": t_losses[-1] < t_losses[0],
        "jax_loss_decreased": j_losses[-1] < j_losses[0],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument("--width", type=int, default=None,
                    help="override trunk width (v2 protocol: 16)")
    ap.add_argument("--perc", action="store_true",
                    help="add the perceptual term with shared random-init "
                         "VGG19 weights on both sides (v2 protocol)")
    ap.add_argument("--full", action="store_true",
                    help="the FULL hybrid objective: perceptual + deltaE00 "
                         "+ ssim + phys (v3 protocol; implies --perc)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if not reference_available():
        print("reference checkout not found — nothing to compare against")
        sys.exit(2)
    # Both sides run on the host CPU. The hosted TPU plugin ignores a
    # plain JAX_PLATFORMS=cpu; forcing CPU needs all three (conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    report = run_parity(args.steps, args.side, width=args.width,
                        use_perc=args.perc or args.full,
                        use_color=args.full)
    out = json.dumps(report, indent=2, default=str)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
