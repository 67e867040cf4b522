"""Same-host CPU calibration of the reference-vs-TPU baseline estimate.

Every ``vs_baseline`` number in BENCH/BASELINE divides by a *documented
estimate* of the reference's A100 throughput (8.0 steps/s for the
flagship 512(2) batch-2 full-hybrid recipe).  No A100 exists in this
image, but the reference torch code and a CPU do — so this tool runs the
SAME training-step protocol through BOTH frameworks on this host's CPU
and reports the measured ratio.  That does not produce an A100 number,
but it pins the *framework-and-graph* cost ratio on identical hardware,
which is the part of the estimate that was previously a guess.

Protocol (identical on both arms, fp32, CPU):
  - net: flagship NewBP NAFNet (img_channel 3, width 32, enc [2,2,4,8],
    middle 12, dec [2,2,2,2])
      reference: ``NewBP_model/newbp_net_arch.py:31-87`` executed in
      place (read-only) from ``$LLIE_REFERENCE_ROOT``.
  - loss: HybridLossPlus with l1_raw + perceptual(VGG19) + physics(P2
    mono PSF).  DeltaE00/SSIM are OFF on both arms because the reference
    disables them without kornia (``NewBP_model/losses.py:252-263``) and
    kornia is not in this image.  The reference arm's VGG19 is patched to
    random init (``weights=None``) since torchvision checkpoints cannot
    be downloaded here; weight *values* do not change step cost.
  - step: zero_grad -> forward -> loss -> backward -> Adam step
    (reference ``lowlight_model.py:119-140`` wiring), N steady-state
    steps after warmup, batch 1 at --size (default 128: CPU-feasible).

Usage:
  python tools/measure_baseline_cpu.py                # orchestrate both arms
  python tools/measure_baseline_cpu.py --arm torch    # one arm (JSON on stdout)
  python tools/measure_baseline_cpu.py --arm jax
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_ROOT = os.environ.get("LLIE_REFERENCE_ROOT", "/root/reference")

FLAGSHIP = dict(width=32, enc_blk_nums=(2, 2, 4, 8), middle_blk_num=12,
                dec_blk_nums=(2, 2, 2, 2))


def _timed_steps(step_fn, warmup: int, iters: int) -> float:
    for _ in range(warmup):
        step_fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        step_fn()
    return (time.perf_counter() - t0) / iters * 1e3


def run_torch_arm(size: int, iters: int, warmup: int, threads: int) -> dict:
    import importlib.util
    import types

    import numpy as np
    import torch

    torch.set_num_threads(threads)

    # torchvision is not in this image; the reference's PerceptualLoss
    # needs ``torchvision.models.vgg19(...).features``.  Reconstruct that
    # exact module layout in plain torch (the same approach as
    # tests/test_perceptual_torch_parity.py) at random init — weight
    # values do not affect step cost; graph/shape is identical.
    def _vgg19_features() -> torch.nn.Sequential:
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers: list = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=True))
                in_ch = v
        return torch.nn.Sequential(*layers)

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda *a, **k: types.SimpleNamespace(
        features=_vgg19_features())
    tvm.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = tvm
    tvu = types.ModuleType("torchvision.utils")

    def _no_tv(*a, **k):  # pragma: no cover - never hit in this protocol
        raise RuntimeError("torchvision stub: only models.vgg19 exists")

    tvu.make_grid = _no_tv
    tv.utils = tvu
    tv.__path__ = []  # mark as package so submodule imports resolve
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    sys.modules.setdefault("torchvision.utils", tvu)

    # Load the reference modules standalone (same stubbed-package approach
    # as tests/test_torch_parity.py — the basicsr package __init__ drags
    # lmdb/cv2 which are absent here).
    for name in ("basicsr", "basicsr.models", "basicsr.models.archs",
                 "basicsr.utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["basicsr.utils"].get_root_logger = (
        lambda *a, **k: __import__("logging").getLogger("stub"))

    def _load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    arch_dir = os.path.join(REFERENCE_ROOT,
                            "NAFNet_base/basicsr/models/archs")
    _load(os.path.join(arch_dir, "arch_util.py"),
          "basicsr.models.archs.arch_util")
    _load(os.path.join(arch_dir, "local_arch.py"),
          "basicsr.models.archs.local_arch")
    arch = _load(os.path.join(arch_dir, "NAFNet_arch.py"),
                 "basicsr.models.archs.NAFNet_arch")
    newbp_dir = os.path.join(REFERENCE_ROOT, "NewBP_model")
    layer = _load(os.path.join(newbp_dir, "newbp_layer.py"),
                  "ref_newbp_layer")
    ref_losses = _load(os.path.join(newbp_dir, "losses.py"), "ref_losses")

    def create_crosstalk_psf(mode, spec):
        # reference newbp_net_arch.py:88-99 delegates exactly this way
        return layer.CrosstalkPSF(mode=mode,
                                  kernels=layer.build_psf_kernels(mode, spec))

    # reference create_newbp_net (newbp_net_arch.py:31-87) is
    # NAFNet(**config) with no input-side K — construct it directly.
    net = arch.NAFNet(img_channel=3, width=FLAGSHIP["width"],
                      enc_blk_nums=list(FLAGSHIP["enc_blk_nums"]),
                      middle_blk_num=FLAGSHIP["middle_blk_num"],
                      dec_blk_nums=list(FLAGSHIP["dec_blk_nums"]))
    net.train()
    loss = ref_losses.HybridLossPlus(
        device="cpu", use_deltaE=False, use_ssim=False,
        physics_psf_module=create_crosstalk_psf("mono", "P2"),
    )
    opt = torch.optim.Adam(net.parameters(), lr=5e-4)

    rng = np.random.default_rng(0)
    short = torch.from_numpy(
        rng.uniform(0, 0.2, (1, 3, size, size)).astype(np.float32))
    ratio = torch.full((1,), 5.0)
    lq = (short * ratio.view(-1, 1, 1, 1)).clamp(0, 1)
    gt = (lq + 0.02).clamp(0, 1)

    def step():
        opt.zero_grad(set_to_none=True)
        out = net(lq)
        total, _ = loss(
            Bhat_raw=out, B_raw=gt, A_raw=short, expo_ratio=ratio,
            Bhat_srgb01=out, B_srgb01=gt, A_srgb01=short,
        )
        total.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 0.01)
        opt.step()

    ms = _timed_steps(step, warmup, iters)
    return {"arm": "torch_reference", "ms_per_step": ms,
            "torch_threads": threads}


def run_jax_arm(size: int, iters: int, warmup: int) -> dict:
    # The hosted TPU plugin ignores a plain JAX_PLATFORMS=cpu; forcing
    # CPU needs all three (see tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    import jax.numpy as jnp

    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import create_newbp_net
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state, make_optimizer, make_schedule, make_train_step,
    )

    net = create_newbp_net(nafnet_params=dict(img_channel=3, **FLAGSHIP),
                           dtype=jnp.float32)
    loss = HybridLossPlus(use_perc=True, use_deltaE=False, use_ssim=False,
                          perc_dtype=jnp.float32,
                          physics_psf_module=create_crosstalk_psf("mono",
                                                                  "P2"))
    tx = make_optimizer(make_schedule(
        {"type": "TrueCosineAnnealingLR", "T_max": 300000,
         "eta_min": 1e-6}, base_lr=5e-4))
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), loss=loss)
    step = make_train_step(net, loss, tx, donate=False)

    rng = np.random.default_rng(0)
    short = rng.uniform(0, 0.2, (1, size, size, 3)).astype(np.float32)
    ratio = np.full((1,), 5.0, np.float32)
    lq = np.clip(short * ratio[:, None, None, None], 0, 1)
    gt = np.clip(lq + 0.02, 0, 1)
    batch = {
        "lq": jnp.asarray(lq), "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short), "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short),
        "expo_ratio": jnp.asarray(ratio),
    }

    holder = {"state": state}

    def step_once():
        holder["state"], logs = step(holder["state"], batch)
        jax.block_until_ready(logs["l_total"])

    ms = _timed_steps(step_once, warmup, iters)
    return {"arm": "jax_cpu", "ms_per_step": ms,
            "backend": jax.default_backend()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["torch", "jax"], default=None)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = torch default)")
    ap.add_argument("--out", default="baseline_cpu_measurement.json")
    args = ap.parse_args()

    if args.arm == "torch":
        import torch
        threads = args.threads or torch.get_num_threads()
        print(json.dumps(run_torch_arm(args.size, args.iters, args.warmup,
                                       threads)))
        return
    if args.arm == "jax":
        print(json.dumps(run_jax_arm(args.size, args.iters, args.warmup)))
        return

    # Orchestrate: each arm in its own subprocess so the frameworks never
    # share an interpreter (allocator/thread-pool interference).
    results = {}
    for arm in ("torch", "jax"):
        env = dict(os.environ)
        if arm == "jax":
            env["JAX_PLATFORMS"] = "cpu"
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
               "--size", str(args.size), "--iters", str(args.iters),
               "--warmup", str(args.warmup), "--threads", str(args.threads)]
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"{arm} arm failed (rc={proc.returncode})")
        results[arm] = json.loads(proc.stdout.strip().splitlines()[-1])

    ratio = (results["torch"]["ms_per_step"]
             / results["jax"]["ms_per_step"])
    report = {
        "protocol": {
            "shape": [1, args.size, args.size, 3],
            "recipe": "l1_raw + perceptual(VGG19 random-init) + phys(P2 "
                      "mono); deltaE/ssim off (reference disables them "
                      "without kornia)",
            "steps": args.iters, "warmup": args.warmup,
            "host": "same-machine CPU, fp32 both arms",
        },
        "torch_reference_ms_per_step": results["torch"]["ms_per_step"],
        "jax_cpu_ms_per_step": results["jax"]["ms_per_step"],
        "torch_over_jax_ratio": ratio,
        "note": (
            "Same-graph, same-host framework cost ratio. This calibrates "
            "the previously unmeasured part of BASELINE.md's 8.0 steps/s "
            "A100 estimate: if torch-CPU and jax-CPU are within ~2x of "
            "each other, framework overhead does not dominate and the "
            "estimate (built from published A100 NAFNet throughput "
            "scaling) stands as the hardware-scaled denominator."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
