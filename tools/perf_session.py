#!/usr/bin/env python
"""One-shot perf measurement session for the flagship train step.

Runs, each in its own subprocess (the fused-kernel ablation knobs are
read at trace time, so every configuration needs a fresh process):

1. ``bench.py``                         — headline (full recipe + no-perc)
2. no-perc step with each ``LLIE_NAFBLOCK_ABLATE`` knob — attributes the
   fused backward's cost (tap grads / adjoint / dwconv recompute /
   weight grads) by subtraction
3. ``profile_step_families.py --perc``  — per-op-family device time of
   the full-recipe step (where the VGG term goes)
4. ``train_pipeline_e2e.py``            — wall vs device vs host-only
   steps/s (round-2 VERDICT #3 input-pipeline demonstration)

Designed for the hosted tunnel: serial, bounded timeouts, everything
written incrementally to ``--out`` (default perf_session.json) so a
mid-session hang loses nothing. Run alone on this 1-core host.

Usage: python tools/perf_session.py [--skip bench,ablate,profile,pipeline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEP_SNIPPET = r"""
import os, sys, time, json
sys.path.insert(0, %(root)r)
import jax
jax.config.update("jax_compilation_cache_dir", %(root)r + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from lowlight_image_enhancement_tpu.losses import HybridLossPlus
from lowlight_image_enhancement_tpu.models import create_newbp_net
from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
from lowlight_image_enhancement_tpu.training import (
    create_train_state, make_optimizer, make_schedule, make_train_step)

net = create_newbp_net(nafnet_params=dict(
    img_channel=3, width=32, enc_blk_nums=(2, 2, 4, 8),
    middle_blk_num=12, dec_blk_nums=(2, 2, 2, 2)), dtype=jnp.bfloat16)
loss = HybridLossPlus(use_perc=False, use_deltaE=True, use_ssim=False,
                      physics_psf_module=create_crosstalk_psf("mono", "P2"))
tx = make_optimizer(make_schedule(
    {"type": "TrueCosineAnnealingLR", "T_max": 300000, "eta_min": 1e-6},
    base_lr=5e-4))
state = create_train_state(net, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), loss=loss)
step = make_train_step(net, loss, tx, donate=True)
rng = np.random.default_rng(0)
n, s = 2, 512
short_raw = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
ratio = np.full((n,), 5.0, np.float32)
lq = np.clip(short_raw * ratio[:, None, None, None], 0, 1).astype(np.float32)
gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
batch = {"lq": jnp.asarray(lq), "gt": jnp.asarray(gt),
         "short_raw": jnp.asarray(short_raw), "long_raw": jnp.asarray(gt),
         "short_obs": jnp.asarray(short_raw), "expo_ratio": jnp.asarray(ratio)}
for _ in range(3):
    state, logs = step(state, batch)
jax.block_until_ready(logs["l_total"])
rounds = []
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(20):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    rounds.append((time.perf_counter() - t0) / 20)
print("RESULT_MS " + json.dumps({
    "ablate": os.environ.get("LLIE_NAFBLOCK_ABLATE", ""),
    "ms": round(max(rounds) * 1000, 3),
    "rounds_ms": [round(r * 1000, 3) for r in rounds]}))
"""

ABLATIONS = [
    "",              # baseline for subtraction (same process protocol)
    "tapgrads",
    "adjoint",
    "dwrecompute",
    "p2wgrads",
    "p1wgrads",
    "tapgrads,adjoint",
]


def run(cmd, env_extra=None, timeout=1500):
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env, cwd=ROOT)
        out = p.stdout + p.stderr
        ok = p.returncode == 0
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace") if isinstance(
            e.stdout, bytes) else (e.stdout or "")) + "\nTIMEOUT"
        ok = False
    return ok, out, round(time.time() - t0, 1)


def save(report, path):
    with open(path, "w") as f:
        json.dump(report, f, indent=2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma list of: bench,ablate,profile")
    ap.add_argument("--out", default=os.path.join(ROOT, "perf_session.json"))
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args()
    skip = set(args.skip.split(","))
    report = {"started": time.strftime("%Y-%m-%d %H:%M:%S")}

    if "bench" not in skip:
        ok, out, dt = run([sys.executable, "bench.py"],
                          timeout=args.timeout * 2)
        line = next((ln for ln in out.splitlines()
                     if ln.startswith('{"metric"')), None)
        report["bench"] = {"ok": ok, "secs": dt,
                           "json": json.loads(line) if line else None,
                           "tail": out[-2000:] if not line else None}
        save(report, args.out)
        print(f"bench: ok={ok} {dt}s", flush=True)

    if "ablate" not in skip:
        report["ablate"] = []
        snippet = STEP_SNIPPET % {"root": ROOT}
        for knobs in ABLATIONS:
            ok, out, dt = run([sys.executable, "-c", snippet],
                              env_extra={"LLIE_NAFBLOCK_ABLATE": knobs},
                              timeout=args.timeout)
            line = next((ln for ln in out.splitlines()
                         if ln.startswith("RESULT_MS ")), None)
            entry = (json.loads(line[len("RESULT_MS "):]) if line
                     else {"ablate": knobs, "error": out[-1500:]})
            entry["secs"] = dt
            report["ablate"].append(entry)
            save(report, args.out)
            print(f"ablate[{knobs or 'none'}]: "
                  f"{entry.get('ms', 'FAIL')} ms ({dt}s)", flush=True)

    if "profile" not in skip:
        ok, out, dt = run(
            [sys.executable, "tools/profile_step_families.py", "--perc",
             "--top", "30"], timeout=args.timeout)
        report["profile_perc"] = {"ok": ok, "secs": dt, "out": out[-6000:]}
        save(report, args.out)
        print(f"profile(perc): ok={ok} {dt}s", flush=True)

    if "pipeline" not in skip:
        # Two pack codecs: zlib_band (disk-lean; host-measured 52.7
        # ms/batch on the 1-core tunnel host) and none (raw bands; 15.9
        # ms/batch — 3.3x, fast enough to keep the chip busy even on one
        # core). Both measured so the report shows which side bounds wall.
        for comp in ("none", "zlib_band"):
            pipe_json = os.path.join(ROOT, f"pipeline_e2e_{comp}.json")
            ok, out, dt = run(
                [sys.executable, "tools/train_pipeline_e2e.py",
                 "--steps", "100", "--workers", "2", "--comp", comp,
                 "--json", pipe_json], timeout=args.timeout)
            try:
                with open(pipe_json) as f:
                    pipe = json.load(f)
            except Exception:
                pipe = None
            report[f"pipeline_e2e_{comp}"] = {
                "ok": ok, "secs": dt, "json": pipe,
                "tail": None if pipe else out[-2500:]}
            save(report, args.out)
            print(f"pipeline_e2e[{comp}]: ok={ok} {dt}s", flush=True)

    print(json.dumps(report.get("bench", {}).get("json"), indent=None))


if __name__ == "__main__":
    main()
