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
        for knobs in ABLATIONS:
            # Reuse bench.py's canonical measurement protocol (fresh
            # process per config — the ablation knobs are read at trace
            # time; TRAIN_S is the slower of two 20-step rounds).
            ok, out, dt = run(
                [sys.executable, "bench.py", "--train-probe", "noperc"],
                env_extra={"LLIE_NAFBLOCK_ABLATE": knobs},
                timeout=args.timeout)
            line = next((ln for ln in out.splitlines()
                         if ln.startswith("TRAIN_S ")), None)
            entry = ({"ablate": knobs,
                      "ms": round(float(line.split()[1]) * 1000, 3)}
                     if line else {"ablate": knobs, "error": out[-1500:]})
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
