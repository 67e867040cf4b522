"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: SID 512x512 training steps/sec/chip (batch 2, bf16, the FULL
reference training recipe — L1(raw) + VGG19 perceptual + DeltaE00 +
physics PSF term, ``configs/colab/sid_newbp_mono.yml:65-96``), plus
inference ms/image at 1x3x256x256 (the reference latency protocol,
``metrics/inference_time.py:16-75``) in the ``detail`` field.

**Deadline contract.** The whole run operates under a hard wall-clock
budget (``$LLIE_BENCH_DEADLINE_S``, default 780 s — well inside the
driver's kill window). A watchdog thread guarantees the single JSON line
is printed even if a measurement hangs (dead tunnel mid-run, cold
compile overrun): at the deadline it emits whatever has been measured so
far — with the most recent recorded on-chip result attached under
``detail.last_measured`` — and exits 0. The headline full-recipe step is
measured FIRST so a partial emit still carries the most important
number. Optional variants (no-perceptual step, the s2d NAFNetTPU
variant, multi-chip data parallel) run only with ``$LLIE_BENCH_EXTRAS=1``
and only inside the remaining budget.

The perceptual term runs the full VGG19 relu5_4 trunk with the
deterministic random-init weights (no pretrained npz ships in this
environment — no egress). VGG's step-time COST does not depend on weight
values, so this measures the true full-recipe step time; quality-wise the
random trunk changes the objective (documented in BASELINE.md).

``vs_baseline``: the reference publishes NO numbers (see BASELINE.md); the
denominator used here is the documented ESTIMATE of the reference PyTorch
recipe on A100 (batch-2 512^2 NAFNet-w32 AMP ~= 8 steps/s) recorded in
BASELINE.md's north-star discussion. The framework-cost half of that
estimate is measured (``tools/measure_baseline_cpu.py`` ->
``baseline_cpu_calibration.json``): the identical step graph runs 3.16x
FASTER under the reference's torch stack than under XLA on this host's
CPU, i.e. the torch reference is not framework-handicapped and the 8.0
denominator is conservative in the reference's favour. MFU/FLOPs in
``detail`` are the directly falsifiable hardware numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import jax

if os.environ.get("LLIE_BENCH_FORCE_CPU"):
    # Hermetic smoke only (the plain JAX_PLATFORMS env var is ignored by
    # the hosted tunnel plugin; this in-process update is honored, and
    # the train-probe subprocesses inherit the env var).
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

A100_REFERENCE_STEPS_PER_SEC_ESTIMATE = 8.0

# ---------------------------------------------------------------------------
# Hard wall-clock budget. The driver kills bench.py after an (unpublished)
# timeout — round 4's run died at rc=124 with no JSON line. Everything below
# consults _remaining(); the watchdog is the backstop for hangs.
# ---------------------------------------------------------------------------
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("LLIE_BENCH_DEADLINE_S", "780"))


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


# Indirection for tests: the watchdog's hard-exit (os._exit semantics).
_EXIT = os._exit

# Measurement subprocesses currently in flight — the watchdog kills these
# before exiting so a deadline doesn't orphan a child that keeps burning
# the host CPU (or holding the TPU) after the parent is gone.
_ACTIVE_CHILDREN: set = set()


def _run_child(cmd, timeout):
    """subprocess.run equivalent that registers the child for the
    watchdog's cleanup. On timeout the child is killed and whatever it
    already printed is RETURNED (rc -9) instead of raised away — probes
    print their headline line (``TRAIN_S``) as soon as it is measured,
    so a child cut off during its optional post-work (the device-time
    trace) still delivers the measurement."""
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
    _ACTIVE_CHILDREN.add(p)
    try:
        out, err = p.communicate(timeout=timeout)
        rc = p.returncode
    except subprocess.TimeoutExpired:
        p.kill()
        out, err = p.communicate()
        rc = -9
    finally:
        _ACTIVE_CHILDREN.discard(p)
    return subprocess.CompletedProcess(cmd, rc, out or "", err or "")


_EMIT_LOCK = threading.Lock()
_EMITTED = False
# Incrementally-updated result snapshot: whatever is in here when the
# deadline fires is what gets printed. Stages below update it in place.
_RESULT: dict = {}


def _emit() -> None:
    """Print the single JSON line exactly once (thread-safe)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(_RESULT), flush=True)


def _start_watchdog() -> None:
    def _watch():
        delay = _remaining()
        if delay > 0:
            time.sleep(delay)
        if not _EMITTED:
            _RESULT.setdefault("detail", {})["deadline_note"] = (
                f"wall-clock budget of {_BUDGET_S:.0f}s reached; emitting "
                "partial results (stages measured so far are present, "
                "later stages were skipped or cut off)"
            )
            _emit()
            for p in list(_ACTIVE_CHILDREN):
                try:
                    p.kill()
                except Exception:
                    pass
            # A hung backend call cannot be interrupted — hard-exit so the
            # driver records the line instead of killing us at rc=124.
            _EXIT(0)

    t = threading.Thread(target=_watch, daemon=True, name="bench-deadline")
    t.start()


# Peak dense-matmul throughput (bf16 FLOP/s) by TPU device kind, for MFU.
# Sources: public TPU system specs (v5e 197, v4 275, v5p 459, v6e 918
# TFLOP/s bf16 per chip).
_TPU_PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _device_peak_flops() -> float | None:
    kind = getattr(jax.devices()[0], "device_kind", str(jax.devices()[0]))
    # longest matching key wins ("TPU v5 lite" before "TPU v5")
    best = None
    for k, v in _TPU_PEAK_BF16_FLOPS.items():
        if k in str(kind) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else None


def _model_flops_inprocess(mode: str) -> float | None:
    """MODEL FLOPs of one optimizer step via XLA cost analysis of the
    pure-XLA (unfused) graph (SURVEY C42's TPU contract:
    ``metrics/flops_utils.py`` / ``jit(...).lower(...).cost_analysis()``).

    MUST run on the CPU backend: pre-compile ``lower().cost_analysis()``
    returns None on the hosted TPU plugin (measured), and compiling the
    unfused graph just to count it would cost minutes of budget — so
    ``main()`` invokes this through a forced-CPU ``--flops-probe`` child.

    The unfused graph is used on purpose: (a) Pallas custom calls report
    zero FLOPs to cost analysis, so counting the fused graph undercounts;
    (b) the fused kernels' recompute-based backward EXECUTES more FLOPs
    than the model math — MFU by convention uses model FLOPs (the math as
    defined), not hardware FLOPs, so the unfused count is the honest
    numerator. Fused/unfused math parity is exact-tested
    (tests/test_fused_nafblock.py, tests/test_flat_trunk.py).

    Everything is shape-abstract (``jax.eval_shape`` state, abstract
    batch): only tracing + HLO cost analysis run, no compile, no device.
    ``mode``: "perc" | "noperc" | "s2d".
    """
    try:
        from lowlight_image_enhancement_tpu.losses import HybridLossPlus
        from lowlight_image_enhancement_tpu.models import (
            create_newbp_net,
            define_network,
        )
        from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
        from lowlight_image_enhancement_tpu.training import (
            create_train_state,
            make_train_step,
        )

        if mode == "s2d":
            net = define_network({
                "type": "NAFNetTPU", "width": 32,
                "enc_blk_nums": (2, 2, 4, 8), "middle_blk_num": 12,
                "dec_blk_nums": (2, 2, 2, 2), "dtype": jnp.bfloat16,
            })
        else:
            net = create_newbp_net(
                nafnet_params=dict(NAFNET_PARAMS, fused_blocks=False,
                                   flat_trunk=False),
                dtype=jnp.bfloat16)
        loss = HybridLossPlus(
            use_perc=mode == "perc", use_deltaE=True, use_ssim=False,
            perc_dtype=jnp.bfloat16,
            physics_psf_module=create_crosstalk_psf("mono", "P2"))
        tx = make_optimizer_for_flops()
        state = jax.eval_shape(lambda: create_train_state(
            net, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            loss=loss))
        batch = jax.eval_shape(_flagship_batch)
        step = make_train_step(net, loss, tx, donate=False)
        return _lowered_flops(step, state, batch)
    except Exception as e:
        print(f"bench: model-FLOPs count failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return None


_FLOPS_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_flops_cache.json")


def _flops_cache_key() -> str | None:
    """Model FLOPs depend only on the source revision (shapes are fixed
    by the protocol) — cache them per clean git HEAD so the default
    bench run doesn't re-pay the ~3 min CPU tracing every time. A dirty
    tree disables the cache (None)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        # key on the committed TREE of what determines the step graph
        # (the package + this file) so doc-only commits keep the cache;
        # dirty check scoped the same way — the driver keeps
        # PROGRESS.jsonl perpetually modified, which must not defeat it
        key = subprocess.run(
            ["git", "rev-parse", "HEAD:lowlight_image_enhancement_tpu",
             "HEAD:bench.py"],
            capture_output=True, text=True, cwd=repo, timeout=10)
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "-uno", "--",
             "lowlight_image_enhancement_tpu", "bench.py"],
            capture_output=True, text=True, cwd=repo, timeout=10)
        if key.returncode != 0 or dirty.returncode != 0:
            return None
        if dirty.stdout.strip():
            return None
        return ":".join(key.stdout.split())
    except Exception:
        return None


def measure_flops(mode: str) -> float | None:
    """Model FLOPs/step for ``mode``, counted in a forced-CPU child (see
    _model_flops_inprocess for why CPU); cached per clean git revision."""
    if os.environ.get("LLIE_BENCH_SIDE"):
        return None  # smoke shapes: counts would be wrong AND cached
    key = _flops_cache_key()
    if key:
        try:
            with open(_FLOPS_CACHE_PATH) as f:
                cache = json.load(f)
            if cache.get("rev") == key and mode in cache.get("flops", {}):
                return cache["flops"][mode]
        except Exception:
            pass
    flops = _measure_flops_child(mode)
    if key and flops:
        try:
            cache = {"rev": None, "flops": {}}
            try:
                with open(_FLOPS_CACHE_PATH) as f:
                    cache = json.load(f)
            except Exception:
                pass
            if cache.get("rev") != key:
                cache = {"rev": key, "flops": {}}
            cache["flops"][mode] = flops
            with open(_FLOPS_CACHE_PATH, "w") as f:
                json.dump(cache, f)
        except Exception:
            pass
    return flops


def _measure_flops_child(mode: str) -> float | None:
    try:
        p = _run_child(
            [sys.executable, os.path.abspath(__file__),
             "--flops-probe", mode],
            timeout=max(30.0, min(300.0, _remaining() - 45.0)),
        )
        for ln in p.stdout.splitlines():
            if ln.startswith("FLOPS "):
                v = float(ln.split()[1])
                return v if v > 0 else None
        print(f"bench: flops probe [{mode}] produced no result "
              f"(rc={p.returncode}); tail: "
              + (p.stdout + p.stderr)[-400:], file=sys.stderr)
    except Exception as e:
        print(f"bench: flops probe [{mode}] failed ({e})", file=sys.stderr)
    return None


def _lowered_flops(step, state, batch) -> float | None:
    """flops from cost_analysis of ``step`` lowered at abstract
    state/batch, with Pallas dispatch disabled during tracing so any
    "auto" fusion inside the model resolves to the countable XLA graph."""
    prev = os.environ.get("LLIE_DISABLE_PALLAS")
    os.environ["LLIE_DISABLE_PALLAS"] = "1"
    try:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            (state, batch))
        ca = jax.jit(step).lower(*abstract).cost_analysis()
    finally:
        if prev is None:
            os.environ.pop("LLIE_DISABLE_PALLAS", None)
        else:
            os.environ["LLIE_DISABLE_PALLAS"] = prev
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float((ca or {}).get("flops", 0.0))
    return flops if flops > 0 else None


def make_optimizer_for_flops():
    from lowlight_image_enhancement_tpu.training import (
        make_optimizer, make_schedule,
    )

    return make_optimizer(make_schedule(
        {"type": "TrueCosineAnnealingLR", "T_max": 300000, "eta_min": 1e-6},
        base_lr=5e-4,
    ))

NAFNET_PARAMS = dict(
    img_channel=3,
    width=32,
    enc_blk_nums=(2, 2, 4, 8),
    middle_blk_num=12,
    dec_blk_nums=(2, 2, 2, 2),
)


def _flagship_batch():
    """The fixed synthetic 512^2 batch-2 measurement batch.

    ``LLIE_BENCH_SIDE`` overrides the side length (hermetic smoke tests
    only — recorded numbers use the default 512)."""
    rng = np.random.default_rng(0)
    n, s = 2, int(os.environ.get("LLIE_BENCH_SIDE", "512"))
    short_raw = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
    ratio = np.full((n,), 5.0, np.float32)
    lq = np.clip(short_raw * ratio[:, None, None, None], 0, 1).astype(
        np.float32)
    gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
    return {
        "lq": jnp.asarray(lq),
        "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short_raw),
        "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short_raw),
        "expo_ratio": jnp.asarray(ratio),
    }


def measure_train_inprocess(use_perc: bool, runs: int = 20,
                            announce=None):
    """(wall seconds/step, device ms/step or None) for the recipe
    with/without the perceptual term. ``announce(seconds)`` fires as
    soon as the wall measurement exists, BEFORE the optional device
    trace — the probe protocol prints its headline through this so a
    deadline-killed child still delivers it.

    Two independent measurement rounds; report the SLOWER one. The
    hosted tunnel occasionally mis-serializes a burst (observed once:
    7.5 ms "steps" for a 31 ms graph) — a too-fast round is an
    artifact, a too-slow one is just noise, so max(time) is honest.
    """
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import create_newbp_net
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_schedule,
        make_train_step,
    )

    net = create_newbp_net(nafnet_params=NAFNET_PARAMS, dtype=jnp.bfloat16)
    tx = make_optimizer(make_schedule(
        {"type": "TrueCosineAnnealingLR", "T_max": 300000, "eta_min": 1e-6},
        base_lr=5e-4,
    ))
    loss = HybridLossPlus(
        use_perc=use_perc,
        use_deltaE=True,
        use_ssim=False,
        perc_dtype=jnp.bfloat16,   # AMP recipe: VGG in autocast dtype
        physics_psf_module=create_crosstalk_psf("mono", "P2"),
    )
    state = create_train_state(
        net, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        loss=loss,
    )
    step = make_train_step(net, loss, tx, donate=True)
    batch = _flagship_batch()
    for _ in range(3):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    round_s = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(runs):
            state, logs = step(state, batch)
        jax.block_until_ready(logs["l_total"])
        round_s.append((time.perf_counter() - t0) / runs)
    s = max(round_s)
    if announce is not None:
        announce(s)
    return s, _device_time_ms(step, state, batch)


def _device_time_ms(step, state, batch, n: int = 5):
    """ms/step of DEVICE time from an xprof trace of n steps — the
    honest hardware number: wall time over the hosted tunnel runs
    ~7 ms/step slower than device time (BASELINE.md methodology note).
    Best-effort: returns None rather than jeopardize the wall
    measurement."""
    try:
        from lowlight_image_enhancement_tpu.utils.profiling import (
            summarize_trace,
            trace,
        )

        if jax.devices()[0].platform == "cpu":
            return None  # trace summarizer keys on TPU device rows
        logdir = "/tmp/bench_step_trace"
        with trace(logdir):
            for _ in range(n):
                state, logs = step(state, batch)
            jax.block_until_ready(logs["l_total"])
        fam = summarize_trace(logdir, top=10_000)
        ms = sum(fam.values()) / n
        return ms if ms > 0 else None
    except Exception as e:  # pragma: no cover — diagnostics only
        print(f"bench: device-time trace failed: {e}", file=sys.stderr)
        return None


def measure_train(use_perc: bool):
    """(wall seconds/step, device ms/step or None), measured in a FRESH
    subprocess.

    Same-process sequential measurements contaminate each other on this
    backend (observed: the no-perc step measuring ~50 ms instead of ~33
    after the full-recipe executable ran first — buffer-assignment /
    fragmentation pressure from the retired executables). A child
    process gives every measurement a clean device heap; the persistent
    compile cache keeps the re-compile cheap. Falls back to in-process
    measurement if the child fails for any reason. The subprocess
    timeout is bounded by the remaining wall budget (minus a margin for
    the fallback + emit) so a cold-compile overrun degrades to a partial
    emit instead of a driver-side kill.
    """
    mode = "perc" if use_perc else "noperc"
    child_timeout = max(30.0, _remaining() - 60.0)
    try:
        p = _run_child(
            [sys.executable, os.path.abspath(__file__),
             "--train-probe", mode],
            timeout=child_timeout,
        )
        s = dev = None
        for ln in p.stdout.splitlines():
            if ln.startswith("TRAIN_S "):
                s = float(ln.split()[1])
            elif ln.startswith("TRAIN_DEVICE_MS "):
                dev = float(ln.split()[1])
        if s is not None:
            return s, dev
        print(f"bench: train probe [{mode}] produced no result "
              f"(rc={p.returncode}); falling back to in-process. tail: "
              + (p.stdout + p.stderr)[-800:], file=sys.stderr)
    except Exception as e:
        print(f"bench: train probe [{mode}] failed ({e}); "
              "falling back to in-process", file=sys.stderr)
    return measure_train_inprocess(use_perc)


def _probe_backend(attempts: int = 3, timeout_s: float | None = None):
    """Bounded backend-reachability check (see utils/backend_probe.py):
    a dead tunnel hangs backend init, which would leave the driver's
    bench invocation wedged with no JSON line ever printed. The probe
    budget is capped by the remaining wall budget."""
    from lowlight_image_enhancement_tpu.utils.backend_probe import (
        probe_backend,
    )

    if timeout_s is None:
        timeout_s = min(240.0, max(20.0, _remaining() / 3.0 - 10.0))
    return probe_backend(attempts=attempts, timeout_s=timeout_s)


_LAST_GOOD_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_last_good.json")

# Transcribed from the 2026-08-17 pre-outage on-chip runs recorded in
# BASELINE.md ("Measured (TPU rebuild, round 3)") — used only when no
# bench_last_good.json artifact exists yet.
_PRE_OUTAGE_FALLBACK = {
    "value": 18.7,
    "vs_baseline": 2.34,
    "train_step_ms": 53.5,
    "train_step_ms_no_perc": 33.9,
    "measured_at": "2026-08-17",
    "source": "BASELINE.md round-3 section (pre-outage on-chip bench; "
              "transcribed, not a recorded bench_last_good.json)",
}


def _load_last_good():
    """Most recent SUCCESSFUL bench result (written by main() on every
    good run), falling back to the transcribed pre-outage numbers."""
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:
        return dict(_PRE_OUTAGE_FALLBACK)


def main() -> None:
    # Seed the result snapshot with the honest-failure record; every
    # measured stage below overwrites its piece. If nothing lands before
    # the deadline, this is what gets printed.
    _RESULT.update({
        "metric": "sid512_train_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "steps/s (batch 2, 512^2, bf16, FULL recipe incl. "
                "VGG19 perceptual)",
        "vs_baseline": 0.0,
        "detail": {
            "error": "no measurement completed before the wall budget",
            "last_measured": _load_last_good(),
        },
    })
    detail = _RESULT["detail"]
    _start_watchdog()

    if _probe_backend() is None:
        detail["error"] = (
            "no JAX backend reachable (TPU tunnel down?) — backend init "
            "hung past the probe timeout; measurement impossible this run")
        _emit()
        return

    peak = _device_peak_flops()

    def _mfu(flops, secs):
        """{flops_per_step, achieved_tflops, mfu_pct} (model FLOPs — see
        _model_flops_per_step) or None when uncountable."""
        if not flops or not secs:
            return None
        out = {
            "flops_per_step": round(flops),
            "achieved_tflops": round(flops / secs / 1e12, 2),
        }
        if peak:
            out["mfu_pct"] = round(100.0 * flops / secs / peak, 2)
        return out

    # --- STAGE 1 (headline, always first): FULL-recipe training step,
    # batch 2, 512x512, bf16, perceptual term included (random-init VGG
    # trunk — same FLOPs as pretrained), in a fresh subprocess.
    train_s, train_dev_ms = measure_train(use_perc=True)
    steps_per_sec = 1.0 / train_s
    _RESULT["value"] = round(steps_per_sec, 4)
    _RESULT["vs_baseline"] = round(
        steps_per_sec / A100_REFERENCE_STEPS_PER_SEC_ESTIMATE, 4)
    detail.pop("error", None)
    detail.pop("last_measured", None)
    detail["train_step_ms"] = round(train_s * 1e3, 3)
    if train_dev_ms:
        # device time from xprof — the honest hardware number (wall over
        # the hosted tunnel carries ~7 ms/step of host/dispatch drift)
        detail["train_step_ms_device"] = round(train_dev_ms, 3)
        detail["steps_per_sec_device"] = round(1e3 / train_dev_ms, 4)
        detail["vs_baseline_device"] = round(
            1e3 / train_dev_ms / A100_REFERENCE_STEPS_PER_SEC_ESTIMATE, 4)
    detail["peak_bf16_tflops"] = (peak / 1e12) if peak else None
    detail["device"] = str(jax.devices()[0])
    detail["baseline_note"] = (
        "reference publishes no numbers; vs_baseline uses the documented "
        f"A100 estimate of {A100_REFERENCE_STEPS_PER_SEC_ESTIMATE} steps/s")

    # Persist the headline IMMEDIATELY (not at exit): a later hang must
    # not erase this run's real on-chip record.
    _persist_last_good()

    # --- STAGE 1b: model FLOPs -> MFU for the headline. Instant when
    # the per-revision cache is seeded (the committed tree is the key),
    # ~3 min in a forced-CPU child otherwise — either way it runs BEFORE
    # the latency stage, whose cold compile can blow the remaining
    # budget on a fresh tunnel session.
    if _remaining() > 30.0:
        detail["mfu_full_recipe"] = _mfu(measure_flops("perc"), train_s)

    # --- STAGE 2: inference latency 1x256x256x3, reference protocol
    # (20 warmup + 100 timed). Runs are CHAINED (each input is the
    # previous output) so the measurement reflects true serial latency
    # even on backends that execute independent dispatches concurrently.
    if _remaining() > 60.0:
        try:
            from lowlight_image_enhancement_tpu.models import (
                create_newbp_net,
            )

            rng = np.random.default_rng(0)
            infer_net = create_newbp_net(nafnet_params=NAFNET_PARAMS,
                                         dtype=jnp.bfloat16)
            x = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)),
                            dtype=jnp.float32)
            variables = infer_net.init(jax.random.PRNGKey(0), x)
            fwd = jax.jit(
                lambda p, xx: jnp.clip(
                    infer_net.apply({"params": p}, xx), 0.0, 1.0)
            )
            y = x
            for _ in range(20):
                y = fwd(variables["params"], y)
            jax.block_until_ready(y)
            lat_rounds = []
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(100):
                    y = fwd(variables["params"], y)
                jax.block_until_ready(y)
                lat_rounds.append((time.perf_counter() - t0) * 1e3 / 100)
            detail["infer_ms_per_image_256"] = round(max(lat_rounds), 3)
            del variables, fwd, y
        except Exception as e:
            print(f"bench: latency stage failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # --- STAGE 3 (opt-in, $LLIE_BENCH_EXTRAS=1): variants. Each checks
    # the remaining budget; the emit below happens regardless.
    if os.environ.get("LLIE_BENCH_EXTRAS") == "1":
        _measure_extras(detail, _mfu)

    _emit()


def _measure_extras(detail: dict, _mfu) -> None:
    """Opt-in variant measurements: no-perceptual recipe, the
    space-to-depth NAFNetTPU variant, multi-chip data parallel."""
    import gc

    runs = 20
    batch = _flagship_batch()

    if _remaining() > 120.0:
        try:
            train_s_noperc, dev_noperc = measure_train(use_perc=False)
            detail["train_step_ms_no_perc"] = round(train_s_noperc * 1e3, 3)
            if dev_noperc:
                detail["train_step_ms_no_perc_device"] = round(dev_noperc, 3)
            detail["steps_per_sec_no_perc"] = round(1.0 / train_s_noperc, 4)
            if _remaining() > 90.0:
                detail["mfu_no_perc"] = _mfu(measure_flops("noperc"),
                                             train_s_noperc)
        except Exception as e:
            print(f"bench: no-perc stage failed: {e}", file=sys.stderr)

    # the space-to-depth TPU-layout variant (same protocol,
    # capacity-matched params; see BASELINE.md)
    if _remaining() > 120.0:
        try:
            from lowlight_image_enhancement_tpu.losses import HybridLossPlus
            from lowlight_image_enhancement_tpu.models import define_network
            from lowlight_image_enhancement_tpu.ops.psf import (
                create_crosstalk_psf,
            )
            from lowlight_image_enhancement_tpu.training import (
                create_train_state,
                make_train_step,
            )

            gc.collect()
            loss = HybridLossPlus(
                use_perc=False, use_deltaE=True, use_ssim=False,
                physics_psf_module=create_crosstalk_psf("mono", "P2"),
            )
            tx = make_optimizer_for_flops()
            s2d_net = define_network({
                "type": "NAFNetTPU", "width": 32,
                "enc_blk_nums": (2, 2, 4, 8), "middle_blk_num": 12,
                "dec_blk_nums": (2, 2, 2, 2), "dtype": jnp.bfloat16,
            })
            s2d_state = create_train_state(
                s2d_net, tx, jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3)), loss=loss,
            )
            s2d_step = make_train_step(s2d_net, loss, tx, donate=True)
            for _ in range(3):
                s2d_state, s2d_logs = s2d_step(s2d_state, batch)
            jax.block_until_ready(s2d_logs["l_total"])
            t0 = time.perf_counter()
            for _ in range(runs):
                s2d_state, s2d_logs = s2d_step(s2d_state, batch)
            jax.block_until_ready(s2d_logs["l_total"])
            sps = runs / (time.perf_counter() - t0)
            detail["nafnet_tpu_s2d_steps_per_sec_no_perc"] = round(sps, 4)
            if _remaining() > 90.0:
                detail["mfu_s2d_no_perc"] = _mfu(measure_flops("s2d"),
                                                 1.0 / sps)
        except Exception as e:
            print(f"bench: s2d variant failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # data-parallel scaling over all visible chips. Only meaningful on
    # real multi-chip hosts; on the single-chip tunnel this is skipped.
    if _remaining() > 120.0 and len(jax.devices()) > 1:
        try:
            from lowlight_image_enhancement_tpu.losses import HybridLossPlus
            from lowlight_image_enhancement_tpu.models import (
                create_newbp_net,
            )
            from lowlight_image_enhancement_tpu.ops.psf import (
                create_crosstalk_psf,
            )
            from lowlight_image_enhancement_tpu.parallel import (
                create_mesh,
                shard_batch,
            )
            from lowlight_image_enhancement_tpu.training import (
                create_train_state,
                make_train_step,
                put_replicated,
            )

            ndev = len(jax.devices())
            net = create_newbp_net(nafnet_params=NAFNET_PARAMS,
                                   dtype=jnp.bfloat16)
            loss = HybridLossPlus(
                use_perc=False, use_deltaE=True, use_ssim=False,
                physics_psf_module=create_crosstalk_psf("mono", "P2"),
            )
            tx = make_optimizer_for_flops()
            mesh = create_mesh(ndev)
            big = {
                k: jnp.concatenate([v] * ndev, axis=0)
                for k, v in batch.items()
            }
            dp_state = create_train_state(
                net, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                loss=loss,
            )
            dp_state = put_replicated(dp_state, mesh)
            sbatch = shard_batch(big, mesh)
            dp_step = make_train_step(net, loss, tx, donate=True)
            for _ in range(3):
                dp_state, dp_logs = dp_step(dp_state, sbatch)
            jax.block_until_ready(dp_logs["l_total"])
            t0 = time.perf_counter()
            for _ in range(runs):
                dp_state, dp_logs = dp_step(dp_state, sbatch)
            jax.block_until_ready(dp_logs["l_total"])
            dp_sps = runs / (time.perf_counter() - t0)
            detail["data_parallel"] = {
                "n_devices": ndev,
                "global_batch": 2 * ndev,
                "steps_per_sec": round(dp_sps, 4),
                "images_per_sec": round(dp_sps * 2 * ndev, 2),
            }
        except Exception as e:
            import traceback

            traceback.print_exc(file=sys.stderr)
            detail["data_parallel"] = {"error": f"{type(e).__name__}: {e}"}


def _persist_last_good() -> None:
    """Persist the current headline for the dead-tunnel path of future
    runs (best-effort; never jeopardize the printed contract). Smoke
    configurations must not overwrite a real on-chip record."""
    if (os.environ.get("LLIE_BENCH_FORCE_CPU")
            or os.environ.get("LLIE_BENCH_SIDE")):
        return
    if not _RESULT.get("value"):
        return
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump({
                "value": _RESULT["value"],
                "vs_baseline": _RESULT["vs_baseline"],
                "train_step_ms": _RESULT["detail"].get("train_step_ms"),
                "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
                "device": _RESULT["detail"].get("device"),
                "source": "previous successful bench.py run",
            }, f)
            f.write("\n")
    except Exception as e:
        print(f"bench: could not persist last-good record: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--train-probe":
        s, dev_ms = measure_train_inprocess(
            use_perc=sys.argv[2] == "perc",
            announce=lambda sec: print(f"TRAIN_S {sec:.9f}", flush=True))
        if dev_ms:
            print(f"TRAIN_DEVICE_MS {dev_ms:.6f}", flush=True)
    elif len(sys.argv) >= 3 and sys.argv[1] == "--flops-probe":
        # Forced CPU: pre-compile cost analysis works there and nothing
        # device-side is needed (all tracing is shape-abstract).
        jax.config.update("jax_platforms", "cpu")
        flops = _model_flops_inprocess(sys.argv[2])
        print(f"FLOPS {flops if flops else 0:.1f}", flush=True)
    else:
        main()
