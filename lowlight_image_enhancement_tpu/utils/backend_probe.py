"""Bounded JAX-backend reachability probe.

A dead hosted-TPU tunnel makes backend init HANG (not raise), which
would wedge any caller that touches ``jax.devices()`` first — the
driver's bench invocation, or the multichip dryrun. Probing therefore
runs ``jax.devices()`` in a SUBPROCESS with a hard timeout; the parent
never initializes a backend itself. The timeout is generous because a
recovering tunnel can take minutes on the first contact after an
outage (see BASELINE.md environment notes).

Shared by ``bench.py`` and ``__graft_entry__.py`` so the timeout/retry
tuning and the force-CPU escape hatch live in one place.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

_PROBE_CODE = (
    "import os, jax\n"
    "if os.environ.get('LLIE_BENCH_FORCE_CPU'):\n"
    "    jax.config.update('jax_platforms', 'cpu')\n"
    "print(jax.devices()[0].platform, flush=True)\n"
)


def probe_backend(attempts: int = 3,
                  timeout_s: float = 240.0) -> Optional[str]:
    """Return the default backend's platform string, or None if backend
    init hangs/fails within ``attempts`` bounded tries.

    Honors ``$LLIE_BENCH_FORCE_CPU`` (smoke-test knob): the probe child
    then reports the CPU backend, same as the measurement children.
    ``$LLIE_PROBE_ATTEMPTS`` / ``$LLIE_PROBE_TIMEOUT_S`` override the
    caller's values — smoke tests use them to drive the dead-backend
    path in seconds instead of minutes.
    """
    attempts = int(os.environ.get("LLIE_PROBE_ATTEMPTS", attempts))
    timeout_s = float(os.environ.get("LLIE_PROBE_TIMEOUT_S", timeout_s))
    for _ in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if p.returncode == 0 and p.stdout.strip():
                return p.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            continue
    return None
