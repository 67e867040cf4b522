"""Training-trajectory parity vs the reference torch stack.

Drives ``tools/parity_train_ab.py``: N AdamW steps of the weight-free
recipe subset (L1 raw + phys_srgb mono-P2) on the reference torch
NAFNet/CrosstalkPSF (executed in place) and on this framework's jitted
train step, from identical converted weights and identical data. A
matching trajectory composes every backward, the grad-clip-0.01 + AdamW
semantics, and the batch wiring into one end-to-end check — the training
analogue of tests/test_torch_parity.py's forward parity.

Measured on this host: max relative loss diff ~4e-6 over 12 steps, final
params within 2e-7 (parity_train_ab.json). The asserts below are ~100x
looser to absorb platform float drift.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # compile + torch: full-tier only

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_train_ab  # noqa: E402


@pytest.mark.skipif(not parity_train_ab.reference_available(),
                    reason="reference checkout not available")
def test_training_trajectory_matches_reference():
    pytest.importorskip("torch")
    report = parity_train_ab.run_parity(steps=6, side=32)
    assert report["torch_loss_decreased"] and report["jax_loss_decreased"]
    assert report["max_rel_loss_diff"] < 5e-4, report
    assert report["final_param_max_abs_diff"] < 2e-5, report
