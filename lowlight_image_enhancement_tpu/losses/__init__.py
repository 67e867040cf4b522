"""Loss stack: basic elementwise losses + composite NewBP hybrid losses.

``build_loss(opt)`` resolves ``{'type': Name, **kwargs}`` through
LOSS_REGISTRY (reference ``models/losses/__init__.py:20-49``).
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

from lowlight_image_enhancement_tpu.losses.basic import (  # noqa: F401
    CharbonnierLoss,
    L1Loss,
    MSELoss,
    PSNRLoss,
    charbonnier_loss,
    l1_loss,
    mse_loss,
    psnr_loss,
)
from lowlight_image_enhancement_tpu.losses.components import (  # noqa: F401
    DeltaE00Loss,
    PerceptualLoss,
    PhysicalConsistencyLossSRGB,
    PhysicsConsistencyLoss,
    SSIMLoss,
    align_exposure_srgb,
)
from lowlight_image_enhancement_tpu.losses.hybrid import (  # noqa: F401
    HybridLoss,
    HybridLossPlus,
    assert_finite_logs,
)
from lowlight_image_enhancement_tpu.utils.registry import LOSS_REGISTRY


def build_loss(opt: Mapping[str, Any]):
    """Instantiate a loss from ``{'type': Name, **kwargs}``."""
    opt = copy.deepcopy(dict(opt))
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt)
