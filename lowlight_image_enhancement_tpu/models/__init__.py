"""Architecture registry + factory (reference ``archs/__init__.py:12-59``).

``define_network(opt)`` instantiates a registered architecture from a config
dict whose ``type:`` key names the class/factory. Architecture modules are
imported eagerly here (the reference uses a directory scan; the explicit
import list keeps tree-shaking and typo-surfacing simple).
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

from lowlight_image_enhancement_tpu.models import nafnet as _nafnet  # noqa: F401
from lowlight_image_enhancement_tpu.models import newbp as _newbp  # noqa: F401
from lowlight_image_enhancement_tpu.models.nafnet import (  # noqa: F401
    LayerNorm2d,
    NAFBlock,
    NAFNet,
    SimpleGate,
    pixel_shuffle,
    simple_gate,
)
from lowlight_image_enhancement_tpu.models.newbp import (  # noqa: F401
    create_crosstalk_psf,
    create_newbp_net,
)
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

# Optional architectures import lazily at the bottom (UNet/SwinIR/Baseline);
# import errors there should not break the core package.
try:  # noqa: SIM105
    from lowlight_image_enhancement_tpu.models import unet as _unet  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from lowlight_image_enhancement_tpu.models import swinir as _swinir  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from lowlight_image_enhancement_tpu.models import baseline as _baseline  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from lowlight_image_enhancement_tpu.models import nafssr as _nafssr  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:  # noqa: SIM105
    from lowlight_image_enhancement_tpu.models import nafnet_tpu as _nafnet_tpu  # noqa: F401
except ImportError:  # pragma: no cover
    pass


def define_network(opt: Mapping[str, Any]):
    """Instantiate an architecture from ``{'type': Name, **kwargs}``."""
    opt = copy.deepcopy(dict(opt))
    network_type = opt.pop("type")
    cls = ARCH_REGISTRY.get(network_type)
    return cls(**opt)
