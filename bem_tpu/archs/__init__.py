"""Network architectures (ARCH_REGISTRY) — reference: basicsr/archs/."""

from typing import Any, Dict

from ..utils.registry import ARCH_REGISTRY
from . import unet_arch  # noqa: F401  (registers Network)
from . import decomp_archs  # noqa: F401  (Decomp* family)
from . import vmunet_archs  # noqa: F401  (VMUNet/TunedModel family)


def _listify(v):
    return tuple(v) if isinstance(v, list) else v


def build_network(opt: Dict[str, Any]):
    """Instantiate an arch from an Options-style dict (archs/__init__.py:18-24)."""
    opt = dict(opt)
    network_type = opt.pop("type")
    opt = {k: _listify(v) for k, v in opt.items()}
    return ARCH_REGISTRY.get(network_type)(**opt)
