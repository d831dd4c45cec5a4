"""Torch state_dict -> flax params conversion primitives.

Used to import the reference's released checkpoints (QD frozen decomps,
CG/IE nets) into the channels-last flax modules. Pure numpy — torch is only
needed to deserialize ``.pth`` files.

Layout rules (validated numerically):
- Conv2d weight OIHW -> HWIO: ``transpose(2, 3, 1, 0)``
- ConvTranspose2d weight (I, O, kh, kw) -> HWIO with both spatial axes
  flipped (jax.lax.conv_transpose keeps kernels unflipped)
- Linear weight (out, in) -> (in, out)
- LayerNorm/GroupNorm weight -> scale
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
from flax import traverse_util


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "params", "state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {k: v.detach().numpy() for k, v in obj.items()}


def assemble(mapping: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """'/'-joined flat paths -> nested flax params dict."""
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): np.asarray(v) for k, v in mapping.items()}
    )
