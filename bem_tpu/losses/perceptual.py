"""Perceptual (VGG19-feature) loss.

Parity: basicsr/losses/basic_loss.py:147-253 (PerceptualLoss) +
basicsr/archs/vgg_arch.py:55-161 (VGGFeatureExtractor). The flax VGG19 runs
NHWC on-device so the loss fuses into the train step.

Weights: torchvision is not available in zero-egress environments. The
extractor loads converted weights from (in order):
  1. ``BEM_VGG19_WEIGHTS`` env var (a .npz of HWIO conv kernels), or
  2. ``~/.cache/bem_tpu/vgg19_features.npz``,
  3. otherwise RAISES — unless ``BEM_ALLOW_RANDOM_VGG=1`` explicitly opts
     into fixed-seed He-initialized random features (useful for smoke tests,
     never for parity). Convert real weights via tools/convert_vgg19.py.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_root_logger

# VGG19 conv layout: (name, out_channels); pools between blocks
VGG19_LAYERS = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", 0),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool3", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("pool4", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), ("pool5", 0),
]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _load_vgg_weights() -> Dict[str, np.ndarray]:
    paths = []
    if os.environ.get("BEM_VGG19_WEIGHTS"):
        paths.append(os.environ["BEM_VGG19_WEIGHTS"])
    paths.append(os.path.expanduser("~/.cache/bem_tpu/vgg19_features.npz"))
    for p in paths:
        if os.path.exists(p):
            data = np.load(p)
            return {k: data[k] for k in data.files}
    if os.environ.get("BEM_ALLOW_RANDOM_VGG") != "1":
        # Fail loudly: every reference Option trains with 0.01*VGG19-conv5_4;
        # silently substituting random features diverges the training
        # objective by construction (basic_loss.py:147, vgg_arch.py:55).
        raise FileNotFoundError(
            "VGG19 feature weights not found. Convert them once with "
            "tools/convert_vgg19.py (needs torchvision / egress) and point "
            "BEM_VGG19_WEIGHTS at the .npz, or set BEM_ALLOW_RANDOM_VGG=1 to "
            "explicitly opt into fixed-seed random features (NOT parity)."
        )
    get_root_logger().warning(
        "BEM_ALLOW_RANDOM_VGG=1: using fixed-seed random VGG features for "
        "the perceptual loss — results will not match the reference."
    )
    rng = np.random.default_rng(19)
    weights = {}
    in_ch = 3
    for name, out_ch in VGG19_LAYERS:
        if name.startswith("pool"):
            continue
        fan_in = in_ch * 9
        weights[f"{name}.kernel"] = (
            rng.standard_normal((3, 3, in_ch, out_ch)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        weights[f"{name}.bias"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    return weights


class VGGFeatureExtractor:
    """Functional VGG19 slice extractor (vgg_arch.py:55-161)."""

    def __init__(
        self,
        layer_name_list: Sequence[str],
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
    ):
        assert vgg_type == "vgg19", "only vgg19 is wired (all BEM configs use it)"
        self.layer_name_list = list(layer_name_list)
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        w = _load_vgg_weights()
        self.weights = {k: jnp.asarray(v) for k, v in w.items()}
        # run only as deep as the deepest requested layer
        names = [n for n, _ in VGG19_LAYERS]
        max_idx = max(names.index(l) for l in self.layer_name_list)
        self.layers = VGG19_LAYERS[: max_idx + 1]

    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        """x: NHWC RGB in [0,1] (or [-1,1] with range_norm)."""
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - _MEAN) / _STD
        feats = {}
        h = x
        for name, _ in self.layers:
            if name.startswith("pool"):
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            else:
                k = self.weights[f"{name}.kernel"].astype(h.dtype)
                b = self.weights[f"{name}.bias"].astype(h.dtype)
                h = jax.lax.conv_general_dilated(
                    h, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
                if name in self.layer_name_list:
                    feats[name] = h
                h = jax.nn.relu(h)
        return feats


class PerceptualLoss:
    """Weighted VGG feature distance + optional Gram style loss
    (basic_loss.py:147-253)."""

    def __init__(
        self,
        layer_weights: Dict[str, float],
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        perceptual_weight: float = 1.0,
        style_weight: float = 0.0,
        criterion: str = "l1",
    ):
        self.layer_weights = layer_weights
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion_type = criterion
        self.vgg = VGGFeatureExtractor(
            list(layer_weights.keys()), vgg_type, use_input_norm, range_norm
        )

    def _dist(self, a, b):
        if self.criterion_type == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion_type == "l2" or self.criterion_type == "mse":
            return jnp.mean(jnp.square(a - b))
        if self.criterion_type == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(self.criterion_type)

    @staticmethod
    def _gram(x):
        n, h, w, c = x.shape
        f = x.reshape(n, h * w, c)
        return jnp.einsum("nlc,nld->ncd", f, f) / (c * h * w)

    def __call__(self, x, gt):
        xf = self.vgg(x)
        gtf = self.vgg(jax.lax.stop_gradient(gt))
        percep = None
        if self.perceptual_weight > 0:
            percep = sum(
                self._dist(xf[k], gtf[k]) * w for k, w in self.layer_weights.items()
            ) * self.perceptual_weight
        style = None
        if self.style_weight > 0:
            style = sum(
                self._dist(self._gram(xf[k]), self._gram(gtf[k])) * w
                for k, w in self.layer_weights.items()
            ) * self.style_weight
        return percep, style


def build_perceptual(opt: dict) -> PerceptualLoss:
    opt = dict(opt)
    opt.pop("type", None)
    return PerceptualLoss(**opt)
