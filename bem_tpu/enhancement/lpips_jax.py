"""LPIPS perceptual distance (reference uses lpips.LPIPS(net='alex'),
Enhancement/eval.py:144).

Needs the trained AlexNet backbone + linear calibration weights. In
zero-egress environments, point ``BEM_LPIPS_WEIGHTS`` at an .npz with the
converted weights (tools/convert_lpips.py produces it from the lpips pip
package); construction raises otherwise.
"""

from __future__ import annotations

import os

import numpy as np


class LPIPS:
    def __init__(self, net: str = "alex"):
        path = os.environ.get("BEM_LPIPS_WEIGHTS")
        if not path or not os.path.exists(path):
            raise RuntimeError(
                "LPIPS needs trained AlexNet weights: set BEM_LPIPS_WEIGHTS "
                "to a converted .npz (see tools/convert_lpips.py). Zero-"
                "egress environments cannot download them; omit --lpips."
            )
        data = np.load(path)
        self.weights = {k: data[k] for k in data.files}

    _SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
    _SCALE = np.array([0.458, 0.448, 0.450], np.float32)

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        """img0/img1: (H, W, 3) RGB [0,1]."""
        import jax
        import jax.numpy as jnp

        def features(x):
            # x in [-1, 1], normalized like lpips scaling_layer
            h = (x - self._SHIFT) / self._SCALE
            feats = []
            layer_specs = [
                ("conv1", 4, 2), ("conv2", 1, 1), ("conv3", 1, 1),
                ("conv4", 1, 1), ("conv5", 1, 1),
            ]
            pads = {"conv1": 2, "conv2": 2, "conv3": 1, "conv4": 1, "conv5": 1}
            for i, (name, stride, _) in enumerate(layer_specs):
                k = jnp.asarray(self.weights[f"{name}.kernel"])
                b = jnp.asarray(self.weights[f"{name}.bias"])
                p = pads[name]
                h = jax.lax.conv_general_dilated(
                    h, k, (stride, stride), ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + b
                h = jax.nn.relu(h)
                feats.append(h)
                if name in ("conv1", "conv2"):
                    h = jax.lax.reduce_window(
                        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                    )
            return feats

        x0 = jnp.asarray(img0[None] * 2.0 - 1.0, jnp.float32)
        x1 = jnp.asarray(img1[None] * 2.0 - 1.0, jnp.float32)
        f0, f1 = features(x0), features(x1)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(self.weights[f"lin{i}.kernel"])  # (1,1,C,1)
            total = total + jnp.mean(
                jax.lax.conv_general_dilated(
                    d, lin, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return float(total)
