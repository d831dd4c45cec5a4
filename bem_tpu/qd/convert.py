"""Import reference QD decomposition checkpoints into flax params.

The Decomp archs embed frozen QD weights (DecompDualBranch_arch.py:89-108
loads basicsr/QD/checkpoints/model{1..4}_999.pth at build time). This module
converts those torch checkpoints to our channels-last layout; converted
copies ship in ``bem_tpu/qd/checkpoints/`` as msgpack so the framework is
standalone.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from ..utils.torch_convert import (
    assemble,
    conv_kernel,
    conv_transpose_kernel,
    load_torch_state_dict,
)

CHECKPOINT_DIR = os.path.join(os.path.dirname(__file__), "checkpoints")


def convert_decomp_state(sd: Dict[str, np.ndarray], model_type: str) -> Dict[str, Any]:
    """torch Decomp state_dict -> flax params for bem_tpu.qd.models.Decomp."""
    out: Dict[str, np.ndarray] = {}

    def conv(dst, src):
        out[f"{dst}/kernel"] = conv_kernel(sd[f"{src}.weight"])
        if f"{src}.bias" in sd:
            out[f"{dst}/bias"] = sd[f"{src}.bias"]

    conv("conv_in", "conv_in")
    # branches: Sequential indices 0 (conv) and 2 (conv)
    for b in ("branch_q1", "branch_q2"):
        conv(f"{b}/conv0", f"{b}.0")
        if model_type == "model2":
            out[f"{b}/conv1_kernel"] = conv_kernel(sd[f"{b}.2.weight"])
            out[f"{b}/conv1_bias"] = sd[f"{b}.2.bias"]
        else:
            conv(f"{b}/conv1", f"{b}.2")
    for p in ("q1_proj", "k2_proj", "v2_proj", "q2_proj", "k1_proj", "v1_proj",
              "out1", "out2"):
        conv(f"cross_attn/{p}", f"cross_attn.{p}")
    conv("fuse", "fuse")
    conv("conv_out", "conv_out")
    conv("sharpening", "sharpening")
    if model_type == "model3":
        conv("down_conv", "down_conv")
        conv("mid_conv", "mid_conv")
        out["up_conv/kernel"] = conv_transpose_kernel(sd["up_conv.weight"])
        out["up_conv/bias"] = sd["up_conv.bias"]
    if model_type == "model4" and "smooth_q1.conv.weight" in sd:
        conv("smooth_q1/conv", "smooth_q1.conv")
        conv("smooth_q2/conv", "smooth_q2.conv")
    return assemble(out)


def convert_checkpoint(pth_path: str, model_type: str) -> Dict[str, Any]:
    return convert_decomp_state(load_torch_state_dict(pth_path), model_type)


def load_decomp_params(model_type: str) -> Dict[str, Any]:
    """Load the shipped converted checkpoint for a decomp model."""
    from flax import serialization

    path = os.path.join(CHECKPOINT_DIR, f"{model_type}_999.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"No converted QD checkpoint at {path}. Run "
            f"python -m bem_tpu.qd.convert <reference_checkpoint_dir> first, "
            f"or train one with bem_tpu.qd.train."
        )
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(src_dir: str, out_dir: str = CHECKPOINT_DIR):
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    for mt in ("model1", "model2", "model3", "model4"):
        # the _retrain_999 variants are the reference's re-trained QD drops
        # (QD/checkpoints/); no shipped arch loads them, but they are part
        # of the artifact set, so convert both
        for suffix in ("999", "retrain_999"):
            src = os.path.join(src_dir, f"{mt}_{suffix}.pth")
            if not os.path.exists(src):
                print(f"skip {src} (missing)")
                continue
            params = convert_checkpoint(src, mt)
            dst = os.path.join(out_dir, f"{mt}_{suffix}.msgpack")
            with open(dst, "wb") as f:
                f.write(serialization.msgpack_serialize(params))
            print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/basicsr/QD/checkpoints")
