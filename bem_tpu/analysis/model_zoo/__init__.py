"""Baseline model zoo for the PSNR-vs-FLOPs comparison
(reference: analysis/model_zoo/ — HWMNet, LLFormer, RetinexFormer, UVMNet,
edsr, hat, mambaIR, rcan, swinIR).

Each ``build*`` factory returns the flax module at the reference's
comparison config; parameter counts match the torch originals
(tests/test_model_zoo.py)."""

from .edsr_rcan import EDSR, RCAN, buildEDSR, buildRCAN
from .hwmnet import HWMNet, buildHWMNet
from .llformer import LLFormer, buildLLFormer
from .mambair import MambaIR, buildMambaIR
from .retinexformer import RetinexFormer, buildRetinexFormer
from .swinir_hat import HAT, SwinIR, buildHAT, buildSwinIR
from .uvmnet import UVMNetUNet, buildUVMNet

BUILDERS = {
    "EDSR": buildEDSR,
    "RCAN": buildRCAN,
    "HWMNet": buildHWMNet,
    "LLFormer": buildLLFormer,
    "RetinexFormer": buildRetinexFormer,
    "UVMNet": buildUVMNet,
    "MambaIR": buildMambaIR,
    "SwinIR": buildSwinIR,
    "HAT": buildHAT,
}
