"""Load individual reference modules by file path with stubbed package deps.

The reference's ``basicsr`` package __init__ pulls torchvision (absent here),
so golden-parity tests import just the module files they need, providing
minimal stand-ins for the intra-package imports.
"""

import importlib.util
import sys
import types

REF = "/root/reference"


def _exec(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_network_module():
    """Import the reference UNet_arch (torch) with stubbed heavy deps
    (timm / fvcore / triton / CUDA exts are absent in this image)."""
    import importlib
    import logging

    import torch
    import torch.nn as tnn

    # ---- tiny shims ------------------------------------------------------
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x  # eval-time identity (configs use drop_path=0)

        timm_layers.DropPath = DropPath
        timm_layers.trunc_normal_ = lambda t, mean=0.0, std=1.0, a=-2.0, b=2.0: (
            torch.nn.init.trunc_normal_(t, mean, std, a, b)
        )

        def _to_2tuple(x):
            import collections.abc
            import itertools

            if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
                return tuple(x)
            return tuple(itertools.repeat(x, 2))

        timm_layers.to_2tuple = _to_2tuple
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
    if "fvcore" not in sys.modules:
        fvcore = types.ModuleType("fvcore")
        fvcore_nn = types.ModuleType("fvcore.nn")
        for name in ("FlopCountAnalysis", "flop_count_str", "flop_count",
                     "parameter_count"):
            setattr(fvcore_nn, name, lambda *a, **k: None)
        fvcore.nn = fvcore_nn
        sys.modules["fvcore"] = fvcore
        sys.modules["fvcore.nn"] = fvcore_nn

    # ---- basicsr package skeleton ---------------------------------------
    for name in list(sys.modules):
        if name == "basicsr" or name.startswith("basicsr."):
            del sys.modules[name]
    pkg = types.ModuleType("basicsr")
    pkg.__stub__ = True
    pkg.__path__ = [f"{REF}/basicsr"]
    sys.modules["basicsr"] = pkg

    utils_pkg = types.ModuleType("basicsr.utils")
    utils_pkg.__path__ = [f"{REF}/basicsr/utils"]
    utils_pkg.get_root_logger = lambda *a, **k: logging.getLogger("ref")
    sys.modules["basicsr.utils"] = utils_pkg
    _exec(f"{REF}/basicsr/utils/registry.py", "basicsr.utils.registry")

    archs_pkg = types.ModuleType("basicsr.archs")
    archs_pkg.__path__ = [f"{REF}/basicsr/archs"]
    sys.modules["basicsr.archs"] = archs_pkg
    vmamba_pkg = types.ModuleType("basicsr.vmamba")
    vmamba_pkg.__path__ = [f"{REF}/basicsr/vmamba"]
    sys.modules["basicsr.vmamba"] = vmamba_pkg
    models_pkg = types.ModuleType("basicsr.vmamba.models")
    models_pkg.__path__ = [f"{REF}/basicsr/vmamba/models"]
    sys.modules["basicsr.vmamba.models"] = models_pkg

    # real 'vmamba' alias used by UNet_arch's try-import
    vm_alias = types.ModuleType("vmamba")
    vm_alias.__path__ = [f"{REF}/basicsr/vmamba"]
    sys.modules["vmamba"] = vm_alias
    vm_models_alias = types.ModuleType("vmamba.models")
    vm_models_alias.__path__ = [f"{REF}/basicsr/vmamba/models"]
    sys.modules["vmamba.models"] = vm_models_alias

    # csm_triton.py decorates kernels with @triton.jit unconditionally even
    # when its triton import failed (reference bug) — provide a stub
    if "triton" not in sys.modules:
        triton = types.ModuleType("triton")
        triton.jit = lambda f=None, **kw: (f if f is not None else (lambda g: g))
        tl = types.ModuleType("triton.language")
        tl.constexpr = object
        # torch._dynamo.utils probes triton.language.dtype at import time
        # when any dynamo machinery initializes (e.g. clip_grad_norm_)
        tl.dtype = type("dtype", (), {})
        triton.language = tl
        sys.modules["triton"] = triton
        sys.modules["triton.language"] = tl

    # the mamba2 Triton kernel suite can't run here, but ssd_minimal's pure
    # torch path (mamba_chunk_scan_combined_torch) can: load the real module
    # with triton hidden so WITH_TRITON=False and the torch backend is used
    # (SS2Dm0 golden parity needs it, vmamba.py:1121)
    if "basicsr.vmamba.models.mamba2" not in sys.modules:
        saved_triton = sys.modules.pop("triton", None)
        saved_tl = sys.modules.pop("triton.language", None)
        try:
            ssd_min = _exec(
                f"{REF}/basicsr/vmamba/models/mamba2/ssd_minimal.py",
                "basicsr.vmamba.models.mamba2.ssd_minimal",
            )
        finally:
            if saved_triton is not None:
                sys.modules["triton"] = saved_triton
            if saved_tl is not None:
                sys.modules["triton.language"] = saved_tl
        mamba2_pkg = types.ModuleType("basicsr.vmamba.models.mamba2")
        mamba2_pkg.__path__ = []
        mamba2_pkg.ssd_minimal = ssd_min
        sys.modules["basicsr.vmamba.models.mamba2"] = mamba2_pkg

    # the reference's try/except import fallbacks use absolute module names;
    # make them resolvable
    models_dir = f"{REF}/basicsr/vmamba/models"
    if models_dir not in sys.path:
        sys.path.insert(0, models_dir)
    vmamba_mod = importlib.import_module("basicsr.vmamba.models.vmamba")
    sys.modules["vmamba.models.vmamba"] = vmamba_mod
    importlib.import_module("basicsr.archs.arch_util")
    unet = importlib.import_module("basicsr.archs.UNet_arch")
    return unet


def load_ref_metric_modules():
    """Returns dict with reference psnr_ssim / niqe / uciqe_uiqm modules."""
    if "basicsr" in sys.modules and not getattr(sys.modules["basicsr"], "__stub__", False):
        del sys.modules["basicsr"]

    pkg = types.ModuleType("basicsr")
    pkg.__stub__ = True
    pkg.__path__ = [f"{REF}/basicsr"]
    sys.modules["basicsr"] = pkg

    utils_pkg = types.ModuleType("basicsr.utils")
    utils_pkg.__path__ = [f"{REF}/basicsr/utils"]
    sys.modules["basicsr.utils"] = utils_pkg

    registry = _exec(f"{REF}/basicsr/utils/registry.py", "basicsr.utils.registry")
    color = _exec(f"{REF}/basicsr/utils/color_util.py", "basicsr.utils.color_util")
    matlab = _exec(f"{REF}/basicsr/utils/matlab_functions.py",
                   "basicsr.utils.matlab_functions")
    for name in dir(color):
        if not name.startswith("_"):
            setattr(utils_pkg, name, getattr(color, name))
    utils_pkg.registry = registry
    utils_pkg.matlab_functions = matlab

    metrics_pkg = types.ModuleType("basicsr.metrics")
    metrics_pkg.__path__ = [f"{REF}/basicsr/metrics"]
    sys.modules["basicsr.metrics"] = metrics_pkg

    # the reference uciqe_uiqm imports skimage at module top but the active
    # getUCIQE/getUIQM paths never call it — stub it out
    for name in ("skimage", "skimage.filters", "skimage.color"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["skimage"].filters = sys.modules["skimage.filters"]
    sys.modules["skimage"].color = sys.modules["skimage.color"]

    metric_util = _exec(f"{REF}/basicsr/metrics/metric_util.py",
                        "basicsr.metrics.metric_util")
    psnr_ssim = _exec(f"{REF}/basicsr/metrics/psnr_ssim.py",
                      "basicsr.metrics.psnr_ssim")
    niqe = _exec(f"{REF}/basicsr/metrics/niqe.py", "basicsr.metrics.niqe")
    uciqe = _exec(f"{REF}/basicsr/metrics/uciqe_uiqm.py",
                  "basicsr.metrics.uciqe_uiqm")
    return {"psnr_ssim": psnr_ssim, "niqe": niqe, "uciqe_uiqm": uciqe}


def load_ref_ddwavelet_module():
    """Import the reference DecompDualBranchDDWavelet_arch (torch) — the
    flagship arch — on top of the Network skeleton. Returns the arch module;
    construct instances with cwd=/root/reference so the QD checkpoint's
    relative path resolves (DecompDualBranchDDWavelet_arch.py:58-67)."""
    import importlib

    load_ref_network_module()

    qd_pkg = types.ModuleType("basicsr.QD")
    qd_pkg.__path__ = [f"{REF}/basicsr/QD"]
    sys.modules["basicsr.QD"] = qd_pkg
    for name in ("quaternion", "model1", "model2", "model3", "model4"):
        _exec(f"{REF}/basicsr/QD/{name}.py", f"basicsr.QD.{name}")
    return importlib.import_module(
        "basicsr.archs.DecompDualBranchDDWavelet_arch")
