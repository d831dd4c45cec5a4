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
