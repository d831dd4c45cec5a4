"""Full-scale flagship parity: n_feat=40, num_blocks (2,2,2) at the LOLv1
eval resolution (400x600) through the complete eval protocol vs the torch
reference with converted weights (VERDICT round-1 item 5).

Protocol mirrored exactly (Enhancement/eval.py:146-172 +
image_enhancer_model.py:218-257): reflect-pad to the window multiple,
forward, crop, tensor2img uint8, PSNR against a fixture target. Asserts
|PSNR_jax - PSNR_torch| < 0.05 dB in fp32 and a looser bound for the bf16
compute path (the deployment dtype).

The torch side would take hours through the reference's sequential CPU
scan, so its selective_scan_fn is patched to the reference's own chunked
oracle (kernels/selective_scan/test_selective_scan_easy.py
selective_scan_easy — the mathematical spec the CUDA kernel is tested
against; fp32-identical up to reassociation).
"""

import importlib.util
import sys

import numpy as np
import pytest

REF_EASY = "/root/reference/kernels/selective_scan/test_selective_scan_easy.py"

pytestmark = pytest.mark.slow


def _load_easy():
    spec = importlib.util.spec_from_file_location("ref_scan_easy", REF_EASY)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_scan_easy"] = mod
    try:
        spec.loader.exec_module(mod)
    except ModuleNotFoundError:
        # the file's tail imports the optional 'ssmtriton' bench dep;
        # selective_scan_easy is already defined by then
        pass
    return mod.selective_scan_easy


def _psnr_uint8(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0 ** 2 / mse)


def test_flagship_fullscale_psnr_parity(rng):
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from ref_loader import load_ref_network_module
    from bem_tpu.archs import build_network
    from bem_tpu.archs.convert_network import convert_network_state
    from bem_tpu.utils.img_util import tensor2img

    ref_unet = load_ref_network_module()
    easy = _load_easy()

    # patch the reference scan to the chunked oracle (torch-CPU-feasible)
    csms6s = sys.modules["basicsr.vmamba.models.csms6s"]

    def fast_scan(u, delta, A, B, C, D=None, delta_bias=None,
                  delta_softplus=True, *args, **kwargs):
        return easy(u, delta, A, B, C, D, delta_bias=delta_bias,
                    delta_softplus=delta_softplus, chunksize=8)

    csms6s.selective_scan_fn = fast_scan
    sys.modules["basicsr.vmamba.models.vmamba"].selective_scan_fn = fast_scan

    torch.manual_seed(0)
    kwargs = dict(
        in_channels=6, out_channels=3, n_feat=40, stage=1,
        num_blocks=[2, 2, 2], d_state=[1, 1, 1], ssm_ratio=1, mlp_ratio=4,
        mlp_type="gdmlp", use_pixelshuffle=True,
    )
    ref = ref_unet.Network(**kwargs)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # fixture: LOLv1-sized smooth low-light-like input + target
    H, W = 400, 600
    bh, bw = -(-H // 16), -(-W // 16)
    base = rng.random((bh, bw, 6))
    x = np.kron(base, np.ones((16, 16, 1)))[:H, :W] * 0.5
    x = (x + 0.1 * rng.random((H, W, 6))).astype(np.float32)
    target = np.clip(
        np.kron(rng.random((bh, bw, 3)),
                np.ones((16, 16, 1)))[:H, :W], 0, 1
    ).astype(np.float32)
    target_u8 = (target * 255.0).round().astype(np.uint8)

    # eval protocol: reflect-pad to the 4*scale window (eval.py:146-172)
    window = 64
    ph, pw = (window - H % window) % window, (window - W % window) % window
    xp = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")

    with torch.no_grad():
        out_t = ref(torch.from_numpy(xp.transpose(2, 0, 1)[None]))[-1]
    out_t = out_t[0].numpy().transpose(1, 2, 0)[:H, :W]
    img_t = tensor2img(out_t, rgb2bgr=False)
    psnr_t = _psnr_uint8(img_t, target_u8)

    params = convert_network_state(sd, num_blocks=(2, 2, 2), stage=1,
                                   use_pixelshuffle=True)
    net = build_network(dict(type="Network", **kwargs))
    fwd = jax.jit(lambda p, t: net.apply({"params": p}, t)[-1])

    out_j = np.asarray(fwd(params, jnp.asarray(xp[None])))[0][:H, :W]
    img_j = tensor2img(out_j, rgb2bgr=False)
    psnr_j = _psnr_uint8(img_j, target_u8)

    # bf16 compute path (params stay fp32; activations bf16 like bench)
    out_b = np.asarray(
        fwd(params, jnp.asarray(xp[None], jnp.bfloat16)).astype(jnp.float32)
    )[0][:H, :W]
    img_b = tensor2img(out_b, rgb2bgr=False)
    psnr_b = _psnr_uint8(img_b, target_u8)

    assert abs(psnr_j - psnr_t) < 0.05, (psnr_j, psnr_t)
    assert abs(psnr_b - psnr_t) < 0.5, (psnr_b, psnr_t)
    # the outputs themselves must agree closely, not just the scores
    assert _psnr_uint8(img_j, img_t) > 45.0


def test_ddwavelet_fullscale_psnr_parity(rng):
    """Flagship DecompDualBranchDDWavelet at 400x600 through the eval
    protocol: frozen QD model4 decomp (real converted checkpoint), converted
    branch weights, |dPSNR| < 0.05 dB vs torch in fp32 — covers the wavelet
    de-interleave, IWT placement and Hamilton tail at full resolution
    (DecompDualBranchDDWavelet_arch.py:120-127,361-368)."""
    torch = pytest.importorskip("torch")
    import os

    import jax
    import jax.numpy as jnp

    from ref_loader import load_ref_ddwavelet_module
    from bem_tpu.archs import build_network
    from bem_tpu.archs.convert_network import convert_dualbranch_state
    from bem_tpu.utils.img_util import tensor2img

    arch_mod = load_ref_ddwavelet_module()
    easy = _load_easy()
    csms6s = sys.modules["basicsr.vmamba.models.csms6s"]

    def fast_scan(u, delta, A, B, C, D=None, delta_bias=None,
                  delta_softplus=True, *args, **kwargs):
        return easy(u, delta, A, B, C, D, delta_bias=delta_bias,
                    delta_softplus=delta_softplus, chunksize=8)

    csms6s.selective_scan_fn = fast_scan
    sys.modules["basicsr.vmamba.models.vmamba"].selective_scan_fn = fast_scan

    torch.manual_seed(0)
    kwargs = dict(
        in_channels=3, out_channels=3, n_feat=40, stage=1,
        num_blocks=[2, 2, 2], d_state=[1, 1, 1], ssm_ratio=1, mlp_ratio=4,
        mlp_type="gdmlp", use_pixelshuffle=True, decomp_model="model4",
    )
    cwd = os.getcwd()
    os.chdir("/root/reference")  # QD checkpoint path is cwd-relative
    _load = torch.load
    torch.load = lambda *a, **k: _load(
        *a, **{**k, "map_location": "cpu"})  # ckpt was saved on CUDA
    try:
        ref = arch_mod.DecompDualBranchDDWavelet(**kwargs)
    finally:
        torch.load = _load
        os.chdir(cwd)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    H, W = 400, 600
    bh, bw = -(-H // 16), -(-W // 16)
    base = rng.random((bh, bw, 6))
    x = np.kron(base, np.ones((16, 16, 1)))[:H, :W] * 0.5
    x = (x + 0.1 * rng.random((H, W, 6))).astype(np.float32)
    target = np.clip(
        np.kron(rng.random((bh, bw, 3)), np.ones((16, 16, 1)))[:H, :W], 0, 1
    ).astype(np.float32)
    target_u8 = (target * 255.0).round().astype(np.uint8)

    window = 64
    ph, pw = (window - H % window) % window, (window - W % window) % window
    xp = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="reflect")

    with torch.no_grad():
        out_t = ref(torch.from_numpy(xp.transpose(2, 0, 1)[None]))[-1]
    out_t = out_t[0].numpy().transpose(1, 2, 0)[:H, :W]
    img_t = tensor2img(out_t, rgb2bgr=False)
    psnr_t = _psnr_uint8(img_t, target_u8)

    net = build_network(dict(type="DecompDualBranchDDWavelet", **kwargs))
    import jax.random as jrandom
    init_params = jax.jit(net.init)(jrandom.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 6)))["params"]
    converted = convert_dualbranch_state(sd, num_blocks=(2, 2, 2))
    params = dict(init_params)
    params["branches"] = converted["branches"]
    params = net.load_frozen(params)

    fwd = jax.jit(lambda p, t: net.apply({"params": p}, t)[-1])
    out_j = np.asarray(fwd(params, jnp.asarray(xp[None])))[0][:H, :W]
    img_j = tensor2img(out_j, rgb2bgr=False)
    psnr_j = _psnr_uint8(img_j, target_u8)

    # bf16 activations (deployment dtype)
    out_b = np.asarray(
        fwd(params, jnp.asarray(xp[None], jnp.bfloat16)).astype(jnp.float32)
    )[0][:H, :W]
    img_b = tensor2img(out_b, rgb2bgr=False)
    psnr_b = _psnr_uint8(img_b, target_u8)

    assert abs(psnr_j - psnr_t) < 0.05, (psnr_j, psnr_t)
    assert abs(psnr_b - psnr_t) < 0.5, (psnr_b, psnr_t)
    assert _psnr_uint8(img_j, img_t) > 45.0
