"""End-to-end K-sample Bayesian eval CLI on synthetic data."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

CG_YML = """
name: CG_tiny
model_type: ConditionGenerator
scale: 1
manual_seed: 0
condition: {{type: mean, scale_down: 16, noise_level: 0.1}}
network_g: {{type: Network, in_channels: 3, out_channels: 3, n_feat: 8, stage: 1,
  num_blocks: [1, 1], d_state: [1, 1], ssm_ratio: 1, mlp_ratio: 2,
  use_pixelshuffle: true}}
path: {{}}
val: {{}}
"""

IE_YML = """
name: IE_tiny
model_type: ImageEnhancer
scale: 1
manual_seed: 0
condition: {{type: mean, scale_down: 16, noise_level: 0.1}}
network_g: {{type: Network, in_channels: 6, out_channels: 3, n_feat: 8, stage: 1,
  num_blocks: [1, 1], d_state: [1, 1], ssm_ratio: 1, mlp_ratio: 2,
  use_pixelshuffle: true}}
path: {{}}
val: {{}}
"""


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from bem_tpu.archs import build_network
    from bem_tpu.utils.checkpoint import save_params

    root = tmp_path_factory.mktemp("eval")
    rng = np.random.default_rng(0)
    os.makedirs(root / "input")
    os.makedirs(root / "target")
    for i in range(2):
        gt = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "target" / f"{i}.png"), gt)
        cv2.imwrite(str(root / "input" / f"{i}.png"), (gt * 0.3).astype(np.uint8))

    (root / "cg.yml").write_text(CG_YML.format())
    (root / "ie.yml").write_text(IE_YML.format())

    cg = build_network(dict(type="Network", in_channels=3, out_channels=3,
                            n_feat=8, num_blocks=(1, 1), d_state=(1, 1),
                            ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=True,
                            bayesian=True))
    vcg = jax.jit(cg.init)(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    save_params(str(root / "cg.msgpack"), vcg["params"])
    ie = build_network(dict(type="Network", in_channels=6, out_channels=3,
                            n_feat=8, num_blocks=(1, 1), d_state=(1, 1),
                            ssm_ratio=1, mlp_ratio=2, use_pixelshuffle=True))
    vie = jax.jit(ie.init)(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 6)))
    save_params(str(root / "ie.msgpack"), vie["params"])
    return root


def _run(root, extra):
    from bem_tpu.enhancement.eval import main

    args = [
        "--opt", str(root / "cg.yml"),
        "--cond_opt", str(root / "ie.yml"),
        "--weights", str(root / "cg.msgpack"),
        "--cond_weights", str(root / "ie.msgpack"),
        "--input_dir", str(root / "input"),
        "--result_dir", str(root / "results"),
        "--num_samples", "4",
        "--parallel_num", "2",
    ] + extra
    return main(args)


def test_eval_full_reference_selection(eval_env):
    res = _run(eval_env, ["--target_dir", str(eval_env / "target"), "--GT_mean",
                          "--Monte_Carlo"])
    assert res["psnr"] is not None and np.isfinite(res["psnr"])
    assert res["ssim"] is not None
    out = eval_env / "results" / "dataset"
    assert (out / "result.txt").exists()
    assert (out / "0.png").exists()
    txt = (out / "result.txt").read_text()
    assert "Best_PSNR" in txt and "MC_PSNR" in txt


def test_eval_noref_uiqm_uciqe(eval_env):
    res = _run(eval_env, ["--no_ref", "uiqm_uciqe", "--save_candidates"])
    out = eval_env / "results" / "dataset"
    assert "Best_UIQM" in (out / "result.txt").read_text()


def test_eval_noref_niqe_fast_select_matches_host(eval_env, tmp_path):
    """The on-device crop+score+argmin fast path (no GT_mean / candidate
    dump / Monte-Carlo) must select the same candidate and NIQE value as
    the host path (--save_candidates forces the host path)."""
    import cv2 as _cv2

    rng = np.random.default_rng(3)
    os.makedirs(tmp_path / "input")
    for i in range(2):
        img = (rng.random((128, 128, 3)) * 80).astype(np.uint8)
        _cv2.imwrite(str(tmp_path / "input" / f"{i}.png"), img)

    def run(extra, out):
        from bem_tpu.enhancement.eval import main

        return main([
            "--opt", str(eval_env / "cg.yml"),
            "--cond_opt", str(eval_env / "ie.yml"),
            "--weights", str(eval_env / "cg.msgpack"),
            "--cond_weights", str(eval_env / "ie.msgpack"),
            "--input_dir", str(tmp_path / "input"),
            "--result_dir", str(tmp_path / out),
            "--num_samples", "4", "--parallel_num", "4",
            "--no_ref", "niqe",
        ] + extra)

    fast = run([], "fast")
    host = run(["--save_candidates"], "host")
    assert fast["niqe"] == pytest.approx(host["niqe"], rel=1e-4)
    a = _cv2.imread(str(tmp_path / "fast" / "dataset" / "0.png"))
    b = _cv2.imread(str(tmp_path / "host" / "dataset" / "0.png"))
    assert a is not None and b is not None
    np.testing.assert_array_equal(a, b)
