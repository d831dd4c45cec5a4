"""QD evaluate CLI smoke: shipped checkpoint, synthetic pair."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_qd_evaluate_cli(tmp_path):
    from bem_tpu.qd.evaluate import main

    rng = np.random.default_rng(0)
    low = tmp_path / "low"
    high = tmp_path / "high"
    os.makedirs(low)
    os.makedirs(high)
    for i in range(2):
        img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(high / f"{i}.png"), img)
        cv2.imwrite(str(low / f"{i}.png"), (img * 0.3).astype(np.uint8))

    res = main([
        "--model_type", "model4",
        "--low_dir", str(low), "--high_dir", str(high),
        "--out_dir", str(tmp_path / "out"),
        "--save_components",
    ])
    # the shipped converted model4 checkpoint reconstructs well
    # (reference logs ~60 dB on LOLv1; synthetic random images land lower
    # but must still be a faithful decomposition)
    assert res["psnr"] > 25
    assert 0.0 <= res["rci"] <= 1.0
    assert (tmp_path / "out" / "result.txt").exists()
    assert (tmp_path / "out" / "0_Q1.png").exists()
