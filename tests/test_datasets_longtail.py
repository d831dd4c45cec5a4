"""Long-tail dataset variants: SID, Slide/Norm/DefocusDeblur paired datasets,
recurrent/DUF video datasets (reference: basicsr/data/SID_image_dataset.py,
paired_image_dataset.py:416,563,828, reds_dataset.py:209,
vimeo90k_dataset.py:137, video_test_dataset.py:134,202,252)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from bem_tpu.utils.registry import DATASET_REGISTRY
import bem_tpu.data  # noqa: F401  (registers datasets)


def _write_png(path, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
    return img


def _write_16bit(path, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 65535).astype(np.uint16)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
    return img


# --------------------------------------------------------------------------
# SID
# --------------------------------------------------------------------------


def _make_sid_tree(root):
    # clips: '0_scene' and '2_scene' are train, '1_scene' is val
    for clip, nframes in [("0_a", 3), ("1_b", 2), ("2_c", 4)]:
        for i in range(nframes):
            arr = (np.random.default_rng(hash(clip) % 1000 + i)
                   .random((16, 24, 3)) * 255).astype(np.uint8)
            p = os.path.join(root, "lq", clip, f"{i:04d}.npy")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            np.save(p, arr)
        gtp = os.path.join(root, "gt", clip, "0000.npy")
        os.makedirs(os.path.dirname(gtp), exist_ok=True)
        np.save(gtp, (np.random.default_rng(99).random((16, 24, 3)) * 255)
                .astype(np.uint8))


def test_sid_phase_split_and_npy(tmp_path):
    root = str(tmp_path)
    _make_sid_tree(root)
    cls = DATASET_REGISTRY.get("Dataset_SIDImage")
    train = cls({"dataroot_gt": os.path.join(root, "gt"),
                 "dataroot_lq": os.path.join(root, "lq"),
                 "phase": "train", "N_frames": 1,
                 "train_size": (20, 12)})  # (width, height)
    val = cls({"dataroot_gt": os.path.join(root, "gt"),
               "dataroot_lq": os.path.join(root, "lq"),
               "phase": "val", "N_frames": 1, "train_size": (20, 12)})
    # train keeps clips 0_a (3 frames) + 2_c (4); val keeps 1_b (2)
    assert len(train) == 7
    assert len(val) == 2
    s = val[0]
    assert s["lq"].shape == (12, 20, 3)  # resized to train_size (w=20, h=12)
    assert s["gt"].shape == (12, 20, 3)
    assert s["lq"].dtype == np.float32 and s["lq"].max() <= 1.0
    # every index in a clip pairs with the clip's FIRST gt frame
    assert s["gt_path"].endswith("0000.npy")
    assert val[1]["gt_path"] == s["gt_path"]


# --------------------------------------------------------------------------
# Paired variants
# --------------------------------------------------------------------------


def _make_paired_tree(root, h=40, w=40, n=2):
    for i in range(n):
        _write_png(os.path.join(root, "lq", f"{i:03d}.png"), h, w, seed=i)
        _write_png(os.path.join(root, "gt", f"{i:03d}.png"), h, w, seed=100 + i)


def test_paired_slide_grid(tmp_path):
    root = str(tmp_path)
    # Slide hard-codes 400x600 source images (reference :455)
    _make_paired_tree(root, h=400, w=600, n=1)
    cls = DATASET_REGISTRY.get("Dataset_PairedImage_Slide")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "io_backend": {"type": "disk"}, "phase": "val",
              "gt_size": 128, "stride": 100, "scale": 1})
    # patches per line = (600-128)//100+1 = 5; per column = (400-128)//100+1 = 3
    assert ds.patch_per_line == 5 and ds.patch_per_colum == 3
    assert len(ds) == 15
    s = ds[7]  # img 0, patch 7 -> h_idx=1, w_idx=2
    assert s["lq"].shape == (128, 128, 3)
    full = cv2.imread(os.path.join(root, "lq", "000.png")).astype(np.float32) / 255.0
    expect = full[100:228, 200:328, ::-1]
    np.testing.assert_allclose(s["lq"], expect, atol=1e-6)


def test_paired_norm_minmax(tmp_path):
    root = str(tmp_path)
    _make_paired_tree(root, n=2)
    cls = DATASET_REGISTRY.get("Dataset_PairedImage_Norm")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "io_backend": {"type": "disk"}, "phase": "val", "scale": 1})
    s = ds[0]
    assert abs(float(s["lq"].min())) < 1e-6
    assert abs(float(s["lq"].max()) - 1.0) < 1e-6


def test_defocus_dualpixel_16bit(tmp_path):
    root = str(tmp_path)
    for i in range(2):
        _write_16bit(os.path.join(root, "lqL", f"{i}.png"), seed=i)
        _write_16bit(os.path.join(root, "lqR", f"{i}.png"), seed=10 + i)
        _write_16bit(os.path.join(root, "gt", f"{i}.png"), seed=20 + i)
    cls = DATASET_REGISTRY.get("Dataset_DefocusDeblur_DualPixel_16bit")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lqL": os.path.join(root, "lqL"),
              "dataroot_lqR": os.path.join(root, "lqR"),
              "io_backend": {"type": "disk"}, "phase": "train",
              "gt_size": 16, "scale": 1, "geometric_augs": True, "seed": 0})
    s = ds[0]
    assert s["lq"].shape == (16, 16, 6)  # concat(lqL, lqR)
    assert s["gt"].shape == (16, 16, 3)
    assert s["lq"].max() <= 1.0  # 16-bit normalized by 65535


# --------------------------------------------------------------------------
# Video recurrent / DUF
# --------------------------------------------------------------------------


def _make_clip_tree(root, clips=("000",), frames=6, h=24, w=24):
    for c in clips:
        for i in range(frames):
            _write_png(os.path.join(root, "lq", c, f"{i:08d}.png"), h, w, seed=i)
            _write_png(os.path.join(root, "gt", c, f"{i:08d}.png"), h, w, seed=50 + i)


def test_reds_recurrent(tmp_path):
    root = str(tmp_path)
    _make_clip_tree(root, clips=("001",), frames=6)
    meta = tmp_path / "meta.txt"
    meta.write_text("001 6 (24,24,3)\n")
    cls = DATASET_REGISTRY.get("REDSRecurrentDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "meta_info_file": str(meta), "val_partition": "REDS4",
              "io_backend": {"type": "disk"}, "num_frame": 3, "gt_size": 16,
              "scale": 1, "frames_per_clip": 6, "phase": "train",
              "use_hflip": True, "use_rot": True})
    assert len(ds) == 6
    s = ds[0]
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (3, 16, 16, 3)  # recurrent: GT per frame


def test_vimeo90k_recurrent(tmp_path):
    root = str(tmp_path)
    for n in range(1, 8):
        _write_png(os.path.join(root, "lq", "00001", "0001", f"im{n}.png"), seed=n)
        _write_png(os.path.join(root, "gt", "00001", "0001", f"im{n}.png"), seed=50 + n)
    meta = tmp_path / "meta.txt"
    meta.write_text("00001/0001 (256,448,3)\n")
    cls = DATASET_REGISTRY.get("Vimeo90KRecurrentDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "meta_info_file": str(meta), "io_backend": {"type": "disk"},
              "num_frame": 7, "gt_size": 16, "scale": 1, "phase": "train",
              "flip_sequence": True})
    s = ds[0]
    assert s["lq"].shape == (14, 16, 16, 3)  # 7 flipped to 14
    assert s["gt"].shape == (14, 16, 16, 3)
    np.testing.assert_array_equal(s["lq"][7], s["lq"][6])  # mirror boundary


def test_video_recurrent_test(tmp_path):
    root = str(tmp_path)
    _make_clip_tree(root, clips=("clipA", "clipB"), frames=3)
    cls = DATASET_REGISTRY.get("VideoRecurrentTestDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "io_backend": {"type": "disk"}, "num_frame": 3})
    assert len(ds) == 2  # one sample per clip
    s = ds[0]
    assert s["lq"].shape == (3, 24, 24, 3)
    assert s["folder"] == "clipA"


def test_video_test_duf_downsampling(tmp_path):
    root = str(tmp_path)
    _make_clip_tree(root, clips=("c0",), frames=3, h=32, w=32)
    cls = DATASET_REGISTRY.get("VideoTestDUFDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "io_backend": {"type": "disk"}, "num_frame": 3,
              "padding": "reflection", "scale": 4,
              "use_duf_downsampling": True})
    s = ds[1]
    assert s["lq"].shape == (3, 8, 8, 3)  # GT blurred+downsampled by 4
    assert s["gt"].shape == (32, 32, 3)


def test_duf_downsample_matches_torch_reference():
    """duf_downsample vs a direct torch conv2d replication of the reference
    (data_util.py:358-390)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from bem_tpu.data.video_datasets import duf_downsample, generate_gaussian_kernel

    rng = np.random.default_rng(3)
    x = rng.random((2, 16, 20, 3)).astype(np.float32)  # (T, H, W, C)
    scale = 2
    got = duf_downsample(x, kernel_size=13, scale=scale)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # (T, C, H, W)
    t, c, h, w = xt.shape
    xt = xt.reshape(-1, 1, h, w)
    pad = 13 // 2 + scale * 2
    xt = F.pad(xt, (pad, pad, pad, pad), "reflect")
    kern = torch.from_numpy(
        generate_gaussian_kernel(13, 0.4 * scale).astype(np.float32))[None, None]
    out = F.conv2d(xt, kern, stride=scale)[:, :, 2:-2, 2:-2]
    out = out.reshape(t, c, out.shape[2], out.shape[3]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, out, atol=1e-5)


def test_video_test_vimeo90k(tmp_path):
    root = str(tmp_path)
    for n in range(1, 8):
        _write_png(os.path.join(root, "lq", "00001", "0266", f"im{n}.png"), seed=n)
    _write_png(os.path.join(root, "gt", "00001", "0266", "im4.png"), seed=99)
    meta = tmp_path / "meta.txt"
    meta.write_text("00001/0266 (256,448,3)\n")
    cls = DATASET_REGISTRY.get("VideoTestVimeo90KDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "meta_info_file": str(meta), "io_backend": {"type": "disk"},
              "num_frame": 7, "cache_data": False})
    s = ds[0]
    assert s["lq"].shape == (7, 32, 48, 3)
    assert s["gt"].shape == (32, 48, 3)
    assert s["lq_path"].endswith("im4.png")


def test_meta_info_lists_shipped():
    d = os.path.join(os.path.dirname(bem_tpu.data.__file__), "meta_info")
    names = os.listdir(d)
    assert "meta_info_REDS_GT.txt" in names
    assert "meta_info_Vimeo90K_train_GT.txt" in names
    assert len(names) == 10


import bem_tpu  # noqa: E402  (for the meta_info path test)


# --------------------------------------------------------------------------
# REDS optional flow supervision (reds_dataset.py:143-199) + flow [de]quantize
# (flow_util.py:76-170, mmcv formulas)
# --------------------------------------------------------------------------


def test_flow_quantize_roundtrip_mmcv():
    from bem_tpu.utils.flow_util import (dequantize_flow, quantize,
                                         quantize_flow)

    rng = np.random.default_rng(3)
    flow = (rng.random((10, 12, 2)).astype(np.float32) - 0.5) * 30
    dx, dy = quantize_flow(flow, max_val=20, norm=False)
    assert dx.dtype == np.uint8 and dx.shape == (10, 12)
    # mmcv formula: floor(255 * (clip(v)+20)/40) capped at 254
    exp_dx = np.minimum(
        np.floor(255 * (np.clip(flow[..., 0], -20, 20) + 20) / 40), 254)
    np.testing.assert_array_equal(dx, exp_dx.astype(np.uint8))
    # zero maps to the bucket whose center is exactly 0 (the 255-level trick)
    z = quantize(np.zeros(3), -20, 20, 255, np.uint8)
    back = dequantize_flow(z.reshape(1, 3), z.reshape(1, 3), max_val=20,
                           denorm=False)
    np.testing.assert_allclose(back, 0.0, atol=1e-12)
    # round-trip error bounded by half a bucket
    rec = dequantize_flow(dx, dy, max_val=20, denorm=False)
    np.testing.assert_allclose(rec, np.clip(flow, -20, 20), atol=20.0 / 254)


def test_flowwrite_flowread_quantized(tmp_path):
    from bem_tpu.utils.flow_util import flowread, flowwrite

    rng = np.random.default_rng(5)
    flow = (rng.random((8, 6, 2)).astype(np.float32) - 0.5) * 10
    p = str(tmp_path / "f.png")
    flowwrite(flow, p, quantize=True, max_val=20, norm=False)
    rec = flowread(p, quantize=True, max_val=20, denorm=False)
    assert rec.shape == (8, 6, 2) and rec.dtype == np.float32
    np.testing.assert_allclose(rec, flow, atol=20.0 / 254)


def test_augment_flow_semantics():
    from bem_tpu.data.transforms import augment

    rng_img = np.random.default_rng(7)
    img = rng_img.random((6, 8, 3)).astype(np.float32)
    flow = rng_img.random((6, 8, 2)).astype(np.float32)
    # find a seed whose draws give (hflip, vflip, rot90) all True
    seed = next(s for s in range(100)
                if np.all(np.random.default_rng(s).random(3) < 0.5))
    imgs, flows = augment([img], True, True, [flow],
                          rng=np.random.default_rng(seed))
    exp = flow[::-1, ::-1].copy()
    exp[..., 0] = -exp[..., 0]   # hflip negates dx
    exp[..., 1] = -exp[..., 1]   # vflip negates dy
    exp = exp.transpose(1, 0, 2)[:, :, [1, 0]]  # rot90 swaps dx/dy
    np.testing.assert_allclose(flows[0], exp)
    np.testing.assert_allclose(imgs[0], img[::-1, ::-1].transpose(1, 0, 2))


def test_reds_flow_branch(tmp_path):
    root = str(tmp_path)
    _make_clip_tree(root, clips=("001",), frames=6)
    # quantized flows: dx/dy uint8 stacked on axis 0 (2h x w grayscale)
    rng = np.random.default_rng(11)
    for i in range(6):
        for tag in ("p1", "n1"):
            p = os.path.join(root, "flow", "001", f"{i:08d}_{tag}.png")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            cv2.imwrite(p, (rng.random((48, 24)) * 255).astype(np.uint8))
    meta = tmp_path / "meta.txt"
    meta.write_text("001 6 (24,24,3)\n")
    cls = DATASET_REGISTRY.get("REDSDataset")
    ds = cls({"dataroot_gt": os.path.join(root, "gt"),
              "dataroot_lq": os.path.join(root, "lq"),
              "dataroot_flow": os.path.join(root, "flow"),
              "meta_info_file": str(meta), "val_partition": "REDS4",
              "io_backend": {"type": "disk"}, "num_frame": 3, "gt_size": 16,
              "scale": 1, "frames_per_clip": 6, "phase": "train",
              "use_hflip": True, "use_rot": True})
    s = ds[0]
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (16, 16, 3)
    assert s["flow"].shape == (3, 16, 16, 2)  # _p1, zero center, _n1
    np.testing.assert_array_equal(s["flow"][1], 0.0)  # inserted center flow
    assert s["flow"].dtype == np.float32
    assert np.abs(s["flow"][0]).max() <= 20.0


def test_enlarged_sampler_seed_composition():
    """Different manual_seed => different shuffle order; same seed+epoch =>
    identical; different epochs differ (data_sampler.py:38 + worker-seed
    composition the threaded loader otherwise drops)."""
    from bem_tpu.data import EnlargedSampler

    a = EnlargedSampler(100, 1, 0, seed=1)
    b = EnlargedSampler(100, 1, 0, seed=2)
    c = EnlargedSampler(100, 1, 0, seed=1)
    assert list(a) != list(b)
    assert list(a) == list(c)
    a.set_epoch(1)
    c.set_epoch(2)
    assert list(a) != list(c)
