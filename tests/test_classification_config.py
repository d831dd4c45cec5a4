"""Classification-harness config tree + data pipeline
(bem_tpu/classification/{config,data}.py vs basicsr/vmamba/config.py and
vmamba/data/build.py)."""

import os

import numpy as np
import pytest


def test_default_tree_fields():
    from bem_tpu.classification.config import get_config

    c = get_config()
    # spot-check the reference defaults (vmamba/config.py:53-199)
    assert c.DATA.BATCH_SIZE == 128
    assert c.DATA.IMG_SIZE == 224
    assert c.MODEL.VSSM.DEPTHS == [2, 2, 9, 2]
    assert c.MODEL.VSSM.SSM_D_STATE == 16
    assert c.MODEL.VSSM.SSM_FORWARDTYPE == "v2"
    assert c.TRAIN.BASE_LR == 5e-4
    assert c.TRAIN.LR_SCHEDULER.NAME == "cosine"
    assert c.AUG.AUTO_AUGMENT == "rand-m9-mstd0.5-inc1"
    assert c.TEST.CROP is True


def test_merge_from_file_and_base(tmp_path):
    from bem_tpu.classification.config import CfgNode, get_config, _update_config_from_file

    base = tmp_path / "base.yaml"
    base.write_text("TRAIN:\n  EPOCHS: 100\nMODEL:\n  NAME: base_model\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        "BASE: ['base.yaml']\nMODEL:\n  VSSM:\n    DEPTHS: [2, 2, 4, 2]\n")
    c = get_config()
    _update_config_from_file(c, str(child))
    assert c.TRAIN.EPOCHS == 100          # from BASE
    assert c.MODEL.NAME == "base_model"   # from BASE
    assert c.MODEL.VSSM.DEPTHS == [2, 2, 4, 2]  # child override
    assert c.TRAIN.BASE_LR == 5e-4        # untouched default


def test_merge_from_list_and_freeze():
    from bem_tpu.classification.config import get_config

    c = get_config()
    c.merge_from_list(["TRAIN.BASE_LR", "1e-3", "DATA.BATCH_SIZE", "64",
                       "MODEL.VSSM.GMLP", "true"])
    assert c.TRAIN.BASE_LR == 1e-3
    assert c.DATA.BATCH_SIZE == 64
    assert c.MODEL.VSSM.GMLP is True
    c.freeze()
    with pytest.raises(AttributeError):
        c.TRAIN.EPOCHS = 5
    c.defrost()
    c.TRAIN.EPOCHS = 5
    assert c.TRAIN.EPOCHS == 5


def test_reference_yaml_parses():
    """A shipped reference experiment yaml must merge cleanly."""
    ref = "/root/reference/basicsr/vmamba/configs/vssm/vmambav2_tiny_224.yaml"
    if not os.path.isfile(ref):
        pytest.skip("reference config unavailable")
    from bem_tpu.classification.config import get_config, _update_config_from_file

    c = get_config()
    _update_config_from_file(c, ref)
    assert c.MODEL.TYPE == "vssm"


def test_build_model_from_config_tiny():
    from bem_tpu.classification.config import get_config
    from bem_tpu.classification.train import build_model_from_config

    c = get_config()
    c.MODEL.VSSM.DEPTHS = [1, 1]
    c.MODEL.VSSM.EMBED_DIM = 16
    c.MODEL.NUM_CLASSES = 10
    c.DATA.IMG_SIZE = 32
    m = build_model_from_config(c)
    assert m.depths == (1, 1)
    assert m.num_classes == 10


def test_imagefolder_loader(tmp_path):
    import cv2

    from bem_tpu.classification.config import get_config
    from bem_tpu.classification.data import build_loader

    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("val", 2)):
        for cls in ("n01", "n02"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.png"), img)

    c = get_config()
    c.DATA.DATA_PATH = str(tmp_path)
    c.DATA.IMG_SIZE = 32
    c.DATA.BATCH_SIZE = 2
    c.AUG.REPROB = 0.5
    ds_t, ds_v, lt, lv, mixup = build_loader(c)
    assert len(ds_t) == 6 and len(ds_v) == 4
    assert mixup is True
    imgs, labels = next(iter(lt))
    assert imgs.shape == (2, 32, 32, 3) and imgs.dtype == np.float32
    assert labels.shape == (2,)
    # eval path: resize + center crop + normalize
    imgs_v, labels_v = next(iter(lv))
    assert imgs_v.shape == (2, 32, 32, 3)
    # normalized values should be roughly centered
    assert abs(float(imgs_v.mean())) < 3.0
    # epoch-seeded shuffling changes order
    lt.set_epoch(0)
    first0 = next(iter(lt))[1]
    lt.set_epoch(1)
    first1 = next(iter(lt))[1]
    lt.set_epoch(0)
    again0 = next(iter(lt))[1]
    assert np.array_equal(first0, again0)
