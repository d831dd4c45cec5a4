"""Classification harness end-to-end smoke: really TRAIN on a tiny synthetic
ImageNet-shaped folder (3 classes x 4 images, 2 epochs) and validate —
converting the parse-tested loop (classification/train.py) into a run-tested
one (reference: basicsr/vmamba/classification/main.py train loop)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _make_imagenet_tree(root):
    rng = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        for ci, cls in enumerate(["n01", "n02", "n03"]):
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                # class-dependent mean so 2 epochs can beat chance
                img = np.clip(
                    rng.normal(60 + 60 * ci, 25, (40, 40, 3)), 0, 255
                ).astype(np.uint8)
                cv2.imwrite(os.path.join(d, f"img_{i}.jpeg"), img)


def test_classification_train_loop_runs(tmp_path):
    from bem_tpu.classification.config import get_config
    from bem_tpu.classification.data import build_loader
    from bem_tpu.classification.train import (build_model_from_config,
                                              make_trainer, train_one_epoch,
                                              validate)

    root = str(tmp_path / "imagenet")
    _make_imagenet_tree(root)

    c = get_config()
    c.defrost()
    c.DATA.DATA_PATH = root
    c.DATA.BATCH_SIZE = 4
    c.DATA.IMG_SIZE = 32
    c.DATA.DATASET = "imagenet"
    c.MODEL.NUM_CLASSES = 3
    c.MODEL.VSSM.EMBED_DIM = 16
    c.MODEL.VSSM.DEPTHS = [1, 1]
    c.MODEL.VSSM.SSM_D_STATE = 4
    c.MODEL.VSSM.SSM_RATIO = 1.0
    c.AUG.MIXUP = 0.0
    c.AUG.CUTMIX = 0.0
    c.AUG.AUTO_AUGMENT = "none"
    c.AUG.REPROB = 0.0
    c.TRAIN.EPOCHS = 2
    c.TRAIN.WARMUP_EPOCHS = 0
    c.TRAIN.BASE_LR = 1e-3

    model = build_model_from_config(c)
    ds_train, ds_val, lt, lv, mixup_active = build_loader(c)
    assert len(ds_train) == 12 and len(ds_val) == 6
    assert not mixup_active

    example = np.zeros((1, 32, 32, 3), np.float32)
    steps = max(len(lt), 1)
    state, train_step, eval_step = make_trainer(
        model, example, total_steps=2 * steps, base_lr=c.TRAIN.BASE_LR,
        warmup_steps=0, weight_decay=c.TRAIN.WEIGHT_DECAY,
        label_smoothing=c.MODEL.LABEL_SMOOTHING, seed=0)

    losses = []
    for epoch in range(2):
        lt.set_epoch(epoch)
        state, loss = train_one_epoch(state, train_step, lt)
        losses.append(float(loss))
    t1, t5 = validate(state.params, eval_step, lv)

    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] + 0.5  # training is not diverging
    assert 0.0 <= t1 <= 1.0 and t1 <= t5 <= 1.0
