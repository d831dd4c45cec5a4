"""ImageNet-style loaders for the classification harness.

Reference: basicsr/vmamba/data/build.py (build_loader/build_dataset/
build_transform, timm-based) + cached_image_folder.py + samplers.py.
TPU-native differences:

- decode/augment runs in numpy/cv2 worker threads (no torchvision/timm);
  batches are NHWC float32 numpy, normalized with the ImageNet mean/std —
  ready for jax.device_put.
- SubsetRandomSampler (samplers.py:7-29) semantics come from the shard
  argument: each process shuffles its deterministic shard per epoch.
- timm's RandAugment policy is approximated by a compact policy over the
  same operation family (shear/translate/rotate/color/contrast/brightness/
  sharpness/posterize/solarize/equalize/autocontrast, magnitude 9, 2 ops);
  COVERAGE.md lists it as a variant, not bit-parity.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_DEFAULT_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_DEFAULT_STD = np.array([0.229, 0.224, 0.225], np.float32)

_INTERP = {
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "random": cv2.INTER_LINEAR,  # resolved per-sample in the transform
    "nearest": cv2.INTER_NEAREST,
}

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG")


def find_classes(root: str) -> Tuple[List[str], dict]:
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    return classes, {c: i for i, c in enumerate(classes)}


class ImageFolderDataset:
    """ImageFolder: root/<class>/<img> (cached_image_folder.py ImageNet
    layout with prefix train/val)."""

    def __init__(self, root: str, transform=None):
        self.root = root
        self.transform = transform
        self.classes, class_to_idx = find_classes(root)
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            d = os.path.join(root, c)
            for fn in sorted(os.listdir(d)):
                if fn.endswith(IMG_EXTS):
                    self.samples.append((os.path.join(d, fn), class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, label = self.samples[idx]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = img[:, :, ::-1]  # BGR -> RGB
        if self.transform is not None:
            img = self.transform(img)
        return img, label


# ---------------------------------------------------------------------------
# Transforms (build_transform, vmamba/data/build.py:125-162)
# ---------------------------------------------------------------------------


def _random_resized_crop(img, size, interp, scale=(0.08, 1.0),
                         ratio=(3 / 4, 4 / 3)):
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = random.uniform(*scale) * area
        ar = np.exp(random.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target_area * ar)))
        ch = int(round(np.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            y = random.randint(0, h - ch)
            x = random.randint(0, w - cw)
            crop = img[y : y + ch, x : x + cw]
            return cv2.resize(crop, (size, size), interpolation=interp)
    # fallback: center crop
    m = min(h, w)
    y, x = (h - m) // 2, (w - m) // 2
    return cv2.resize(img[y : y + m, x : x + m], (size, size),
                      interpolation=interp)


def _color_jitter(img, strength):
    f = img.astype(np.float32)
    if random.random() < 0.8:
        # brightness / contrast / saturation jitter in random order
        for op in random.sample(("b", "c", "s"), 3):
            v = 1.0 + random.uniform(-strength, strength)
            if op == "b":
                f = f * v
            elif op == "c":
                f = (f - f.mean()) * v + f.mean()
            else:
                g = f.mean(axis=2, keepdims=True)
                f = g + (f - g) * v
    return np.clip(f, 0, 255).astype(np.uint8)


def _rand_augment(img, magnitude=9, num_ops=2):
    """Compact RandAugment over the standard op family."""
    m = magnitude / 30.0
    h, w = img.shape[:2]

    def shear_x(x):
        M = np.float32([[1, random.choice([-1, 1]) * m, 0], [0, 1, 0]])
        return cv2.warpAffine(x, M, (w, h), borderValue=(128, 128, 128))

    def shear_y(x):
        M = np.float32([[1, 0, 0], [random.choice([-1, 1]) * m, 1, 0]])
        return cv2.warpAffine(x, M, (w, h), borderValue=(128, 128, 128))

    def trans_x(x):
        M = np.float32([[1, 0, random.choice([-1, 1]) * m * w / 3], [0, 1, 0]])
        return cv2.warpAffine(x, M, (w, h), borderValue=(128, 128, 128))

    def trans_y(x):
        M = np.float32([[1, 0, 0], [0, 1, random.choice([-1, 1]) * m * h / 3]])
        return cv2.warpAffine(x, M, (w, h), borderValue=(128, 128, 128))

    def rotate(x):
        M = cv2.getRotationMatrix2D((w / 2, h / 2),
                                    random.choice([-1, 1]) * m * 30, 1.0)
        return cv2.warpAffine(x, M, (w, h), borderValue=(128, 128, 128))

    def auto_contrast(x):
        f = x.astype(np.float32)
        lo, hi = f.min(axis=(0, 1)), f.max(axis=(0, 1))
        return np.clip((f - lo) * 255.0 / np.maximum(hi - lo, 1), 0,
                       255).astype(np.uint8)

    def equalize(x):
        return np.stack([cv2.equalizeHist(x[..., c]) for c in range(3)], -1)

    def solarize(x):
        t = 256 - int(m * 256)
        return np.where(x < t, x, 255 - x).astype(np.uint8)

    def posterize(x):
        bits = max(1, 8 - int(m * 4))
        return (x >> (8 - bits)) << (8 - bits)

    def contrast(x):
        f = x.astype(np.float32)
        return np.clip((f - f.mean()) * (1 + m) + f.mean(), 0,
                       255).astype(np.uint8)

    def brightness(x):
        return np.clip(x.astype(np.float32) * (1 + m), 0, 255).astype(np.uint8)

    def sharpness(x):
        blur = cv2.GaussianBlur(x, (3, 3), 0)
        f = x.astype(np.float32) * (1 + m) - blur.astype(np.float32) * m
        return np.clip(f, 0, 255).astype(np.uint8)

    ops = [shear_x, shear_y, trans_x, trans_y, rotate, auto_contrast,
           equalize, solarize, posterize, contrast, brightness, sharpness]
    for op in random.sample(ops, num_ops):
        img = op(img)
    return img


def _random_erasing(img, prob, mode="pixel"):
    if random.random() >= prob:
        return img
    h, w = img.shape[:2]
    for _ in range(10):
        area = random.uniform(0.02, 1 / 3) * h * w
        ar = np.exp(random.uniform(np.log(0.3), np.log(1 / 0.3)))
        eh, ew = int(round(np.sqrt(area / ar))), int(round(np.sqrt(area * ar)))
        if eh < h and ew < w:
            y, x = random.randint(0, h - eh), random.randint(0, w - ew)
            if mode == "pixel":
                img[y : y + eh, x : x + ew] = np.random.normal(
                    0, 1, (eh, ew, img.shape[2]))
            else:
                img[y : y + eh, x : x + ew] = 0
            return img
    return img


def build_transform(is_train: bool, config):
    """Returns uint8 RGB HWC -> float32 normalized HWC."""
    size = config.DATA.IMG_SIZE
    interp_name = config.DATA.INTERPOLATION

    def interp():
        if interp_name == "random":
            return random.choice([cv2.INTER_LINEAR, cv2.INTER_CUBIC])
        return _INTERP[interp_name]

    def normalize(img_u8):
        f = img_u8.astype(np.float32) / 255.0
        return (f - IMAGENET_DEFAULT_MEAN) / IMAGENET_DEFAULT_STD

    if is_train:
        def tf(img):
            img = _random_resized_crop(img, size, interp())
            if random.random() < 0.5:
                img = img[:, ::-1]
            if config.AUG.AUTO_AUGMENT:
                img = _rand_augment(np.ascontiguousarray(img))
            elif config.AUG.COLOR_JITTER:
                img = _color_jitter(img, config.AUG.COLOR_JITTER)
            out = normalize(img)
            if config.AUG.REPROB > 0:
                out = _random_erasing(out, config.AUG.REPROB,
                                      config.AUG.REMODE)
            return out

        return tf

    crop = config.TEST.CROP

    def tf_eval(img):
        if crop:
            rs = int(size / 0.875)  # DEFAULT_CROP_PCT resize then center crop
            h, w = img.shape[:2]
            s = rs / min(h, w)
            img = cv2.resize(img, (int(round(w * s)), int(round(h * s))),
                             interpolation=_INTERP.get(interp_name,
                                                       cv2.INTER_CUBIC))
            h, w = img.shape[:2]
            y, x = (h - size) // 2, (w - size) // 2
            img = img[y : y + size, x : x + size]
        else:
            img = cv2.resize(img, (size, size),
                             interpolation=_INTERP.get(interp_name,
                                                       cv2.INTER_CUBIC))
        return normalize(img)

    return tf_eval


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


class ShardedBatchLoader:
    """Per-process deterministic shard + epoch-seeded shuffle
    (vmamba/data/samplers.py SubsetRandomSampler + indices[rank::world])."""

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 rank: int = 0, world_size: int = 1, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(range(self.rank, len(self.dataset), self.world_size))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = np.arange(self.rank, len(self.dataset), self.world_size)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        batch_imgs, batch_labels = [], []
        for i in idx:
            img, label = self.dataset[int(i)]
            batch_imgs.append(img)
            batch_labels.append(label)
            if len(batch_imgs) == self.batch_size:
                yield (np.stack(batch_imgs).astype(np.float32),
                       np.asarray(batch_labels, np.int32))
                batch_imgs, batch_labels = [], []
        if batch_imgs and not self.drop_last:
            yield (np.stack(batch_imgs).astype(np.float32),
                   np.asarray(batch_labels, np.int32))


def build_dataset(is_train: bool, config):
    transform = build_transform(is_train, config)
    if config.DATA.DATASET != "imagenet":
        raise NotImplementedError(config.DATA.DATASET)
    prefix = "train" if is_train else "val"
    root = os.path.join(config.DATA.DATA_PATH, prefix)
    ds = ImageFolderDataset(root, transform)
    return ds, 1000


def build_loader(config, rank: int = 0, world_size: int = 1):
    """(dataset_train, dataset_val, loader_train, loader_val, mixup_active)
    mirroring vmamba/data/build.py:44-96 minus the torch plumbing."""
    ds_train, _ = build_dataset(True, config)
    ds_val, _ = build_dataset(False, config)
    lt = ShardedBatchLoader(ds_train, config.DATA.BATCH_SIZE, True,
                            rank, world_size, config.SEED)
    lv = ShardedBatchLoader(
        ds_val, config.DATA.BATCH_SIZE,
        shuffle=bool(config.TEST.SHUFFLE),
        rank=rank if config.TEST.SEQUENTIAL else 0,
        world_size=world_size if config.TEST.SEQUENTIAL else 1,
        drop_last=False)
    mixup_active = (config.AUG.MIXUP > 0 or config.AUG.CUTMIX > 0
                    or config.AUG.CUTMIX_MINMAX is not None)
    return ds_train, ds_val, lt, lv, mixup_active
