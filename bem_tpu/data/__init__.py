"""Data pipeline: datasets, sampler, loader, prefetchers.

Reference: basicsr/data/__init__.py (build_dataset:25, build_dataloader:40,
worker_init_fn:97), data_sampler.py (EnlargedSampler:6), and
prefetch_dataloader.py (CPUPrefetcher:61, CUDAPrefetcher:82).

TPU-native design: no fork'd worker processes — cv2 decode releases the GIL,
so a thread pool keeps the single host core busy while JAX runs the step on
the TPU; the DevicePrefetcher double-buffers ``jax.device_put`` so H2D copy
overlaps compute (the CUDAPrefetcher's side-stream equivalent).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ..utils.registry import DATASET_REGISTRY
from . import paired_image_dataset  # noqa: F401
from . import single_image_dataset  # noqa: F401
from . import realesrgan_paired_dataset  # noqa: F401
from . import gaussian_denoising_dataset  # noqa: F401
from . import realesrgan_dataset  # noqa: F401
from . import video_datasets  # noqa: F401
from . import sid_image_dataset  # noqa: F401

__all__ = ["build_dataset", "build_dataloader", "EnlargedSampler", "DataLoader",
           "CPUPrefetcher", "DevicePrefetcher"]


def build_dataset(dataset_opt: Dict[str, Any]):
    dataset_opt = dict(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
    return dataset


class EnlargedSampler:
    """Per-rank strided indices with dataset-enlarge ratio and epoch-seeded
    shuffle (data_sampler.py:6-48)."""

    def __init__(self, num_samples: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 1, seed: int = 0):
        self.dataset_len = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        # compose the experiment seed with the epoch: the reference seeds its
        # generator with the epoch alone (data_sampler.py:38) but re-injects
        # manual_seed through torch worker seeding, which the threaded loader
        # has no equivalent of — composing here keeps seed sweeps independent
        self.seed = seed or 0
        self.num_samples = int(np.ceil(num_samples * ratio / num_replicas))
        self.total_size = self.num_samples * num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        g = np.random.default_rng((self.seed, self.epoch))
        indices = g.permutation(self.total_size).tolist()
        indices = [i % self.dataset_len for i in indices]
        return iter(indices[self.rank : self.total_size : self.num_replicas])

    def __len__(self):
        return self.num_samples


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Minimal threaded map-style loader yielding stacked-numpy batches."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 sampler: Optional[EnlargedSampler] = None, num_workers: int = 0,
                 drop_last: bool = False, seed: Optional[int] = None,
                 prefetch_batches: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self._epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = np.random.default_rng(
                None if self.seed is None else self.seed + self._epoch
            )
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.num_workers <= 0:
            for b in batches:
                yield _collate([self.dataset[i] for i in b])
            return
        # threaded pipeline: decode-ahead of the consumer
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = queue.Queue()
            depth = max(1, self.prefetch_batches)

            def submit(b):
                pending.put([pool.submit(self.dataset.__getitem__, i) for i in b])

            it = iter(batches)
            for _ in range(depth):
                b = next(it, None)
                if b is not None:
                    submit(b)
            while not pending.empty():
                futs = pending.get()
                b = next(it, None)
                if b is not None:
                    submit(b)
                yield _collate([f.result() for f in futs])


def build_dataloader(dataset, dataset_opt: Dict[str, Any], num_gpu: int = 1,
                     dist: bool = False, sampler=None, seed=None) -> DataLoader:
    """Phase-aware loader construction (data/__init__.py:40-94): train uses
    batch_size_per_gpu (batch stays whole per host; the mesh shards it),
    val uses batch 1 / no workers."""
    phase = dataset_opt["phase"]
    if phase == "train":
        batch_size = dataset_opt.get("batch_size_per_gpu", 1) * max(num_gpu, 1)
        num_workers = dataset_opt.get("num_worker_per_gpu", 0)
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=(sampler is None) and dataset_opt.get("use_shuffle", True),
            sampler=sampler,
            num_workers=num_workers,
            drop_last=True,
            seed=seed,
        )
    elif phase in ("val", "test"):
        return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=0)
    raise ValueError(f"Wrong dataset phase: {phase}")


class CPUPrefetcher:
    """Re-startable iterator facade (prefetch_dataloader.py:61-79)."""

    def __init__(self, loader: DataLoader):
        self.ori_loader = loader
        self.loader = iter(loader)

    def next(self):
        try:
            return next(self.loader)
        except StopIteration:
            return None

    def reset(self):
        self.loader = iter(self.ori_loader)


class DevicePrefetcher:
    """Double-buffered device_put — H2D overlaps compute
    (CUDAPrefetcher parity, prefetch_dataloader.py:82-122)."""

    def __init__(self, loader: DataLoader, sharding=None):
        import jax

        self._jax = jax
        self.ori_loader = loader
        self.sharding = sharding
        self.reset()

    def _put(self, batch):
        if batch is None:
            return None
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = (
                    self._jax.device_put(v, self.sharding)
                    if self.sharding is not None
                    else self._jax.device_put(v)
                )
            else:
                out[k] = v
        return out

    def next(self):
        current = self.batch
        self.batch = self._put(next(self.loader, None))
        return current

    def reset(self):
        self.loader = iter(self.ori_loader)
        self.batch = self._put(next(self.loader, None))
