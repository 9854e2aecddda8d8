"""Host-side image loading feeding the device pipeline.

Replaces the reference's torch DataLoader + worker processes (reference
``datasets/make_dataloader_uniprompt.py:52-118``) with a thread-pooled PIL
decode/resize stage producing uint8 numpy batches; all stochastic
augmentation happens on-device (ops/augment.py). The factory returns the
reference's loader contract:

    make_dataloader(cfg) → (train_loader_stage2, train_loader_stage1,
                            val_loader, num_query, num_classes,
                            camera_num, view_num)

Batch layout: dicts of numpy arrays — ``images`` uint8 (B,H,W,3), ``pids``,
``camids``, ``trackids`` int32, ``paths`` list, plus ``count`` (valid rows;
the final batch of an epoch is zero-padded to full batch size so every step
reuses one compiled program).

Image read resilience: the reference retries IOErrors forever
(``datasets/bases.py:10-23``); here a corrupt/missing file logs once and
yields a black image instead of hanging the epoch.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image, ImageFile

from .base import ReIDDataset, Record
from .datasets import build_dataset
from .sampler import RandomIdentitySampler

ImageFile.LOAD_TRUNCATED_IMAGES = True
logger = logging.getLogger("mpreid_tpu.data")


def decode_resize(path: str, size_hw) -> np.ndarray:
    """PIL decode + bicubic resize to (h, w) → uint8 (h, w, 3).

    Bicubic matches the reference's ``T.Resize(..., interpolation=3)``
    (make_dataloader.py:47).
    """
    h, w = size_hw
    try:
        img = Image.open(path).convert("RGB")
        img = img.resize((w, h), Image.BICUBIC)
        return np.asarray(img, dtype=np.uint8)
    except (OSError, ValueError) as e:
        logger.warning("Failed to read %s (%s); substituting zeros", path, e)
        return np.zeros((h, w, 3), np.uint8)


class ImageBatcher:
    """Threaded decode of record batches into fixed-size numpy batches."""

    def __init__(self, records: Sequence[Record], size_hw, batch_size: int,
                 num_workers: int = 8, cache=False, native="auto"):
        self.records = list(records)
        self.size_hw = tuple(size_hw)
        self.batch_size = batch_size
        # Native batch decode (mpreid_tpu/native/imageio.cpp): one C call
        # decodes+resizes the whole batch under OpenMP, byte-identical to
        # the PIL path (enforced by the library's load-time self-check).
        # 'auto' → use it whenever it builds and self-checks on this host.
        if native == "auto":
            from mpreid_tpu.native.imageio import native_imageio_available

            self._native = native_imageio_available()
        else:
            self._native = bool(native)
            if self._native:
                from mpreid_tpu.native.imageio import native_imageio_available

                if not native_imageio_available():
                    logger.warning(
                        "DATALOADER.NATIVE_DECODE requested but the native "
                        "imageio library is unavailable; using the PIL path"
                    )
                    self._native = False
        # Two pools: decode workers (created lazily — the native path never
        # uses them), plus a dedicated prefetch thread that assembles batches
        # (a single shared pool would deadlock — batch tasks would wait on
        # decode tasks queued behind them).
        self._num_workers = max(1, num_workers)
        self._pool: Optional[ThreadPoolExecutor] = None
        self.prefetcher = ThreadPoolExecutor(max_workers=1)
        # Optional decoded-uint8 cache: each image is decoded exactly once
        # and kept in RAM (Market-1501 train at 256×128 ≈ 1.2 GB). Removes
        # the JPEG-decode bottleneck from every epoch after the first. Pass a
        # dict to share one cache between batchers over the same records.
        if isinstance(cache, dict):
            self._cache: Optional[dict] = cache
        else:
            self._cache = {} if cache else None

    def _cache_key(self, path: str):
        # keyed by (path, size): the dict is shared between batchers whose
        # target sizes may differ (train vs val pipelines)
        return (path, self.size_hw)

    def _decode(self, rec: Record) -> np.ndarray:
        if self._cache is not None:
            hit = self._cache.get(self._cache_key(rec[0]))
            if hit is not None:
                return hit
        img = decode_resize(rec[0], self.size_hw)
        if self._cache is not None:
            self._cache[self._cache_key(rec[0])] = img
        return img

    def __len__(self):
        return (len(self.records) + self.batch_size - 1) // self.batch_size

    def _decode_batch_native(self, recs: Sequence[Record]) -> list:
        from mpreid_tpu.native.imageio import decode_resize_batch_native

        images: list = [None] * len(recs)
        miss = []
        for i, r in enumerate(recs):
            hit = (self._cache.get(self._cache_key(r[0]))
                   if self._cache is not None else None)
            if hit is None:
                miss.append(i)
            else:
                images[i] = hit
        if miss:
            batch, status = decode_resize_batch_native(
                [recs[i][0] for i in miss], self.size_hw
            )
            for j, i in enumerate(miss):
                if status[j] == 0:
                    # copy the row out of the batch buffer: caching the view
                    # would pin the whole (N,H,W,3) allocation per hit and
                    # share writable memory with the returned batch
                    img = np.array(batch[j]) if self._cache is not None \
                        else batch[j]
                else:
                    # per-image PIL fallback (unsupported format / IO error)
                    img = decode_resize(recs[i][0], self.size_hw)
                images[i] = img
                if self._cache is not None:
                    self._cache[self._cache_key(recs[i][0])] = img
        return images

    @property
    def pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self._num_workers)
        return self._pool

    def decode_records(self, recs: Sequence[Record]) -> list:
        """Decode arbitrary records via whichever path is active (native
        batch decode or PIL thread pool) — the one entry point callers
        outside this class should use."""
        if self._native:
            return self._decode_batch_native(recs)
        return list(self.pool.map(self._decode, recs))

    def _load_batch(self, indices: Sequence[int]) -> Dict:
        recs = [self.records[i] for i in indices]
        images = self.decode_records(recs)
        count = len(recs)
        pad = self.batch_size - count
        if pad:
            images.extend([np.zeros((*self.size_hw, 3), np.uint8)] * pad)
            recs = recs + [recs[-1]] * pad
        return {
            "images": np.stack(images),
            "pids": np.asarray([r[1] for r in recs], np.int32),
            "camids": np.asarray([r[2] for r in recs], np.int32),
            "trackids": np.asarray([r[3] for r in recs], np.int32),
            "paths": [r[0] for r in recs],
            "count": count,
        }

    def iter_indices(self, order: Sequence[int], drop_last: bool = False) -> Iterator[Dict]:
        n = len(order)
        stop = n - n % self.batch_size if drop_last else n
        starts = list(range(0, stop, self.batch_size))
        if not starts:
            return
        # one-batch-ahead prefetch on a dedicated thread
        future = self.prefetcher.submit(
            self._load_batch, order[starts[0] : starts[0] + self.batch_size]
        )
        for i in range(len(starts)):
            current = future
            if i + 1 < len(starts):
                s2 = starts[i + 1]
                future = self.prefetcher.submit(
                    self._load_batch, order[s2 : s2 + self.batch_size]
                )
            yield current.result()

    def iter_sequential(self, drop_last: bool = False) -> Iterator[Dict]:
        return self.iter_indices(np.arange(len(self.records)), drop_last)

    def iter_shuffled(self, seed: int, epoch: int, drop_last: bool = True) -> Iterator[Dict]:
        rng = np.random.default_rng(seed + epoch)
        return self.iter_indices(rng.permutation(len(self.records)), drop_last)


class TrainLoader:
    """PK-sampled epoch iterator (train_loader_stage2 equivalent)."""

    def __init__(self, batcher: ImageBatcher, sampler: RandomIdentitySampler):
        self.batcher = batcher
        self.sampler = sampler

    def epoch(self, epoch_idx: int) -> Iterator[Dict]:
        return self.batcher.iter_indices(self.sampler.epoch_indices(epoch_idx), drop_last=True)

    def __len__(self):
        return len(self.sampler) // self.batcher.batch_size


class ShuffledLoader:
    """Shuffled full-dataset iterator (train_loader_stage1 equivalent)."""

    def __init__(self, batcher: ImageBatcher, seed: int):
        self.batcher = batcher
        self.seed = seed

    def epoch(self, epoch_idx: int, drop_last: bool = False) -> Iterator[Dict]:
        return self.batcher.iter_shuffled(self.seed, epoch_idx, drop_last)

    def __len__(self):
        return len(self.batcher)


def make_dataloader(cfg, dataset: Optional[ReIDDataset] = None):
    """Reference make_dataloader contract (make_dataloader_uniprompt.py:52-118)."""
    if dataset is None:
        kwargs = {}
        name = cfg.DATASETS.NAMES
        if name in ("mmmp", "sysu", "regdb", "agreidv2"):
            kwargs["exp_setting"] = cfg.DATASETS.EXP_SETTING
        # deterministic eval splits (the reference seeds the global RNG in
        # its entry scripts; here the seed is threaded explicitly)
        if name == "mmmp":
            kwargs["split_seed"] = cfg.SOLVER.SEED
        if name == "VehicleID":
            kwargs["seed"] = cfg.SOLVER.SEED
        dataset = build_dataset(name, cfg.DATASETS.ROOT_DIR, **kwargs)

    num_workers = cfg.DATALOADER.NUM_WORKERS
    size_train = tuple(cfg.INPUT.SIZE_TRAIN)
    size_test = tuple(cfg.INPUT.SIZE_TEST)

    stage2_bs = cfg.SOLVER.STAGE2.IMS_PER_BATCH
    stage1_bs = cfg.SOLVER.STAGE1.IMS_PER_BATCH

    # one shared decode cache for both train batchers (same records/size)
    cache = {} if getattr(cfg.DATALOADER, "CACHE_IMAGES", False) else False
    native = getattr(cfg.DATALOADER, "NATIVE_DECODE", "auto")
    train_batcher = ImageBatcher(dataset.train, size_train, stage2_bs, num_workers,
                                 cache=cache, native=native)
    if "triplet" in cfg.DATALOADER.SAMPLER:
        sampler = RandomIdentitySampler(
            dataset.train, stage2_bs, cfg.DATALOADER.NUM_INSTANCE, seed=cfg.SOLVER.SEED
        )
        train_loader_stage2 = TrainLoader(train_batcher, sampler)
    elif cfg.DATALOADER.SAMPLER == "softmax":
        train_loader_stage2 = ShuffledLoader(train_batcher, cfg.SOLVER.SEED)
    else:
        raise ValueError(f"unsupported sampler {cfg.DATALOADER.SAMPLER!r}")

    stage1_batcher = ImageBatcher(dataset.train, size_train, stage1_bs, num_workers,
                                  cache=cache, native=native)
    train_loader_stage1 = ShuffledLoader(stage1_batcher, cfg.SOLVER.SEED)

    val_records = list(dataset.query) + list(dataset.gallery)
    val_loader = ImageBatcher(val_records, size_test, cfg.TEST.IMS_PER_BATCH,
                              num_workers, cache=cache, native=native)

    return (
        train_loader_stage2,
        train_loader_stage1,
        val_loader,
        len(dataset.query),
        dataset.num_train_pids,
        dataset.num_train_cams,
        dataset.num_train_vids,
    )
