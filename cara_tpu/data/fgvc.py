"""FGVC benchmark suite loaders (CUB-200, Stanford Cars, Oxford Flowers...).

The reference paper evaluates CaRA on FGVC (``README.rst:48``) but the repo
ships **no FGVC loader** (SURVEY.md section 2.3) — this module is the new
work BASELINE.json's configs call for.  Protocol follows the common FGVC
fine-tuning setup (VPT/NOAH-style splits): file lists ``train.txt`` /
``test.txt`` under ``<root>/<task>/`` in the same ``impath label`` format as
VTAB, full train split, standard augmentation (random resized crop + flip)
for training and center-crop-free 224 resize for eval.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from cara_tpu.data.vtab import (
    BatchLoader,
    FileListSource,
    normalize,
    synthetic_source,
)

FGVC_TASKS: Dict[str, int] = {
    "cub2011": 200,
    "nabirds": 555,
    "oxford_flowers": 102,
    "stanford_dogs": 120,
    "stanford_cars": 196,
}


def get_classes_num(task: str) -> int:
    return FGVC_TASKS[task]


def _augment_decode_pil(path: str, size: int, rng: np.random.RandomState):
    """Train-time augmentation: random resized crop (scale 0.08-1.0, standard
    torchvision parameters) + horizontal flip, bicubic."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        area = w * h
        for _ in range(10):
            target = rng.uniform(0.08, 1.0) * area
            ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * ar)))
            ch = int(round(np.sqrt(target / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = rng.randint(0, w - cw + 1)
                y0 = rng.randint(0, h - ch + 1)
                im = im.crop((x0, y0, x0 + cw, y0 + ch))
                break
        else:
            # torchvision get_params fallback: ratio-clamped center crop
            # (not the full image) for extreme-aspect inputs.
            in_ratio = w / h
            if in_ratio < 3 / 4:
                cw, ch = w, int(round(w / (3 / 4)))
            elif in_ratio > 4 / 3:
                cw, ch = int(round(h * (4 / 3))), h
            else:
                cw, ch = w, h
            x0, y0 = (w - cw) // 2, (h - ch) // 2
            im = im.crop((x0, y0, x0 + cw, y0 + ch))
        im = im.resize((size, size), Image.BICUBIC)
        arr = np.asarray(im, np.float32) / 255.0
    if rng.rand() < 0.5:
        arr = arr[:, ::-1]
    return np.ascontiguousarray(arr)


class AugmentedFileListSource(FileListSource):
    """FileListSource with train-time augmentation.

    ``backend="auto"`` uses the native C++ RRC path (crop sampled in C++,
    PIL-parity bicubic, flip + normalize fused — one call per batch);
    PIL is the fallback, same distribution.
    """

    def __init__(self, root, flist, image_size=224, num_workers=8, seed=0,
                 backend: str = "auto"):
        if backend not in ("auto", "pil", "native"):
            raise ValueError(f"unknown backend {backend!r} "
                             "(expected auto|pil|native)")
        super().__init__(root, flist, image_size, num_workers, backend=backend)
        self._rng = np.random.RandomState(seed)
        self._lock = __import__("threading").Lock()

    def load(self, idx: int) -> np.ndarray:
        path = os.path.join(self.root, self.items[idx][0])
        with self._lock:
            # Hand each decode its own derived seed; decode work happens
            # outside the lock in the thread pool.
            if self._native is not None:
                seed = np.uint64(self._rng.randint(2 ** 63))
            else:
                child = np.random.RandomState(self._rng.randint(2 ** 31))
        if self._native is not None:
            return self._native.decode_batch_rrc(
                [path], np.asarray([seed], np.uint64))[0]
        return normalize(_augment_decode_pil(path, self.image_size, child))

    def load_batch(self, indices) -> np.ndarray:
        if self._native is None:
            raise AttributeError("no native batch path")
        paths = [os.path.join(self.root, self.items[i][0]) for i in indices]
        with self._lock:
            seeds = self._rng.randint(
                2 ** 63, size=len(paths)).astype(np.uint64)
        return self._native.decode_batch_rrc(paths, seeds)


def get_data(
    task: str,
    root: str = "./data/fgvc",
    batch_size: int = 64,
    eval_batch_size: int = 256,
    image_size: int = 224,
    seed: int = 0,
    num_workers: int = 8,
    augment: bool = True,
    synthetic: bool = False,
    synthetic_size: int = 1000,
) -> Tuple[BatchLoader, BatchLoader]:
    ncls = get_classes_num(task)
    if synthetic:
        train_src = synthetic_source(synthetic_size, ncls, image_size, seed)
        test_src = synthetic_source(
            max(synthetic_size // 4, eval_batch_size), ncls, image_size,
            seed + 1)
    else:
        tdir = os.path.join(root, task)
        cls = AugmentedFileListSource if augment else FileListSource
        train_src = cls(tdir, os.path.join(tdir, "train.txt"), image_size,
                        num_workers)
        test_src = FileListSource(
            tdir, os.path.join(tdir, "test.txt"), image_size, num_workers)
    train = BatchLoader(train_src, batch_size, train=True, seed=seed,
                        num_workers=num_workers)
    test = BatchLoader(test_src, eval_batch_size, train=False, seed=seed,
                       num_workers=num_workers)
    return train, test
