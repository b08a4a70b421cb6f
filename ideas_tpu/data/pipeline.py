"""Host-side data pipeline.

Rebuilds the reference's dataset layer (`/root/reference/dataset.py`) and
loader transforms (`/root/reference/train.py:444-465`): images resized to
the training resolution, random horizontal flip, normalized to [-1, 1] —
but NHWC float32 batches, double-buffered with a background prefetch
thread so host decode overlaps device compute (the torch DataLoader's
role).

Dataset types (reference `set_dataset`, `dataset.py:77-85`):
  * "normal"    — a directory of image files (FFHQ-style).
  * "lmdb"      — an LSUN-style LMDB of encoded images, read through the
                   pure-Python `lmdb_reader` (the `lmdb` wheel is not in
                   this environment).
  * "synthetic" — deterministic procedural images for tests/benchmarks.
"""

from __future__ import annotations

import io
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tiff")
LMDB_MAX_NUM = 70000  # reference caps LSUN key scan at 70000 (dataset.py:27)


class FolderDataset:
    """Sorted image-file dataset (`dataset.py:54-74`)."""

    def __init__(self, path: str, resolution: int):
        self.resolution = resolution
        self.files: List[str] = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(IMG_EXTENSIONS)
        )
        if not self.files:
            raise ValueError(f"no images found under {path}")

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self.files[idx]) as im:
            im = im.convert("RGB")
            if im.size != (self.resolution, self.resolution):
                im = im.resize((self.resolution, self.resolution), Image.BILINEAR)
            return np.asarray(im, np.uint8)


def _open_lmdb(path: str):
    """LMDB access: the native C++ mmap reader when the runtime is built
    (ideas_tpu/native/core.cpp — no Python bytecode on per-item fetches),
    else the pure-Python reader. Identical read semantics (pinned by
    tests/test_native.py)."""
    from ideas_tpu import native

    if native.available():
        try:
            return native.NativeLMDBReader(path)
        except Exception:
            pass  # fall through to the pure reader (clearer errors)
    from ideas_tpu.data.lmdb_reader import LMDBReader

    return LMDBReader(path)


class LMDBImageDataset:
    """LSUN-style LMDB of encoded images (`dataset.py:12-48`).

    Keys are scanned with a cursor up to LMDB_MAX_NUM entries, like the
    reference; values are encoded image bytes decoded with PIL.
    """

    def __init__(self, path: str, resolution: int, max_num: int = LMDB_MAX_NUM):
        self.resolution = resolution
        self.db = _open_lmdb(path)
        self.keys: List[bytes] = []
        for k in self.db.keys():  # keys-only scan: no value copies
            self.keys.append(k)
            if len(self.keys) >= max_num:
                break
        if not self.keys:
            raise ValueError(f"empty LMDB at {path}")

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        raw = self.db.get(self.keys[idx])
        with Image.open(io.BytesIO(raw)) as im:
            im = im.convert("RGB")
            if im.size != (self.resolution, self.resolution):
                im = im.resize((self.resolution, self.resolution), Image.BILINEAR)
            return np.asarray(im, np.uint8)


class MultiResolutionLMDBDataset:
    """StyleGAN2-style multi-resolution LMDB (`stylegan2/dataset.py`):
    keys `f'{resolution}-{idx:05d}'`, length under key b'length'."""

    def __init__(self, path: str, resolution: int):
        self.resolution = resolution
        self.db = _open_lmdb(path)
        length = self.db.get(b"length")
        if length is None:
            raise ValueError(f"{path} has no 'length' key (not an SG2 lmdb)")
        self.length = int(length.decode())

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        key = f"{self.resolution}-{idx:05d}".encode()
        raw = self.db.get(key)
        with Image.open(io.BytesIO(raw)) as im:
            return np.asarray(im.convert("RGB"), np.uint8)


class SyntheticDataset:
    """Deterministic procedural RGB images (tests and benchmarks).

    Structure-rich by design: random rectangles and discs at random
    positions over a gradient background. A purely *global* image family
    (e.g. full-field sinusoids) is fully describable by the texture
    vector alone, which removes all pressure on the structure pathway
    and lets the structure generator collapse — observed experimentally;
    spatial layout keeps the S-space alive.
    """

    def __init__(self, resolution: int, length: int = 256, n_shapes: int = 6):
        self.resolution = resolution
        self.length = length
        self.n_shapes = n_shapes

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> np.ndarray:
        r = self.resolution
        rng = np.random.default_rng(idx)
        yy, xx = np.mgrid[0:r, 0:r].astype(np.float32) / r
        base = rng.uniform(0, 1, (2, 3)).astype(np.float32)
        img = base[0][None, None, :] * (1 - yy)[..., None] + \
            base[1][None, None, :] * yy[..., None]
        for _ in range(self.n_shapes):
            color = rng.uniform(0, 1, 3).astype(np.float32)
            cy, cx = rng.uniform(0.1, 0.9, 2)
            size = rng.uniform(0.08, 0.3)
            if rng.random() < 0.5:
                mask = (np.abs(yy - cy) < size) & (np.abs(xx - cx) < size * rng.uniform(0.5, 1.5))
            else:
                mask = (yy - cy) ** 2 + (xx - cx) ** 2 < size ** 2
            img[mask] = color
        return (img * 255).astype(np.uint8)


def make_dataset(dataset_type: str, path: str, resolution: int):
    if dataset_type == "normal":
        return FolderDataset(path, resolution)
    if dataset_type == "lmdb":
        return LMDBImageDataset(path, resolution)
    if dataset_type == "lmdb_multires":
        return MultiResolutionLMDBDataset(path, resolution)
    if dataset_type == "synthetic":
        return SyntheticDataset(resolution)
    raise ValueError(f"unknown dataset_type {dataset_type!r}")


def _to_float_batch(imgs: np.ndarray, flip_mask: np.ndarray) -> np.ndarray:
    """uint8 NHWC -> float32 in [-1, 1], with per-sample horizontal flip
    (RandomHorizontalFlip + Normalize(0.5, 0.5), `train.py:444-451`).
    Uses the threaded C++ kernel when built (ideas_tpu.native)."""
    try:
        from ideas_tpu import native

        if native.available():
            return native.preprocess_batch(imgs, flip_mask)
    except Exception:
        pass
    x = imgs.astype(np.float32) / 127.5 - 1.0
    x[flip_mask] = x[flip_mask, :, ::-1, :]
    return x


def data_iterator(
    dataset,
    batch_size: int,
    seed: int = 0,
    prefetch: int = 2,
    num_threads: int = 0,
    raw: bool = False,
) -> Iterator[np.ndarray]:
    """Infinite shuffled NHWC batch iterator with prefetch.

    Mirrors `sample_data(DataLoader(...))` (`utils.py:63-66`): reshuffle
    every epoch, loop forever. A daemon thread fills a bounded queue so
    decode overlaps device compute.

    `raw=False` yields float32 batches in [-1, 1] (flip + normalize on
    the host). `raw=True` yields `(uint8 imgs, bool flip_mask)` so the
    normalize/flip runs on device instead — 4x fewer bytes over the
    host->device link, which is the production-loop bottleneck on remote
    TPU relays (PERF.md: 142 ms fp32 vs 66 ms uint8 per 8x256^2 batch).
    """
    rng = np.random.default_rng(seed)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def produce():
        while True:
            order = rng.permutation(len(dataset))
            for start in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[start : start + batch_size]
                imgs = np.stack([dataset[int(i)] for i in idx])
                flips = rng.random(batch_size) < 0.5
                q.put((imgs, flips) if raw else _to_float_batch(imgs, flips))

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        yield q.get()
