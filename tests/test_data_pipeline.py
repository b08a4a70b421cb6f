"""Data pipeline end-to-end: LMDB of encoded PNGs (overflow pages) ->
decoded, resized, normalized NHWC batches; folder dataset; prefetch
iterator semantics."""

import io
import os

import numpy as np
import pytest

from ideas_tpu.data import make_dataset, data_iterator
from tests.lmdb_fixture import write_lmdb


def _png_bytes(rng, size=32):
    from PIL import Image

    arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return arr, buf.getvalue()


@pytest.fixture
def lmdb_of_pngs(tmp_path):
    rng = np.random.default_rng(0)
    items = []
    arrays = {}
    for i in range(6):
        arr, png = _png_bytes(rng)
        key = f"img{i:04d}".encode()
        items.append((key, png))
        arrays[key] = arr
    write_lmdb(str(tmp_path / "db"), items)
    return str(tmp_path / "db"), arrays


def test_lmdb_image_dataset(lmdb_of_pngs):
    path, arrays = lmdb_of_pngs
    ds = make_dataset("lmdb", path, resolution=64)
    assert len(ds) == 6
    img = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8


def test_lmdb_values_roundtrip_through_overflow(lmdb_of_pngs):
    path, arrays = lmdb_of_pngs
    from ideas_tpu.data.lmdb_reader import LMDBReader
    from PIL import Image

    db = LMDBReader(path)
    for key, want in arrays.items():
        raw = db.get(key)
        got = np.asarray(Image.open(io.BytesIO(raw)))
        np.testing.assert_array_equal(got, want)


def test_folder_dataset_and_iterator(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    for i in range(5):
        arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    ds = make_dataset("normal", str(tmp_path), resolution=64)
    assert len(ds) == 5
    it = data_iterator(ds, batch_size=2, seed=0)
    batch = next(it)
    assert batch.shape == (2, 64, 64, 3)
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    # infinite: crosses epoch boundaries
    for _ in range(5):
        batch = next(it)
    assert np.isfinite(batch).all()
