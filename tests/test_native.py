"""Native C++ host runtime vs the JAX/numpy reference implementations."""

import numpy as np
import pytest

from ideas_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_preprocess_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    flips = np.array([1, 0, 1, 0], np.uint8)
    got = native.preprocess_batch(imgs, flips)
    want = imgs.astype(np.float32) / 127.5 - 1.0
    want[flips.astype(bool)] = want[flips.astype(bool), :, ::-1, :]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("sigma", [1, 2, 4])
def test_native_codec_roundtrip_and_parity(sigma):
    rng = np.random.default_rng(1)
    bits = (rng.random((8, 64 * sigma)) < 0.5).astype(np.float32)
    z = native.message_to_tensor(bits, sigma, delta=0.3, seed=7)
    # jitter stays within the decodable bin
    out = native.tensor_to_message(z, sigma)
    np.testing.assert_array_equal(out, bits)
    # delta=0 parity with the JAX codec's bin centres
    import jax.numpy as jnp
    from ideas_tpu.stego import message_to_tensor as jmt

    z0 = native.message_to_tensor(bits, sigma, delta=0.0)
    zj = np.asarray(jmt(jnp.asarray(bits), sigma=sigma, delta=0.0))
    np.testing.assert_allclose(z0, zj, atol=1e-6)


def test_native_lmdb_reader_matches_python():
    """C++ LMDB reader == pure-Python reader on the overflow-page fixture
    (keys order, point lookups, entry count, absent-key miss)."""
    import tempfile

    from ideas_tpu import native
    from ideas_tpu.data.lmdb_reader import LMDBReader
    from tests.lmdb_fixture import write_lmdb

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    d = tempfile.mkdtemp()
    items = [(f"k{i:04d}".encode(), bytes([i % 251]) * (5000 + 13 * i))
             for i in range(20)]
    write_lmdb(d, items)

    py = LMDBReader(d)
    nat = native.NativeLMDBReader(d)
    assert nat.entries == py.entries == len(items)
    assert nat.keys() == list(py.keys()) == [k for k, _ in items]
    for k, v in items:
        assert nat.get(k) == py.get(k) == v
    assert nat.get(b"missing") is None
    nat.close()
    py.close()
