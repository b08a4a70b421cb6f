"""patchify_image: the MXU dense-matrix resampler must match a direct
gather-based bilinear oracle (F.interpolate align_corners=False
semantics on the crop), and stay differentiable (Dco's R1 needs it)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.losses import patchify_image, _bilinear_resize_crop


def gather_oracle(img, c_y, c_x, c_h, c_w, th, tw):
    img = np.asarray(img)
    b, h, w, c = img.shape

    def coords(c0, clen, target, limit):
        t = np.arange(target, dtype=np.float64)
        src = (t + 0.5) * (clen / target) - 0.5
        src = np.clip(src, 0.0, clen - 1.0)
        i0 = np.floor(src)
        frac = src - i0
        i0 = i0.astype(int) + c0
        i1 = np.minimum(i0 + 1, c0 + clen - 1)
        return i0, i1, frac

    y0, y1, fy = coords(c_y, c_h, th, h)
    x0, x1, fx = coords(c_x, c_w, tw, w)
    rows = img[:, y0] * (1 - fy)[None, :, None, None] + img[:, y1] * fy[None, :, None, None]
    out = (rows[:, :, x0] * (1 - fx)[None, None, :, None]
           + rows[:, :, x1] * fx[None, None, :, None])
    return out.astype(np.float32)


@pytest.mark.parametrize("crop", [(3, 5, 17, 23), (0, 0, 8, 8), (10, 20, 54, 33)])
def test_resize_crop_matches_gather_oracle(crop):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    c_y, c_x, c_h, c_w = crop
    got = _bilinear_resize_crop(
        jnp.asarray(img), jnp.int32(c_y), jnp.int32(c_x),
        jnp.int32(c_h), jnp.int32(c_w), 16, 16,
    )
    want = gather_oracle(img, c_y, c_x, c_h, c_w, 16, 16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_patchify_shapes_order_and_grad():
    img = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)
    patches = patchify_image(key, img, n_crop=4)
    assert patches.shape == (8, 16, 16, 3)  # batch-major, crop-minor

    # every image contributes the same 4 crop regions: patch j of image 0
    # and patch j of image 1 come from identical coordinates
    p = np.asarray(patches).reshape(2, 4, 16, 16, 3)
    # (can't compare values across images, but a constant image must give
    # constant patches -> exercises coordinate validity)
    const = patchify_image(key, jnp.ones_like(img) * 0.7, n_crop=4)
    np.testing.assert_allclose(np.asarray(const), 0.7, atol=1e-5)

    g = jax.grad(lambda im: jnp.sum(patchify_image(key, im, 4) ** 2))(img)
    assert g.shape == img.shape and np.isfinite(np.asarray(g)).all()
