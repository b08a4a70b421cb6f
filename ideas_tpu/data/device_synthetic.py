"""On-device synthetic training images (jit-traceable).

The host-side `SyntheticDataset` (pipeline.py) costs ~6 ms/image to
rasterize plus a host->device transfer per step; through the remote TPU
relay the fp32 transfer alone (~142 ms for an 8x256x256x3 batch) halves
end-to-end training throughput. This module generates the *same image
family* — a vertical two-color gradient background with `n_shapes`
random axis-aligned rectangles and discs — entirely inside the jitted
train step: zero host work, zero transfer.

The family is structure-rich by design (random spatial layout), which
keeps pressure on the structure pathway; see PERF.md and
pipeline.SyntheticDataset's docstring for the collapse failure mode
this avoids.

Images are returned NHWC float32 in [-1, 1] (the reference's
Normalize(0.5, 0.5) output range, `/root/reference/train.py:444-451`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _one_image(key: jax.Array, resolution: int, n_shapes: int) -> jax.Array:
    """Rasterize one (res, res, 3) image in [0, 1]."""
    r = resolution
    coords = (jnp.arange(r, dtype=jnp.float32) + 0.0) / r
    yy = coords[:, None]  # (r, 1)
    xx = coords[None, :]  # (1, r)

    k_base, k_shapes = jax.random.split(key)
    base = jax.random.uniform(k_base, (2, 3))
    img = base[0] * (1.0 - yy)[..., None] + base[1] * yy[..., None]
    img = jnp.broadcast_to(img, (r, r, 3))

    def paint(img, k):
        kc, kp, ks, kk, ka = jax.random.split(k, 5)
        color = jax.random.uniform(kc, (3,))
        cy, cx = jax.random.uniform(kp, (2,), minval=0.1, maxval=0.9)
        size = jax.random.uniform(ks, (), minval=0.08, maxval=0.3)
        aspect = jax.random.uniform(ka, (), minval=0.5, maxval=1.5)
        is_rect = jax.random.bernoulli(kk)
        rect = (jnp.abs(yy - cy) < size) & (jnp.abs(xx - cx) < size * aspect)
        disc = (yy - cy) ** 2 + (xx - cx) ** 2 < size**2
        mask = jnp.where(is_rect, rect, disc)
        return jnp.where(mask[..., None], color, img), None

    img, _ = jax.lax.scan(paint, img, jax.random.split(k_shapes, n_shapes))
    return img


def _one_image_rich(key: jax.Array, resolution: int, n_shapes: int) -> jax.Array:
    """Higher-entropy family (round-2 delta=50%% experiment, VERDICT #3):
    angled gradient + sinusoidal-grating background, more shapes with
    rotation, rings, and per-shape gradient fills; occlusion via paint
    order. The point is a richer STRUCTURE distribution (more boundary
    geometry per image) so the extraction margin is trained on harder
    layouts than the axis-aligned default family."""
    r = resolution
    coords = jnp.arange(r, dtype=jnp.float32) / r
    yy = coords[:, None]
    xx = coords[None, :]

    k_bg, k_grate, k_shapes = jax.random.split(key, 3)
    kb1, kb2, kb3 = jax.random.split(k_bg, 3)
    base = jax.random.uniform(kb1, (2, 3))
    theta = jax.random.uniform(kb2, (), minval=0.0, maxval=2 * jnp.pi)
    t = (jnp.cos(theta) * (xx - 0.5) + jnp.sin(theta) * (yy - 0.5)) + 0.5
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    img = base[0] * (1.0 - t) + base[1] * t
    # low-amplitude grating: extra texture without drowning structure
    kg1, kg2, kg3 = jax.random.split(k_grate, 3)
    freq = jax.random.uniform(kg1, (), minval=2.0, maxval=12.0)
    phi = jax.random.uniform(kg2, (), minval=0.0, maxval=2 * jnp.pi)
    amp = jax.random.uniform(kg3, (), minval=0.0, maxval=0.12)
    grate = jnp.sin(2 * jnp.pi * freq * (0.7 * xx + 0.3 * yy) + phi)
    img = jnp.clip(img + amp * grate[..., None], 0.0, 1.0)
    img = jnp.broadcast_to(img, (r, r, 3))

    def paint(img, k):
        kc, kc2, kp, ks, kk, ka, kr, kg = jax.random.split(k, 8)
        c0 = jax.random.uniform(kc, (3,))
        c1 = jax.random.uniform(kc2, (3,))
        cy, cx = jax.random.uniform(kp, (2,), minval=0.08, maxval=0.92)
        size = jax.random.uniform(ks, (), minval=0.06, maxval=0.28)
        aspect = jax.random.uniform(ka, (), minval=0.4, maxval=1.8)
        rot = jax.random.uniform(kr, (), minval=0.0, maxval=jnp.pi)
        # rotated local frame
        u = jnp.cos(rot) * (xx - cx) + jnp.sin(rot) * (yy - cy)
        v = -jnp.sin(rot) * (xx - cx) + jnp.cos(rot) * (yy - cy)
        shape_type = jax.random.randint(kk, (), 0, 4)
        rect = (jnp.abs(v) < size) & (jnp.abs(u) < size * aspect)
        rr2 = u ** 2 + v ** 2
        disc = rr2 < size ** 2
        ring = (rr2 < size ** 2) & (rr2 > (0.55 * size) ** 2)
        tri = (v > -size) & (jnp.abs(u) < (size - v) * 0.8)
        mask = jnp.select(
            [shape_type == 0, shape_type == 1, shape_type == 2],
            [rect, disc, ring], tri,
        )
        # gradient fill along the shape's u axis
        gt = jnp.clip(u / (2 * size * aspect) + 0.5, 0.0, 1.0)[..., None]
        grad_on = jax.random.bernoulli(kg)
        fill = jnp.where(grad_on, c0 * (1 - gt) + c1 * gt,
                         jnp.broadcast_to(c0, (r, r, 3)))
        return jnp.where(mask[..., None], fill, img), None

    img, _ = jax.lax.scan(paint, img, jax.random.split(k_shapes, n_shapes))
    return img


_FAMILIES = {"default": _one_image, "rich": _one_image_rich}
_DEFAULT_SHAPES = {"default": 6, "rich": 10}


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def synthetic_batch(
    key: jax.Array, batch: int, resolution: int, n_shapes: int = 0,
    family: str = "default",
) -> jax.Array:
    """(batch, res, res, 3) float32 images in [-1, 1], fully on device.
    `n_shapes=0` picks the family default (6 / 10)."""
    one = _FAMILIES[family]
    n_shapes = n_shapes or _DEFAULT_SHAPES[family]
    imgs = jax.vmap(lambda k: one(k, resolution, n_shapes))(
        jax.random.split(key, batch)
    )
    return imgs * 2.0 - 1.0


def make_device_data_fn(batch: int, resolution: int, n_shapes: int = 0,
                        family: str = "default"):
    """A (key -> batch) closure for Trainer(..., device_data_fn=...).

    Called *inside* the jitted train step, so the rasterization fuses
    into the same XLA program as the model forward. `n_shapes=0` picks
    the family default (6 for 'default', 10 for 'rich')."""
    one = _FAMILIES[family]
    n_shapes = n_shapes or _DEFAULT_SHAPES[family]

    def fn(key: jax.Array) -> jax.Array:
        imgs = jax.vmap(lambda k: one(k, resolution, n_shapes))(
            jax.random.split(key, batch)
        )
        return imgs * 2.0 - 1.0

    return fn
