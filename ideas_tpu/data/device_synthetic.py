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


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def synthetic_batch(
    key: jax.Array, batch: int, resolution: int, n_shapes: int = 6
) -> jax.Array:
    """(batch, res, res, 3) float32 images in [-1, 1], fully on device."""
    imgs = jax.vmap(lambda k: _one_image(k, resolution, n_shapes))(
        jax.random.split(key, batch)
    )
    return imgs * 2.0 - 1.0


def make_device_data_fn(batch: int, resolution: int, n_shapes: int = 6):
    """A (key -> batch) closure for Trainer(..., device_data_fn=...).

    Called *inside* the jitted train step, so the rasterization fuses
    into the same XLA program as the model forward.
    """

    def fn(key: jax.Array) -> jax.Array:
        imgs = jax.vmap(lambda k: _one_image(k, resolution, n_shapes))(
            jax.random.split(key, batch)
        )
        return imgs * 2.0 - 1.0

    return fn
