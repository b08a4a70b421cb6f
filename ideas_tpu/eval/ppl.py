"""Perceptual Path Length (`/root/reference/stylegan2/ppl.py`).

Samples latent pairs, perturbs by eps along a slerp (z space) or lerp
(w space), renders both endpoints, and measures LPIPS distance / eps^2;
reports the mean after dropping values outside the 1st-99th percentile
(`ppl.py:96-104`).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def slerp(a, b, t):
    """Spherical interpolation (`ppl.py:12-21`): interpolate along the
    great circle between the *normalized* endpoints and re-normalize the
    result (the reference returns unit vectors, not magnitudes of a)."""
    a = _normalize(a)
    b = _normalize(b)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1 + 1e-7, 1 - 1e-7))
    c = _normalize(b - d * a)
    return _normalize(a * jnp.cos(p) + c * jnp.sin(p))


def compute_ppl(
    generator_apply: Callable,
    g_params,
    lpips_fn: Callable,
    key,
    n_sample: int = 5000,
    batch: int = 16,
    eps: float = 1e-4,
    space: str = "w",
    crop: bool = False,
    style_dim: int = 512,
) -> float:
    """space='w': lerp in latent space with t ~ U(0,1); space='z': slerp."""
    dists = []
    n_batches = max(1, n_sample // batch)
    for i in range(n_batches):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        z1 = jax.random.normal(k1, (batch, style_dim))
        z2 = jax.random.normal(k2, (batch, style_dim))
        t = jax.random.uniform(k3, (batch, 1))
        if space == "z":
            zt0 = slerp(z1, z2, t)
            zt1 = slerp(z1, z2, t + eps)
            img0, _ = generator_apply(g_params, [zt0])
            img1, _ = generator_apply(g_params, [zt1])
        else:
            # lerp in w; generator_apply must accept input_is_latent
            img0, img1 = _w_pair(generator_apply, g_params, z1, z2, t, eps)
        if crop:
            h = img0.shape[1]
            c = h // 8
            img0 = img0[:, c * 3 : c * 7, c * 2 : c * 6]
            img1 = img1[:, c * 3 : c * 7, c * 2 : c * 6]
        d = lpips_fn(img0, img1) / (eps ** 2)
        dists.append(np.asarray(jax.device_get(d)))
    dists = np.concatenate(dists)
    lo, hi = np.percentile(dists, 1), np.percentile(dists, 99)
    return float(dists[(dists >= lo) & (dists <= hi)].mean())


def _w_pair(generator_apply, g_params, z1, z2, t, eps):
    from ideas_tpu.models.stylegan2 import SG2Generator

    w1 = generator_apply(g_params, z1, method=SG2Generator.map_latent)
    w2 = generator_apply(g_params, z2, method=SG2Generator.map_latent)
    wt0 = w1 + (w2 - w1) * t
    wt1 = w1 + (w2 - w1) * (t + eps)
    img0, _ = generator_apply(g_params, [wt0], input_is_latent=True)
    img1, _ = generator_apply(g_params, [wt1], input_is_latent=True)
    return img0, img1
