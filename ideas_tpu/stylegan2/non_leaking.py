"""Non-leaking (ADA) adaptive augmentations
(`/root/reference/stylegan2/non_leaking.py`), jit-able.

Pipeline (reference `augment`, `:394-398`):
  1. sample a per-image inverse geometric 3x3 affine: x-flip, 90-degree
     rotations, integer translation, isotropic + anisotropic log-normal
     scaling, rotation, fractional translation (`:151-207`),
  2. sample a per-image 4x4 color matrix: brightness, contrast, luma
     flip, hue rotation, saturation (`:210-241`),
  3. apply geometry with wavelet-domain antialiasing: 2x upsample with
     the SYM6 filter, bilinear grid-sample at the transformed
     coordinates, 2x downsample (`:316-371`),
  4. apply the color matrix per pixel.

Each augmentation fires with probability p — the ADA controller adjusts
p from discriminator sign statistics (see `AdaptiveAugment` in
`ideas_tpu.stylegan2.train`).

TPU-native notes: per-sample affine warps become one vmapped
`map_coordinates` bilinear gather (the reference uses `grid_sample`);
all probability gates are `jnp.where` masks so one compiled program
serves every p.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ideas_tpu.ops.upfirdn2d import upfirdn1d

# Symlet-6 wavelet taps (reference `non_leaking.py:246-252`).
SYM6 = np.array(
    [
        0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
        -0.048311742585633, 0.4910559419267466, 0.787641141030194,
        0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
        0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
    ],
    dtype=np.float64,
)


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [o, z, tx, z, o, ty, z, z, o], axis=-1
    ).reshape(tx.shape + (3, 3))


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [sx, z, z, z, sy, z, z, z, o], axis=-1
    ).reshape(sx.shape + (3, 3))


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [c, -s, z, s, c, z, z, z, o], axis=-1
    ).reshape(theta.shape + (3, 3))


def _translate3d(tx, ty, tz):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    m = jnp.stack(
        [o, z, z, tx,
         z, o, z, ty,
         z, z, o, tz,
         z, z, z, o], axis=-1
    )
    return m.reshape(tx.shape + (4, 4))


def _scale3d(sx, sy, sz):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    m = jnp.stack(
        [sx, z, z, z,
         z, sy, z, z,
         z, z, sz, z,
         z, z, z, o], axis=-1
    )
    return m.reshape(sx.shape + (4, 4))


def _rotate3d(axis, theta):
    """Rotation about a unit axis (Rodrigues), batched over theta."""
    ux, uy, uz = axis
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    cc = 1.0 - c
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    m = jnp.stack(
        [ux * ux * cc + c, ux * uy * cc - uz * s, ux * uz * cc + uy * s, z,
         uy * ux * cc + uz * s, uy * uy * cc + c, uy * uz * cc - ux * s, z,
         uz * ux * cc - uy * s, uz * uy * cc + ux * s, uz * uz * cc + c, z,
         z, z, z, o], axis=-1
    )
    return m.reshape(theta.shape + (4, 4))


def _lognormal(key, shape, std):
    return jnp.exp2(jax.random.normal(key, shape) * std)


def sample_affine(key, batch: int, height: int, width: int, p: float):
    """Per-image inverse geometric transforms (`non_leaking.py:151-207`).
    Returns (batch, 3, 3) matrices G_inv."""
    # One key per random draw: a magnitude and its apply-gate must come
    # from DIFFERENT keys, or "whether applied" becomes a deterministic
    # function of "how much" and the augmentation distribution is biased.
    ks = jax.random.split(key, 16)
    I = jnp.eye(3)[None].repeat(batch, 0)
    G = I

    def gate(k, mat):
        apply = jax.random.uniform(k, (batch,)) < p
        return jnp.where(apply[:, None, None], mat, I)

    # x-flip
    i = jax.random.randint(ks[0], (batch,), 0, 2).astype(jnp.float32)
    G = G @ gate(ks[1], _scale2d(1 - 2 * i, jnp.ones((batch,))))
    # 90-degree rotations
    i = jax.random.randint(ks[2], (batch,), 0, 4).astype(jnp.float32)
    G = G @ gate(ks[3], _rotate2d(-math.pi / 2 * i))
    # integer translate (fraction 0.125 of size)
    t = jax.random.uniform(ks[4], (batch, 2), minval=-0.125, maxval=0.125)
    G = G @ gate(
        ks[5],
        _translate2d(jnp.round(t[:, 0] * width), jnp.round(t[:, 1] * height)),
    )
    # isotropic scale, log-normal std 0.2
    s = _lognormal(ks[6], (batch,), 0.2)
    G = G @ gate(ks[7], _scale2d(s, s))
    # pre/post rotation around anisotropic scale (p_rot = 1-sqrt(1-p));
    # p may be a traced scalar (the ADA controller's state), so jnp math.
    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))
    theta = jax.random.uniform(ks[8], (batch,), minval=-math.pi, maxval=math.pi)
    applyr = jax.random.uniform(ks[9], (batch,)) < p_rot
    G = G @ jnp.where(applyr[:, None, None], _rotate2d(-theta), I)
    s = _lognormal(ks[10], (batch,), 0.2)
    G = G @ gate(ks[11], _scale2d(s, 1.0 / s))
    theta2 = jax.random.uniform(ks[12], (batch,), minval=-math.pi, maxval=math.pi)
    applyr2 = jax.random.uniform(ks[13], (batch,)) < p_rot
    G = G @ jnp.where(applyr2[:, None, None], _rotate2d(-theta2), I)
    # fractional translate, normal std 0.125
    t = jax.random.normal(ks[14], (batch, 2)) * 0.125
    G = G @ gate(ks[15], _translate2d(t[:, 0] * width, t[:, 1] * height))
    return G


def sample_color(key, batch: int, p: float):
    """Per-image 4x4 color matrices (`non_leaking.py:210-241`)."""
    ks = jax.random.split(key, 10)
    I = jnp.eye(4)[None].repeat(batch, 0)
    C = I
    v = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3.0)  # luma axis

    def gate(k, mat):
        apply = jax.random.uniform(k, (batch,)) < p
        return jnp.where(apply[:, None, None], mat, I)

    # brightness (std 0.2)
    b = jax.random.normal(ks[0], (batch,)) * 0.2
    C = C @ gate(ks[1], _translate3d(b, b, b))
    # contrast (log-normal std 0.5) — distinct gate key (see sample_affine)
    c = _lognormal(ks[2], (batch,), 0.5)
    C = C @ gate(ks[3], _scale3d(c, c, c))
    # luma flip (householder about luma axis)
    i = jax.random.randint(ks[4], (batch,), 0, 2).astype(jnp.float32)
    flip = jnp.eye(4)[None] - 2.0 * jnp.outer(v, v)[None] * i[:, None, None]
    C = C @ gate(ks[5], flip)
    # hue rotation about luma axis
    theta = jax.random.uniform(ks[6], (batch,), minval=-math.pi, maxval=math.pi)
    C = C @ gate(ks[7], _rotate3d((v[0], v[1], v[2]), theta))
    # saturation (log-normal std 1)
    s = _lognormal(ks[8], (batch,), 1.0)
    vv = jnp.outer(v, v)[None]
    sat = vv + (jnp.eye(4)[None] - vv) * s[:, None, None]
    C = C @ gate(ks[9], sat)
    return C


def _grid_sample_bilinear(img, gy, gx):
    """Bilinear sample one NHWC image at float coords (H', W') with
    zero padding outside."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    wy = gy - y0
    wx = gx - x0

    def fetch(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]  # (H', W', C)
        return vals * inside[..., None].astype(img.dtype)

    v00 = fetch(y0, x0)
    v01 = fetch(y0, x0 + 1)
    v10 = fetch(y0 + 1, x0)
    v11 = fetch(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(img.dtype)
    wx = wx[..., None].astype(img.dtype)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def apply_affine(img, G_inv, taps=SYM6):
    """Geometric warp with 2x wavelet oversampling
    (`non_leaking.py:316-371`): pad, 2x SYM6 upsample, bilinear sample the
    warped field at 2x resolution, 2x SYM6 downsample.

    Coordinate convention (self-consistent; identity G returns the image
    up to wavelet ringing): with even-length filter k and up pads
    (k//2, k//2-1), upsampled pixel j sits at source coordinate
    (j - 0.5)/2; with down pads (k//2-1, k//2-1), output pixel i reads 2x
    coordinate 2i + 0.5 = source coordinate i.
    """
    b, h, w, c = img.shape
    taps_np = np.asarray(taps, np.float64)
    k = len(taps_np)
    # Orthonormal-wavelet perfect reconstruction: the up pass *correlates*
    # with h (flipped taps through the convolving upfirdn) and the down
    # pass *convolves* with h, so the cascade filters with the
    # autocorrelation of h — identity at even lags (reference passes
    # `kernel_flip` up and `kernel` down, `non_leaking.py:338,359`).
    # DC gains: up sum(h)/2 = 1/sqrt(2), down sum(h) = sqrt(2) -> unity.
    h_taps = jnp.asarray(taps_np, jnp.float32)
    h_flip = jnp.asarray(taps_np[::-1].copy(), jnp.float32)
    pu, pd = k // 2, k // 2 - 1  # phases for even-lag reconstruction
    centroid = float((np.arange(k) * taps_np).sum() / taps_np.sum())
    beta = centroid - pu  # up-pixel j sits at source coord (j + beta)/2

    # Fixed pad margin (the reference computes a G-dependent bounding box,
    # `non_leaking.py:259-313`; a static margin keeps shapes jit-stable).
    m = max(h, w) // 4 + k
    imgp = jnp.pad(img, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
    hp, wp = h + 2 * m, w + 2 * m

    up = upfirdn1d(imgp, h_flip, up=2, pad=(pu, k - 1 - pu), axis=1)
    up = upfirdn1d(up, h_flip, up=2, pad=(pu, k - 1 - pu), axis=2)
    assert up.shape[1] == 2 * hp and up.shape[2] == 2 * wp

    # Output 2x grid: up-pixel q maps to source coordinate (q + beta)/2
    # in padded-image units; center and warp, then invert the mapping.
    ctr_y = (hp - 1) / 2.0
    ctr_x = (wp - 1) / 2.0
    qy = (jnp.arange(2 * hp, dtype=jnp.float32) + beta) / 2.0 - ctr_y
    qx = (jnp.arange(2 * wp, dtype=jnp.float32) + beta) / 2.0 - ctr_x
    gy, gx = jnp.meshgrid(qy, qx, indexing="ij")
    coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (2hp, 2wp, 3)

    def warp_one(im_up, G):
        src = coords @ G.T  # centered source coords, original units
        sx = (src[..., 0] + ctr_x) * 2.0 - beta
        sy = (src[..., 1] + ctr_y) * 2.0 - beta
        return _grid_sample_bilinear(im_up, sy, sx)

    warped = jax.vmap(warp_one)(up, G_inv.astype(jnp.float32))

    down = upfirdn1d(warped, h_taps, down=2, pad=(pd, k - 2 - pd), axis=1)
    down = upfirdn1d(down, h_taps, down=2, pad=(pd, k - 2 - pd), axis=2)
    assert down.shape[1] == hp and down.shape[2] == wp
    return down[:, m : m + h, m : m + w, :]


def apply_color(img, C):
    """Per-pixel affine color transform: rgb' = M @ rgb + t."""
    M = C[:, :3, :3]
    t = C[:, :3, 3]
    return jnp.einsum("bhwc,bdc->bhwd", img, M.astype(img.dtype)) + t[
        :, None, None, :
    ].astype(img.dtype)


def augment(key, img, p: float):
    """Full ADA pipeline (`non_leaking.py:394-398`). p is a python float
    or traced scalar; gates are per-image Bernoulli(p)."""
    b, h, w, _ = img.shape
    kg, kc = jax.random.split(key)
    G_inv = sample_affine(kg, b, h, w, p)
    C = sample_color(kc, b, p)
    out = apply_affine(img, G_inv)
    out = apply_color(out, C)
    return out
