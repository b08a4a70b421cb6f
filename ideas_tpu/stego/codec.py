"""Message <-> secret-tensor codec ("adaptive mapping").

Semantics from `/root/reference/utils.py:74-97`:

encode (message_to_tensor): group sigma consecutive bits into an integer
m in [0, 2^sigma), map it to the centre of its quantization bin,
``step*(m + 0.5) - 1`` with ``step = 2/2^sigma``, then jitter uniformly in
``(-delta*step, +delta*step)`` — the paper's adaptive mapping with
robustness parameter delta (any |perturbation| < (0.5-delta)*step still
decodes exactly).

decode (tensor_to_message): clamp to [-1, 1], shift to [0, 2], divide by
step and take the binary expansion of the bin index, MSB first.

Bit layout matches the reference: bit i of group g lives at flat index
``g*sigma + i`` via the strided views ``message[:, i::sigma]``.

Vectorized, jit-able, fully on-device (the reference loops over sigma on
the host; sigma <= 8 in practice so both are cheap — this version avoids
host sync so it can live inside a jitted hide/reveal pipeline).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def message_to_tensor(
    message: jnp.ndarray,
    sigma: int,
    delta: float,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """(B, L) bits in {0,1} -> (B, L//sigma) floats in (-1, 1).

    `key` supplies the jitter randomness (the reference uses global torch
    RNG); pass None for deterministic bin centres (delta ignored).
    """
    b, length = message.shape
    groups = length // sigma
    step = 2.0 / (2 ** sigma)
    m = message.reshape(b, groups, sigma).astype(jnp.float32)
    weights = jnp.asarray([2.0 ** (sigma - i - 1) for i in range(sigma)], jnp.float32)
    nums = jnp.einsum("bgs,s->bg", m, weights)
    tensor = step * (nums + 0.5) - 1.0
    if key is not None and delta > 0:
        r = jax.random.uniform(key, tensor.shape, jnp.float32, -1.0, 1.0)
        tensor = tensor + r * (step * delta)
    return tensor


def tensor_nhwc_from_message(
    message: jnp.ndarray,
    N: int,
    res: int,
    sigma: int,
    delta: float,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """(B, N*res*res*sigma) bits -> (B, res, res, N) secret tensor.

    Bit->position map matches the reference EXACTLY: the flat tensor is
    laid out channel-major, ``Z.reshape(B, N, res, res)``
    (`/root/reference/train.py:257`), then transposed to NHWC for our
    models. For N=1 the transpose is a no-op; for N>=2 this is what
    keeps messages bit-compatible with reference-converted checkpoints
    (a plain NHWC reshape would scramble the bit->pixel assignment)."""
    z = message_to_tensor(message, sigma=sigma, delta=delta, key=key)
    return z.reshape(message.shape[0], N, res, res).transpose(0, 2, 3, 1)


def message_from_tensor_nhwc(z: jnp.ndarray, sigma: int) -> jnp.ndarray:
    """(B, res, res, N) extracted tensor -> (B, N*res*res*sigma) bits —
    inverse of `tensor_nhwc_from_message`'s layout (the reference's
    NCHW c-major flatten, `/root/reference/train.py:281`)."""
    flat = z.transpose(0, 3, 1, 2).reshape(z.shape[0], -1)
    return tensor_to_message(flat, sigma=sigma)


def tensor_to_message(tensor: jnp.ndarray, sigma: int) -> jnp.ndarray:
    """(B, G) floats -> (B, G*sigma) bits in {0,1} (MSB-first per group)."""
    b, groups = tensor.shape
    step = 2.0 / (2 ** sigma)
    x = jnp.clip(tensor, -1.0, 1.0) + 1.0
    nums = x / step  # in [0, 2^sigma]
    bits = []
    for i in range(sigma):
        power = 2.0 ** (sigma - i - 1)
        bit = (nums >= power).astype(jnp.float32)
        bits.append(bit)
        nums = nums - bit * power
    # bits[i] has shape (B, G); interleave to (B, G*sigma) with stride sigma.
    out = jnp.stack(bits, axis=-1)  # (B, G, sigma)
    return out.reshape(b, groups * sigma)
