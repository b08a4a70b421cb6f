"""Steganography metrics: extraction accuracy sweep over the adaptive
mapping parameter delta (the headline table of the paper — BASELINE.md:
ACC at delta = 0 / 25 / 50%), plus BER helpers."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ideas_tpu.stego import message_to_tensor, tensor_to_message


def wilson_interval(flips: int, bits: int, z: float = 1.96):
    """95% Wilson score interval for the bit-ERROR rate (certifies the
    100.00% cells: at 0 flips in n bits the upper error bound is
    ~z^2/(n+z^2), not 0)."""
    if bits == 0:
        return (0.0, 1.0)
    p = flips / bits
    denom = 1.0 + z * z / bits
    center = (p + z * z / (2 * bits)) / denom
    half = (z / denom) * (p * (1 - p) / bits + z * z / (4 * bits * bits)) ** 0.5
    return (max(0.0, center - half), min(1.0, center + half))


def extraction_accuracy_sweep(
    trainer,
    state,
    key,
    deltas=(0.0, 0.25, 0.5),
    sigma: int = 1,
    n_batches: int = 8,
) -> Dict[float, dict]:
    """Hide->reveal round-trip accuracy at each delta, using the EMA nets
    (matches the online eval of `/root/reference/train.py:249-293`, which
    always reports sigma=1 delta=0.5; the paper table sweeps delta).

    Returns per-delta {"acc", "flips", "bits"} with EXACT flip counts so
    callers can state binomial confidence intervals instead of bare
    percentages (a 100.00% cell on few bits is weak evidence)."""
    cfg = trainer.cfg
    res = cfg.image_size // 16
    b = cfg.batch_size
    bits_per_batch = b * cfg.N * res * res * sigma
    out: Dict[float, dict] = {}
    for delta in deltas:
        flip_counts = []
        for i in range(n_batches):
            key, k1, k2, k3 = jax.random.split(key, 4)
            msg = jax.random.bernoulli(
                k1, 0.5, (b, cfg.N * res * res * sigma)
            ).astype(jnp.float32)
            t2 = jax.random.uniform(
                k2, (b, cfg.texture_channel), jnp.float32, -1.0, 1.0
            )
            img, _ = trainer.hide(state, msg, t2, k3, sigma=sigma, delta=delta)
            msg_hat, _ = trainer.reveal(state, img, sigma=sigma)
            flip_counts.append(jnp.sum(jnp.abs(msg - msg_hat)))
        flips = int(round(float(jnp.sum(jnp.stack(flip_counts)))))
        bits = n_batches * bits_per_batch
        out[delta] = {"acc": 1.0 - flips / bits, "flips": flips, "bits": bits}
    return out
