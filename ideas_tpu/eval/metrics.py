"""Steganography metrics: extraction accuracy sweep over the adaptive
mapping parameter delta (the headline table of the paper — BASELINE.md:
ACC at delta = 0 / 25 / 50%), plus BER helpers."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ideas_tpu.stego import message_to_tensor, tensor_to_message


def extraction_accuracy_sweep(
    trainer,
    state,
    key,
    deltas=(0.0, 0.25, 0.5),
    sigma: int = 1,
    n_batches: int = 8,
) -> Dict[float, float]:
    """Hide->reveal round-trip accuracy at each delta, using the EMA nets
    (matches the online eval of `/root/reference/train.py:249-293`, which
    always reports sigma=1 delta=0.5; the paper table sweeps delta)."""
    cfg = trainer.cfg
    res = cfg.image_size // 16
    b = cfg.batch_size
    out: Dict[float, float] = {}
    for delta in deltas:
        accs = []
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
            accs.append(1.0 - jnp.mean(jnp.abs(msg - msg_hat)))
        out[delta] = float(jnp.mean(jnp.stack(accs)))
    return out
