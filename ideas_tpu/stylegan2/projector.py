"""Latent projection: optimize (w, noises) to reconstruct a target image
(`/root/reference/stylegan2/projector.py`). LPIPS + MSE + multi-scale
noise autocorrelation regularization, cosine-ramped lr, annealed latent
noise — as one jitted optax loop.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax


def noise_regularize(noises):
    """Multi-scale autocorrelation penalty (`projector.py:16-36`)."""
    loss = 0.0
    for noise in noises:
        n = noise
        while True:
            size = n.shape[1]
            loss = loss + jnp.mean(
                jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=2), axis=(1, 2, 3)))
            ) + jnp.mean(
                jnp.square(jnp.mean(n * jnp.roll(n, 1, axis=1), axis=(1, 2, 3)))
            )
            if size <= 8:
                break
            n = n.reshape(n.shape[0], size // 2, 2, size // 2, 2, 1)
            n = jnp.mean(n, axis=(2, 4))
        # noise shape: (1, H, W, 1)
    return loss


def normalize_noises(noises):
    return [
        (n - jnp.mean(n)) / (jnp.std(n) + 1e-8) for n in noises
    ]


def get_lr(t: float, initial_lr: float, rampdown: float = 0.25,
           rampup: float = 0.05) -> float:
    """Cosine ramp schedule (`projector.py:47-52`)."""
    lr_ramp = min(1.0, (1.0 - t) / rampdown)
    lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * min(1.0, t / rampup)
    return initial_lr * lr_ramp


def project(
    generator_apply: Callable,
    g_params,
    lpips_fn: Callable,
    mean_latent,
    latent_std: float,
    target,
    num_layers: int,
    key,
    steps: int = 1000,
    initial_lr: float = 0.1,
    noise_level: float = 0.05,
    noise_ramp: float = 0.75,
    noise_regularize_weight: float = 1e5,
    mse_weight: float = 0.0,
):
    """Returns (latent, noises, history dict)."""
    b = target.shape[0]
    size = target.shape[1]
    latent = jnp.tile(mean_latent, (b, 1))
    # per-layer noises (`model.py:488-497` shapes)
    noises = []
    log_size = int(math.log2(size))
    noises.append(jax.random.normal(key, (1, 4, 4, 1)))
    for i in range(3, log_size + 1):
        for _ in range(2):
            key, sub = jax.random.split(key)
            noises.append(jax.random.normal(sub, (1, 2 ** i, 2 ** i, 1)))

    # Schedule the lr like the reference (param_groups['lr'] set per step,
    # `projector.py:146-150`): apply Adam's normalization first, then the
    # scheduled lr. Scaling the *gradients* instead would be cancelled by
    # Adam's scale invariance (m/sqrt(v)) and turn the cosine ramp into a
    # no-op.
    opt = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
    params = {"latent": latent, "noises": noises}
    opt_state = opt.init(params)

    def loss_fn(p, key, noise_strength):
        lat = p["latent"] + jax.random.normal(key, p["latent"].shape) * noise_strength
        lat_full = jnp.repeat(lat[:, None, :], num_layers, axis=1)
        img, _ = generator_apply(
            g_params, [lat_full], input_is_latent=True, noise=p["noises"]
        )
        if img.shape[1] > 256:
            f = img.shape[1] // 256
            img = jax.image.resize(
                img, (b, 256, 256, 3), method="bilinear"
            )
            tgt = jax.image.resize(target, (b, 256, 256, 3), method="bilinear")
        else:
            tgt = target
        p_loss = jnp.sum(lpips_fn(img, tgt))
        n_loss = noise_regularize(p["noises"])
        mse = jnp.mean(jnp.square(img - tgt))
        return p_loss + noise_regularize_weight * n_loss + mse_weight * mse, p_loss

    @jax.jit
    def step(params, opt_state, key, noise_strength, lr_scale):
        (loss, p_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, noise_strength
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        params["noises"] = normalize_noises(params["noises"])
        return params, opt_state, loss, p_loss

    history = []
    for i in range(steps):
        t = i / steps
        lr = get_lr(t, initial_lr)
        ns = latent_std * noise_level * max(0.0, 1.0 - t / noise_ramp) ** 2
        key, sub = jax.random.split(key)
        params, opt_state, loss, p_loss = step(
            params, opt_state, sub, jnp.asarray(ns), jnp.asarray(lr)
        )
        if (i + 1) % 100 == 0:
            history.append((i + 1, float(loss), float(p_loss)))
    return params["latent"], params["noises"], history
