"""Vanilla StyleGAN2 trainer (the reference's multi-device recipe,
`/root/reference/stylegan2/train.py`), TPU-native.

Per iteration: D step (logistic loss, optional ADA augmentation of both
real and fake), lazy R1 every `d_reg_every=16`, G step (non-saturating),
lazy path-length regularization every `g_reg_every=4`, EMA, and the ADA
controller update. DDP (`stylegan2/train.py:425-438`) becomes batch
sharding over the mesh with replicated params; `reduce_loss_dict`
(`distributed.py:104-126`) is implicit in batch-mean losses.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from ideas_tpu.losses import d_logistic_loss, d_r1_penalty, g_nonsaturating_loss
from ideas_tpu.models.stylegan2 import SG2Discriminator, SG2Generator
from ideas_tpu.stylegan2.non_leaking import augment


class SG2Config:
    def __init__(
        self,
        size: int = 256,
        style_dim: int = 512,
        n_mlp: int = 8,
        channel_multiplier: int = 2,
        lr: float = 0.002,
        r1: float = 10.0,
        path_regularize: float = 2.0,
        path_batch_shrink: int = 2,
        d_reg_every: int = 16,
        g_reg_every: int = 4,
        mixing: float = 0.9,
        augment_p: float = 0.0,
        ada_target: float = 0.6,
        ada_length: int = 500 * 1000,
        batch_size: int = 16,
        ema_kimg: float = 10.0,
        compute_dtype: Any = jnp.float32,
    ):
        self.__dict__.update(locals())
        del self.__dict__["self"]
        self.ema_decay = 0.5 ** (32.0 / (ema_kimg * 1000.0))


class SG2State(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_ema: Any
    opt_g: Any
    opt_d: Any
    mean_path_length: jnp.ndarray
    ada_p: jnp.ndarray          # current augmentation probability
    ada_r_t: jnp.ndarray        # running sign(real_pred) statistic


def g_path_regularize(g_apply, g_params, latents, key, mean_path_length,
                      decay: float = 0.01):
    """Path-length regularization (`stylegan2/train.py:85-98`): penalize
    deviation of ||J^T y|| from its running mean, y ~ N(0, 1/HW)."""

    def gen_from_latent(latent):
        img, _ = g_apply(g_params, [latent], input_is_latent=True)
        return img

    def inner(latent):
        img = gen_from_latent(latent)
        noise = jax.random.normal(key, img.shape, img.dtype) / math.sqrt(
            img.shape[1] * img.shape[2]
        )
        return jnp.sum(img * noise)

    grad = jax.grad(inner)(latents)  # (B, n_latent, style_dim)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean(jnp.square(path_lengths - jax.lax.stop_gradient(path_mean)))
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths


class SG2Trainer:
    def __init__(self, cfg: SG2Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.G = SG2Generator(
            size=cfg.size, style_dim=cfg.style_dim, n_mlp=cfg.n_mlp,
            channel_multiplier=cfg.channel_multiplier, dtype=cfg.compute_dtype,
        )
        self.D = SG2Discriminator(
            size=cfg.size, channel_multiplier=cfg.channel_multiplier,
            dtype=cfg.compute_dtype,
        )
        # Reg-adjusted Adam (`stylegan2/train.py:392-404`).
        gr = cfg.g_reg_every / (cfg.g_reg_every + 1)
        dr = cfg.d_reg_every / (cfg.d_reg_every + 1)
        self.tx_g = optax.adam(cfg.lr * gr, b1=0.0 ** gr, b2=0.99 ** gr)
        self.tx_d = optax.adam(cfg.lr * dr, b1=0.0 ** dr, b2=0.99 ** dr)
        self._fns: Dict[Any, Any] = {}

    def init_state(self, key) -> SG2State:
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        z = jnp.zeros((1, cfg.style_dim), jnp.float32)
        x = jnp.zeros((1, cfg.size, cfg.size, 3), jnp.float32)

        @jax.jit
        def _init(k1, k2):
            g_params = self.G.init(k1, [z])
            d_params = self.D.init(k2, x)
            return SG2State(
                step=jnp.zeros((), jnp.int32),
                g_params=g_params,
                d_params=d_params,
                g_ema=jax.tree.map(lambda a: a, g_params),
                opt_g=self.tx_g.init(g_params),
                opt_d=self.tx_d.init(d_params),
                mean_path_length=jnp.zeros(()),
                ada_p=jnp.asarray(cfg.augment_p, jnp.float32),
                ada_r_t=jnp.zeros(()),
            )

        state = _init(k1, k2)
        if self.mesh is not None:
            from ideas_tpu import parallel

            state = parallel.replicate(self.mesh, state)
        return state

    def _generate(self, g_params, key, batch, noise_key=None):
        """Sample with style mixing prob `mixing` and a random inject
        index (`stylegan2/train.py:101-115` + `model.py:551-558`), as ONE
        synthesis pass: the (B, n_latent, style_dim) latent is assembled
        with traced selects instead of branching on host RNG."""
        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(key, 4)
        z1 = jax.random.normal(k1, (batch, cfg.style_dim))
        z2 = jax.random.normal(k2, (batch, cfg.style_dim))
        w1 = self.G.apply(g_params, z1, method=SG2Generator.map_latent)
        w2 = self.G.apply(g_params, z2, method=SG2Generator.map_latent)
        n_lat = self.G.n_latent
        inject = jax.random.randint(k3, (), 1, n_lat)
        mix = jax.random.uniform(k4, ()) < cfg.mixing
        pos = jnp.arange(n_lat)[None, :, None]
        use2 = (pos >= inject) & mix
        latent = jnp.where(use2, w2[:, None, :], w1[:, None, :])
        img, _ = self.G.apply(
            g_params, [latent], input_is_latent=True, noise_key=noise_key
        )
        return img

    def build_step(self, do_r1: bool, do_path: bool, use_ada: bool):
        cfg = self.cfg

        def d_loss_fn(d_params, g_params, x, ada_p, keys):
            fake = self._generate(g_params, keys["z_d"], x.shape[0],
                                  noise_key=keys["n_d"])
            if use_ada:
                x = augment(keys["aug_r"], x, ada_p)
                fake = augment(keys["aug_f"], fake, ada_p)
            fake_pred = self.D.apply(d_params, jax.lax.stop_gradient(fake))
            real_pred = self.D.apply(d_params, x)
            loss = d_logistic_loss(real_pred, fake_pred)
            return loss, {"d": loss, "real_score": jnp.mean(real_pred),
                          "fake_score": jnp.mean(fake_pred),
                          "r_t": jnp.mean(jnp.sign(real_pred))}

        def g_loss_fn(g_params, d_params, batch, ada_p, keys):
            fake = self._generate(g_params, keys["z_g"], batch,
                                  noise_key=keys["n_g"])
            if use_ada:
                fake = augment(keys["aug_g"], fake, ada_p)
            fake_pred = self.D.apply(d_params, fake)
            loss = g_nonsaturating_loss(fake_pred)
            return loss, {"g": loss}

        def step_fn(state: SG2State, x, key):
            metrics = {}
            names = ("z_d", "n_d", "aug_r", "aug_f", "z_g", "n_g", "aug_g",
                     "z_r1", "z_pl", "n_pl", "pl")
            keys = dict(zip(names, jax.random.split(key, len(names))))
            ada_p = state.ada_p

            # D step
            (dl, daux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, state.g_params, x, ada_p, keys
            )
            upd, opt_d = self.tx_d.update(d_grads, state.opt_d, state.d_params)
            d_params = optax.apply_updates(state.d_params, upd)
            metrics.update(daux)

            # R1 every d_reg_every (`stylegan2/train.py:215-227`)
            if do_r1:
                def r1_fn(d_params, x):
                    pen = d_r1_penalty(lambda img: self.D.apply(d_params, img), x)
                    return cfg.r1 / 2 * pen * cfg.d_reg_every, pen

                (rl, pen), r1_grads = jax.value_and_grad(r1_fn, has_aux=True)(
                    d_params, x
                )
                upd, opt_d = self.tx_d.update(r1_grads, opt_d, d_params)
                d_params = optax.apply_updates(d_params, upd)
                metrics["r1"] = pen

            # G step
            (gl, gaux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, d_params, x.shape[0], ada_p, keys
            )
            upd, opt_g = self.tx_g.update(g_grads, state.opt_g, state.g_params)
            g_params = optax.apply_updates(state.g_params, upd)
            metrics.update(gaux)

            # Path-length reg every g_reg_every (`stylegan2/train.py:247-270`)
            mean_path_length = state.mean_path_length
            if do_path:
                pb = max(1, x.shape[0] // cfg.path_batch_shrink)
                z = jax.random.normal(keys["z_pl"], (pb, cfg.style_dim))

                def path_fn(g_params):
                    latent = self.G.apply(g_params, z, method=SG2Generator.map_latent)
                    latents = jnp.repeat(latent[:, None, :], self.G.n_latent, 1)
                    pen, pm, pl = g_path_regularize(
                        self.G.apply, g_params, latents, keys["pl"],
                        mean_path_length,
                    )
                    weighted = cfg.path_regularize * cfg.g_reg_every * pen
                    return weighted, (pen, pm, pl)

                (wl, (pen, pm, pl)), p_grads = jax.value_and_grad(
                    path_fn, has_aux=True
                )(g_params)
                upd, opt_g = self.tx_g.update(p_grads, opt_g, g_params)
                g_params = optax.apply_updates(g_params, upd)
                mean_path_length = pm
                metrics["path"] = pen
                metrics["path_length"] = jnp.mean(pl)

            # EMA
            g_ema = jax.tree.map(
                lambda e, p: e * cfg.ema_decay + p * (1 - cfg.ema_decay),
                state.g_ema, g_params,
            )

            # ADA controller (`stylegan2/train.py:151-154,194-213`): push p
            # toward keeping E[sign(real_pred)] at ada_target.
            if use_ada:
                r_t = 0.95 * state.ada_r_t + 0.05 * metrics["r_t"]
                adjust = jnp.sign(r_t - cfg.ada_target) * (
                    x.shape[0] / cfg.ada_length
                )
                ada_p = jnp.clip(state.ada_p + adjust, 0.0, 1.0)
            else:
                r_t = state.ada_r_t

            return state.replace(
                step=state.step + 1,
                g_params=g_params,
                d_params=d_params,
                g_ema=g_ema,
                opt_g=opt_g,
                opt_d=opt_d,
                mean_path_length=mean_path_length,
                ada_p=ada_p,
                ada_r_t=r_t,
            ), metrics

        return step_fn

    def step_fn(self, do_r1: bool, do_path: bool, use_ada: bool = False,
                donate: bool = False):
        key = (do_r1, do_path, use_ada, donate)
        if key not in self._fns:
            self._fns[key] = jax.jit(
                self.build_step(do_r1, do_path, use_ada),
                donate_argnums=(0,) if donate else (),
            )
        return self._fns[key]
