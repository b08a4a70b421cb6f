"""IDEAS training: jitted alternating-GAN steps + CLI driver.

Rebuilds the reference hot loop (`/root/reference/train.py:33-221`)
functionally:

  * `requires_grad` flag flipping (`train.py:48-54,135-141`) becomes
    *which parameter subtree each loss is differentiated against* — the
    D step takes grads w.r.t. (Dreal, Dco, Ddist) only, the G step w.r.t.
    (E, G, Gstru, Ex) only.
  * the `retain_graph=True` double backward (`train.py:210-216`) becomes
    one joint grad: Loss_total's Ex-subtree gradient equals
    lambda_Ex * dLoss_Ex/dEx (the only path from Ex params into
    Loss_total is the lambda_Ex * Loss_Ex term), so the extractor update
    divides that subtree by lambda_Ex instead of running a second backward.
  * R1 every `d_reg_every` iters (`train.py:105-129`) is a second
    discriminator update inside the same jitted step, using the
    *already-updated* D parameters (the reference steps d_optim twice),
    with nested `jax.grad` standing in for `create_graph=True`.
  * EMA (`utils.py:55-60`) is a pytree lerp.
  * the whole iteration — both phases, all three optimizers, EMA — is ONE
    compiled XLA program (two variants: with / without the R1 phase), so
    the six generator forwards and three discriminator passes get
    scheduled together with no host round-trips.

Data parallelism: batches sharded over a 1-D mesh, parameters replicated;
the batch-mean losses make XLA insert the gradient all-reduce over ICI
(the DDP allreduce of `stylegan2/train.py:425-438`).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, NamedTuple, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ideas_tpu import parallel
from ideas_tpu.config import TrainConfig
from ideas_tpu.losses import (
    d_logistic_loss,
    d_r1_penalty,
    g_nonsaturating_loss,
    l1_loss,
    patchify_image,
)
from ideas_tpu.models import init_model
from ideas_tpu.optim import make_adam
from ideas_tpu.stego import (
    message_from_tensor_nhwc,
    tensor_nhwc_from_message,
)

G_GROUP = ("E", "G", "Gstru")
EX_GROUP = ("Ex",)
D_GROUP = ("Dreal", "Dco", "Ddist")
EMA_GROUP = ("E", "G", "Gstru", "Ex")


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    rng: jax.Array  # evolves inside the jitted step (host RNG calls are
    #                 eager device ops — expensive on remote backends)
    params: Dict[str, Any]
    ema: Dict[str, Any]
    opt_g: Any
    opt_ex: Any
    opt_d: Any


class Trainer:
    """Owns the model definitions and the compiled train/eval steps."""

    def __init__(self, cfg: TrainConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        # Layers read the mesh through this ambient global to place
        # spatial-sharding constraints (see parallel.auto_spatial_constraint).
        parallel.set_ambient_mesh(mesh)
        self.models = {
            "E": init_model("DisentanglementEncoder", cfg),
            "G": init_model("Generator", cfg),
            "Gstru": init_model("StructureGenerator", cfg),
            "Ex": init_model("TensorExtractor", cfg),
            "Dreal": init_model("ImageLevelDiscriminator", cfg),
            "Dco": init_model("CooccurenceDiscriminator", cfg),
            "Ddist": init_model("DistributionDiscriminator", cfg),
        }
        # Optimizers (train.py:416-432): Adam(0, 0.99); the D optimizer's
        # lr/betas are scaled by d_reg_every/(d_reg_every+1) (lazy-reg
        # correction from StyleGAN2).
        # 0.0**rr == 0.0, so all three run b1=0 and qualify for the
        # compact (no-first-moment) Adam behind cfg.compact_adam.
        lr, rr = cfg.lr, cfg.d_reg_every / (cfg.d_reg_every + 1)
        self.tx_g = make_adam(cfg, lr, b2=0.99, eps=1e-8)
        self.tx_ex = make_adam(cfg, lr, b2=0.99, eps=1e-8)
        self.tx_d = make_adam(cfg, lr * rr, b2=0.99 ** rr, eps=1e-8)
        self._step_fns: Dict[bool, Any] = {}
        self._tag_fn_ids: Dict[str, int] = {}

    # -- initialization -----------------------------------------------------

    def init_state(self, key: jax.Array) -> TrainState:
        cfg = self.cfg
        res = cfg.image_size // 16
        ks = jax.random.split(key, 8)
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        s = jnp.zeros((1, res, res, cfg.structure_channel), jnp.float32)
        t = jnp.zeros((1, cfg.texture_channel), jnp.float32)
        z = jnp.zeros((1, res, res, cfg.N), jnp.float32)
        ps = cfg.image_size // 4
        patch = jnp.zeros((1, ps, ps, 3), jnp.float32)
        refs = jnp.zeros((cfg.ref_crop, ps, ps, 3), jnp.float32)

        @jax.jit
        def _init(ks):
            params = {
                "E": self.models["E"].init(ks[0], x),
                "G": self.models["G"].init(ks[1], s, t),
                "Gstru": self.models["Gstru"].init(ks[2], z),
                "Ex": self.models["Ex"].init(ks[3], s),
                "Dreal": self.models["Dreal"].init(ks[4], x),
                "Dco": self.models["Dco"].init(ks[5], patch, refs, cfg.ref_crop),
                "Ddist": self.models["Ddist"].init(ks[6], t),
            }
            # EMA copies start equal to the online weights
            # (accumulate(..., 0) at train.py:411-414).
            ema = {k: jax.tree.map(lambda a: a, params[k]) for k in EMA_GROUP}
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                rng=ks[7],
                params=params,
                ema=ema,
                opt_g=self.tx_g.init({k: params[k] for k in G_GROUP}),
                opt_ex=self.tx_ex.init({k: params[k] for k in EX_GROUP}),
                opt_d=self.tx_d.init({k: params[k] for k in D_GROUP}),
            )

        if self.mesh is not None:
            # Produce GLOBAL replicated arrays directly from the init
            # program: one jitted program, no separate host->device
            # re-placement, and — unlike a device_put of process-local
            # arrays — valid under multi-process `jax.distributed`
            # (every process runs the same deterministic init).
            return jax.jit(
                _init, out_shardings=parallel.replicated(self.mesh)
            )(ks)
        return _init(ks)

    # -- shared forward pieces ----------------------------------------------

    def _gen_forward(self, params, x, key):
        """E/G/Gstru forward: the three synthesized images + latents
        (train.py:56-71 and 143-158).

        TPU note: the reference runs G three times (X1=G(S1,T1),
        X2=G(S2,T1), X3=G(S2,T2)); modulated convs take per-sample
        styles, so the three calls fuse into ONE batched G forward on a
        3B batch — identical math, 3x larger convs for the MXU."""
        cfg = self.cfg
        kz, kt = jax.random.split(key)
        s1, t1 = self.models["E"].apply(params["E"], x)
        b, res = x.shape[0], cfg.image_size // 16
        z = jax.random.uniform(kz, (b, res, res, cfg.N), jnp.float32, -1.0, 1.0)
        s2 = self.models["Gstru"].apply(params["Gstru"], z)
        t2 = jax.random.uniform(kt, t1.shape, jnp.float32, -1.0, 1.0)
        s_cat = jnp.concatenate([s1, s2, s2], axis=0)
        t_cat = jnp.concatenate([t1, t1, t2], axis=0)
        hx = self.models["G"].apply(params["G"], s_cat, t_cat)
        hx1, hx2, hx3 = jnp.split(hx, 3, axis=0)
        return dict(s1=s1, t1=t1, z=z, s2=s2, t2=t2,
                    hx1=hx1, hx2=hx2, hx3=hx3, hx_cat=hx)

    # -- the jitted iteration -----------------------------------------------

    def build_train_step(self, do_r1: bool):
        cfg = self.cfg
        models = self.models

        def d_loss_fn(d_params, x, fwd, keys):
            fake_pred = models["Dreal"].apply(d_params["Dreal"], fwd["hx_cat"])
            real_pred = models["Dreal"].apply(d_params["Dreal"], x)
            d_real = d_logistic_loss(real_pred, fake_pred)

            fake_patch = patchify_image(keys["fp"], fwd["hx2"], cfg.n_crop)
            real_patch = patchify_image(keys["rp"], x, cfg.n_crop)
            ref_patch = patchify_image(keys["ref"], x, cfg.ref_crop * cfg.n_crop)
            fake_tex_pred, ref_input = models["Dco"].apply(
                d_params["Dco"], fake_patch, ref_patch, cfg.ref_crop
            )
            real_tex_pred, _ = models["Dco"].apply(
                d_params["Dco"], real_patch, ref_input=ref_input
            )
            d_texture = d_logistic_loss(real_tex_pred, fake_tex_pred)

            fake_dist = models["Ddist"].apply(d_params["Ddist"], fwd["t1"])
            real_dist = models["Ddist"].apply(d_params["Ddist"], fwd["t2"])
            d_dist = d_logistic_loss(real_dist, fake_dist)

            total = d_real + d_texture + d_dist
            aux = {
                "D_real_loss": d_real,
                "D_texture_loss": d_texture,
                "D_dist_loss": d_dist,
            }
            return total, aux

        def r1_loss_fn(d_params, x, t2, keys):
            # R1 penalties on the real inputs of each critic
            # (train.py:105-129), using the same patch draws as the D phase.
            real_r1 = d_r1_penalty(
                lambda img: models["Dreal"].apply(d_params["Dreal"], img), x
            )
            real_patch = patchify_image(keys["rp"], x, cfg.n_crop)
            ref_patch = patchify_image(keys["ref"], x, cfg.ref_crop * cfg.n_crop)

            def co_critic(p):
                out, _ = models["Dco"].apply(d_params["Dco"], p, ref_patch, cfg.ref_crop)
                return out

            tex_r1 = d_r1_penalty(co_critic, real_patch)
            dist_r1 = d_r1_penalty(
                lambda t: models["Ddist"].apply(d_params["Ddist"], t), t2
            )
            total = (
                cfg.real_r1 / 3 * real_r1
                + cfg.texture_r1 / 3 * tex_r1
                + cfg.dist_r1 / 3 * dist_r1
            ) * cfg.d_reg_every
            aux = {
                "D_real_r1_loss": real_r1,
                "D_texture_r1_loss": tex_r1,
                "D_dist_r1_loss": dist_r1,
            }
            return total, aux

        def g_loss_fn(ge_params, d_params, x, step, keys):
            fwd = self._gen_forward(ge_params, x, keys["gen"])
            g_rec = l1_loss(fwd["hx1"], x)

            fake_pred = models["Dreal"].apply(d_params["Dreal"], fwd["hx_cat"])
            g_real = g_nonsaturating_loss(fake_pred)

            fake_dist = models["Ddist"].apply(d_params["Ddist"], fwd["t1"])
            e_dist = g_nonsaturating_loss(fake_dist)

            fake_patch = patchify_image(keys["fp"], fwd["hx2"], cfg.n_crop)
            ref_patch = patchify_image(keys["ref"], x, cfg.ref_crop * cfg.n_crop)
            fake_patch_pred, _ = models["Dco"].apply(
                d_params["Dco"], fake_patch, ref_patch, cfg.ref_crop
            )
            g_texture = g_nonsaturating_loss(fake_patch_pred)

            # Container curriculum (train.py:178-181): hx3 after 80%.
            use_x3 = step > (0.8 * cfg.num_iters)
            container = jnp.where(use_x3, fwd["hx3"], fwd["hx2"])
            s2_hat, _ = models["E"].apply(ge_params["E"], container)
            e_stru = l1_loss(s2_hat, fwd["s2"])

            z_hat = models["Ex"].apply(ge_params["Ex"], s2_hat)
            ex_loss = l1_loss(z_hat, fwd["z"])
            if cfg.ex_margin > 0:
                # Decision-margin hinge (framework extension, off by
                # default): with sigma=1 the decoded bit is sign(z_hat),
                # so penalize extractions inside the margin band around
                # the bin boundary instead of only absolute error.
                sgn = jnp.sign(fwd["z"])
                ex_loss = ex_loss + jnp.mean(
                    jax.nn.relu(cfg.ex_margin - z_hat * sgn)
                )

            loss_g = g_rec + g_texture + 2.0 * g_real
            loss_e = e_dist + e_stru
            total = loss_g + loss_e + cfg.lambda_Ex * ex_loss
            aux = {
                "G_rec_loss": g_rec,
                "G_real_loss": g_real,
                "G_texture_loss": g_texture,
                "E_dist_loss": e_dist,
                "E_stru_loss": e_stru,
                "Ex_loss": ex_loss,
                "Loss_total": total,
            }
            return total, aux

        def train_step(state: TrainState, x, key=None):
            """One full iteration. `key=None` draws from state.rng (the
            production path — no host RNG round trip); an explicit key
            overrides it (tests)."""
            metrics = {}
            base = state.rng if key is None else key
            next_rng, base = jax.random.split(base)
            names = ("gen_d", "fp_d", "rp_d", "ref_d", "gen_g", "fp_g", "ref_g")
            keys = dict(zip(names, jax.random.split(base, len(names))))
            if cfg.share_phase_noise:
                # One draw serves both phases; the duplicated generator
                # forward then CSEs away (see TrainConfig.share_phase_noise).
                keys["gen_g"] = keys["gen_d"]
                keys["fp_g"] = keys["fp_d"]
                keys["ref_g"] = keys["ref_d"]

            params = state.params
            g_params = {k: params[k] for k in G_GROUP + EX_GROUP}
            d_params = {k: params[k] for k in D_GROUP}

            # ---- D phase (train.py:44-102): generator forward is not
            # differentiated (grads only w.r.t. d_params).
            fwd_d = self._gen_forward(params, x, keys["gen_d"])
            (d_total, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, x,
                jax.tree.map(jax.lax.stop_gradient, fwd_d),
                {"fp": keys["fp_d"], "rp": keys["rp_d"], "ref": keys["ref_d"]},
            )
            updates, opt_d = self.tx_d.update(d_grads, state.opt_d, d_params)
            d_params = optax.apply_updates(d_params, updates)
            metrics.update(d_aux)

            # ---- R1 phase (lazy regularization): second D update with the
            # refreshed d_params, same patches, same T2.
            if do_r1:
                (r1_total, r1_aux), r1_grads = jax.value_and_grad(
                    r1_loss_fn, has_aux=True
                )(d_params, x, fwd_d["t2"],
                  {"rp": keys["rp_d"], "ref": keys["ref_d"]})
                updates, opt_d = self.tx_d.update(r1_grads, opt_d, d_params)
                d_params = optax.apply_updates(d_params, updates)
                metrics.update(r1_aux)

            # ---- G/E/Ex phase (train.py:131-216): fresh forward with fresh
            # noise, updated D params, one joint backward.
            ge_params = {k: params[k] for k in G_GROUP + EX_GROUP}
            (g_total, g_aux), ge_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                ge_params, d_params, x, state.step,
                {"gen": keys["gen_g"], "fp": keys["fp_g"], "ref": keys["ref_g"]},
            )
            metrics.update(g_aux)

            g_grads = {k: ge_grads[k] for k in G_GROUP}
            # dLoss_total/dEx == lambda_Ex * dLoss_Ex/dEx -> rescale.
            ex_grads = {
                k: jax.tree.map(lambda g: g / cfg.lambda_Ex, ge_grads[k])
                for k in EX_GROUP
            }
            g_sub = {k: ge_params[k] for k in G_GROUP}
            ex_sub = {k: ge_params[k] for k in EX_GROUP}
            updates, opt_g = self.tx_g.update(g_grads, state.opt_g, g_sub)
            g_sub = optax.apply_updates(g_sub, updates)
            updates, opt_ex = self.tx_ex.update(ex_grads, state.opt_ex, ex_sub)
            ex_sub = optax.apply_updates(ex_sub, updates)

            new_params = {**d_params, **g_sub, **ex_sub}

            # ---- EMA (train.py:218-221, utils.py:55-60).
            decay = cfg.ema_decay
            ema = jax.tree.map(
                lambda e, p: e * decay + p * (1.0 - decay),
                state.ema,
                {k: new_params[k] for k in EMA_GROUP},
            )

            new_state = state.replace(
                step=state.step + 1,
                rng=next_rng,
                params=new_params,
                ema=ema,
                opt_g=opt_g,
                opt_ex=opt_ex,
                opt_d=opt_d,
            )
            return new_state, metrics

        return train_step

    def train_step_fn(self, do_r1: bool, donate: bool = False,
                      device_data_fn=None, data_fn_tag: str = None):
        """Compiled step. `donate=True` donates the input state's buffers
        (halves peak memory in the production loop; leave False when the
        caller still needs the old state, e.g. tests).

        `device_data_fn` (key -> (B, H, W, 3) batch in [-1, 1]) moves data
        generation *inside* the compiled program (see
        data/device_synthetic.py): the returned step takes `state` only,
        draws the batch from `state.rng`, and performs zero host->device
        transfer per iteration — the relay transfer of an fp32 256^2
        batch otherwise costs ~142 ms/step (PERF.md).

        `device_data_fn` must be a STABLE callable across calls — the
        cache keys on its identity, and a fresh lambda per call means a
        fresh multi-minute remote recompile each time. Callers that
        can't keep one callable alive pass `data_fn_tag` (a stable name)
        to key the cache instead."""
        cache_key = (do_r1, donate,
                     data_fn_tag if data_fn_tag is not None
                     else id(device_data_fn))
        if data_fn_tag is not None:
            # A tag aliases the cache across callable identities; guard
            # against two DIFFERENT data fns sharing a tag, which would
            # silently train on whichever compiled first.
            prev = self._tag_fn_ids.setdefault(data_fn_tag, id(device_data_fn))
            if prev != id(device_data_fn):
                raise ValueError(
                    f"data_fn_tag {data_fn_tag!r} was first used with a "
                    "different device_data_fn; tags must map 1:1 to data "
                    "sources (use a new tag for a new data fn)"
                )
        if cache_key not in self._step_fns:
            inner = self.build_train_step(do_r1)
            if device_data_fn is None:
                fn = inner
            else:
                def fn(state: TrainState):
                    data_key, rest = jax.random.split(state.rng)
                    x = device_data_fn(data_key)
                    if self.mesh is not None:
                        x = jax.lax.with_sharding_constraint(
                            x, parallel.batch_sharding(self.mesh)
                        )
                    return inner(state.replace(rng=rest), x)

            self._step_fns[cache_key] = jax.jit(
                fn, donate_argnums=(0,) if donate else ()
            )
        return self._step_fns[cache_key]

    def train_step_uint8_fn(self, do_r1: bool, donate: bool = False):
        """Compiled step taking `(state, uint8 imgs NHWC, bool flip mask)`.

        The RandomHorizontalFlip + Normalize(0.5, 0.5) host transforms
        (`/root/reference/train.py:444-451`) run on device instead, so
        the per-iteration host->device payload is raw uint8 — 4x fewer
        bytes over the relay link (PERF.md)."""
        cache_key = (do_r1, donate, "uint8")
        if cache_key not in self._step_fns:
            inner = self.build_train_step(do_r1)

            def fn(state: TrainState, u8, flips):
                x = u8.astype(jnp.float32) / 127.5 - 1.0
                x = jnp.where(flips[:, None, None, None],
                              x[:, :, ::-1, :], x)
                return inner(state, x)

            self._step_fns[cache_key] = jax.jit(
                fn, donate_argnums=(0,) if donate else ()
            )
        return self._step_fns[cache_key]

    # -- hide / reveal (the sampling block, train.py:249-293) ---------------
    # All inference paths are jitted (cached per static (sigma, delta)):
    # eager per-op dispatch is pathologically slow on remote-compile TPU
    # backends, and these are the production serving paths.

    def _hide_fn(self, sigma: int, delta: float):
        cfg = self.cfg
        res = cfg.image_size // 16

        @jax.jit
        def fn(ema, message, texture, key):
            z = tensor_nhwc_from_message(message, cfg.N, res,
                                         sigma=sigma, delta=delta, key=key)
            s2 = self.models["Gstru"].apply(ema["Gstru"], z)
            img = self.models["G"].apply(ema["G"], s2, texture)
            return img, z

        key = ("hide", sigma, delta)
        if key not in self._step_fns:
            self._step_fns[key] = fn
        return self._step_fns[key]

    def _reveal_fn(self, sigma: int):
        @jax.jit
        def fn(ema, image):
            s2_hat, _ = self.models["E"].apply(ema["E"], image)
            z_hat = self.models["Ex"].apply(ema["Ex"], s2_hat)
            msg = message_from_tensor_nhwc(z_hat, sigma=sigma)
            return msg, z_hat

        key = ("reveal", sigma)
        if key not in self._step_fns:
            self._step_fns[key] = fn
        return self._step_fns[key]

    def hide(self, state: TrainState, message, texture, key, sigma=1, delta=0.5):
        """message bits (B, N*res*res*sigma) -> stego image, via EMA nets."""
        return self._hide_fn(sigma, delta)(state.ema, message, texture, key)

    def reveal(self, state: TrainState, image, sigma=1):
        """stego image -> extracted message bits."""
        return self._reveal_fn(sigma)(state.ema, image)

    def eval_roundtrip(self, state: TrainState, key, x=None) -> Dict[str, float]:
        """The online integration test (train.py:249-293): random message
        -> hide -> reveal -> ACC. One jitted program.

        Matches the reference's container curriculum: before 80% of
        num_iters the container is X2_hat = G(S2, T1) with T1 = E(x)
        (pass the current batch `x`); after, it is X3_hat = G(S2, T2)
        with random texture. With x=None the X3 path is always used
        (the serving/hide scenario)."""
        cfg = self.cfg
        res = cfg.image_size // 16

        cache_key = ("eval_rt", x is not None)
        if cache_key not in self._step_fns:

            @jax.jit
            def fn(ema, key, step, x):
                k1, k2, k3 = jax.random.split(key, 3)
                # Batch comes from the input when one is given (serving
                # checkpoints are evaluated at whatever batch the caller
                # has); cfg.batch_size only seeds the x=None path.
                b = cfg.batch_size if x is None else x.shape[0]
                msg = jax.random.bernoulli(
                    k1, 0.5, (b, cfg.N * res * res)
                ).astype(jnp.float32)
                t2 = jax.random.uniform(
                    k2, (b, cfg.texture_channel), jnp.float32, -1.0, 1.0
                )
                if x is not None:
                    _, t1 = self.models["E"].apply(ema["E"], x)
                    use_x3 = step > (0.8 * cfg.num_iters)
                    texture = jnp.where(use_x3, t2, t1)
                else:
                    texture = t2
                z = tensor_nhwc_from_message(msg, cfg.N, res,
                                             sigma=1, delta=0.5, key=k3)
                s2 = self.models["Gstru"].apply(ema["Gstru"], z)
                img = self.models["G"].apply(ema["G"], s2, texture)
                s2_hat, _ = self.models["E"].apply(ema["E"], img)
                z_hat = self.models["Ex"].apply(ema["Ex"], s2_hat)
                msg_hat = message_from_tensor_nhwc(z_hat, sigma=1)
                ber = jnp.mean(jnp.abs(msg - msg_hat))
                tensor_l1 = jnp.mean(jnp.abs(z_hat - z))
                return {"ACC": 1.0 - ber, "tensor_L1": tensor_l1}

            self._step_fns[cache_key] = fn
        return self._step_fns[cache_key](state.ema, key, state.step, x)

    def sample_images(self, state: TrainState, x, key):
        """EMA sample grid rows (X1_hat, X2_hat, X3_hat) for monitoring
        (train.py:249-268). Jitted once."""
        cfg = self.cfg
        res = cfg.image_size // 16

        if "sample" not in self._step_fns:

            @jax.jit
            def fn(ema, x, key):
                k1, k2 = jax.random.split(key)
                b = x.shape[0]
                s1, t1 = self.models["E"].apply(ema["E"], x)
                z = jax.random.uniform(k1, (b, res, res, cfg.N), jnp.float32, -1, 1)
                s2 = self.models["Gstru"].apply(ema["Gstru"], z)
                t2 = jax.random.uniform(k2, t1.shape, jnp.float32, -1, 1)
                hx = self.models["G"].apply(
                    ema["G"],
                    jnp.concatenate([s1, s2, s2], axis=0),
                    jnp.concatenate([t1, t1, t2], axis=0),
                )
                return tuple(jnp.split(hx, 3, axis=0))

            self._step_fns["sample"] = fn
        return self._step_fns["sample"](state.ema, x, key)
