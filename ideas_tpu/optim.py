"""Compact Adam for the b1=0 regime.

The reference trains every net with Adam(betas=(0, 0.99))
(`/root/reference/train.py:416-432`): the first moment is
`mu = (1-b1)*g + b1*mu = g`, i.e. the gradient itself, and its bias
correction is `1 - b1**t = 1`. `optax.adam` still materializes a full
`mu` pytree — one params-worth of HBM capacity plus a read+write per
step for a tensor that always equals an operand already in registers.

`adam_b1zero` stores ONLY the second moment (optionally bfloat16) and
reproduces `optax.adam(lr, b1=0, b2, eps)`'s update sequence exactly in
the fp32 case (pinned in tests/test_optim.py). Update rule, matching
`optax.scale_by_adam`:

    nu_t   = b2 * nu_{t-1} + (1-b2) * g^2
    update = -lr * g / (sqrt(nu_t / (1 - b2^t)) + eps)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdamB1ZeroState(NamedTuple):
    count: jnp.ndarray  # scalar int32
    nu: Any  # second-moment pytree


def adam_b1zero(
    learning_rate: float,
    b2: float = 0.99,
    eps: float = 1e-8,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """optax.adam(lr, b1=0, b2, eps) without the redundant first moment.

    nu_dtype: storage dtype for the second moment (None = param dtype).
    The moment arithmetic (decay, bias correction, rsqrt) always runs in
    float32; only the carried state is cast, so bfloat16 storage costs
    one round-trip rounding per step.
    """

    def init_fn(params):
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return AdamB1ZeroState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        # 1 - b2^t in fp32 (same as optax.bias_correction).
        bc = 1.0 - jnp.power(jnp.asarray(b2, jnp.float32), count)

        def nu32(g, n):
            g32 = g.astype(jnp.float32)
            return b2 * n.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)

        # Two passes over the trees; XLA CSEs the duplicated nu compute.
        new_updates = jax.tree.map(
            lambda g, n: (g.astype(jnp.float32)
                          / (jnp.sqrt(nu32(g, n) / bc) + eps)
                          * (-learning_rate)).astype(g.dtype),
            updates, state.nu,
        )
        new_nu = jax.tree.map(
            lambda g, n: nu32(g, n).astype(nu_dtype or n.dtype),
            updates, state.nu,
        )
        return new_updates, AdamB1ZeroState(count=count, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_adam(cfg, learning_rate: float, b2: float = 0.99,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """The Trainer's optimizer factory: reference-faithful optax.adam by
    default; the compact b1=0 variant behind cfg.compact_adam."""
    if getattr(cfg, "compact_adam", False):
        nu_dtype = jnp.dtype(getattr(cfg, "adam_nu_dtype", "float32"))
        return adam_b1zero(learning_rate, b2=b2, eps=eps, nu_dtype=nu_dtype)
    return optax.adam(learning_rate, b1=0.0, b2=b2, eps=eps)
