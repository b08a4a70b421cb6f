"""Compact b1=0 Adam (`ideas_tpu/optim.py`) vs optax.adam.

The reference's optimizers are all Adam(betas=(0, 0.99)) with the
lazy-reg-scaled D variant (`/root/reference/train.py:416-432`); the
compact transform must reproduce optax.adam's update sequence exactly
when the second moment is stored fp32.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from ideas_tpu.optim import adam_b1zero, make_adam


def _tree(key, scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": jax.random.normal(k1, (7, 5)) * scale,
        "b": jax.random.normal(k2, (5,)) * scale,
        "nested": {"k": jax.random.normal(k3, (3, 2, 4)) * scale},
    }


@pytest.mark.parametrize("lr,b2", [(2e-3, 0.99), (2e-3 * 16 / 17, 0.99 ** (16 / 17))])
def test_exact_parity_with_optax_adam(lr, b2):
    params = _tree(jax.random.PRNGKey(0))
    ref_tx = optax.adam(lr, b1=0.0, b2=b2, eps=1e-8)
    new_tx = adam_b1zero(lr, b2=b2, eps=1e-8)
    ref_state, new_state = ref_tx.init(params), new_tx.init(params)
    ref_params = new_params = params
    for step in range(5):
        grads = _tree(jax.random.PRNGKey(step + 1), scale=0.1 * (step + 1))
        ref_up, ref_state = ref_tx.update(grads, ref_state, ref_params)
        new_up, new_state = new_tx.update(grads, new_state, new_params)
        for rp, np_ in zip(jax.tree.leaves(ref_up), jax.tree.leaves(new_up)):
            assert jnp.allclose(rp, np_, atol=1e-7, rtol=1e-6), step
        ref_params = optax.apply_updates(ref_params, ref_up)
        new_params = optax.apply_updates(new_params, new_up)
    for rp, np_ in zip(jax.tree.leaves(ref_params), jax.tree.leaves(new_params)):
        assert jnp.allclose(rp, np_, atol=1e-7, rtol=1e-6)


def test_state_is_second_moment_only():
    params = _tree(jax.random.PRNGKey(0))
    state = adam_b1zero(1e-3).init(params)
    # count + nu, nothing else; nu mirrors the param tree.
    assert jax.tree.structure(state.nu) == jax.tree.structure(params)
    n_state = sum(x.size for x in jax.tree.leaves(state.nu))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_state == n_params  # optax.adam would carry 2x


def test_bf16_nu_close_and_halved():
    params = _tree(jax.random.PRNGKey(0))
    tx32 = adam_b1zero(1e-3, nu_dtype=jnp.float32)
    tx16 = adam_b1zero(1e-3, nu_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(s16.nu))
    p32 = p16 = params
    for step in range(10):
        grads = _tree(jax.random.PRNGKey(100 + step), scale=0.1)
        u32, s32 = tx32.update(grads, s32, p32)
        u16, s16 = tx16.update(grads, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        # bf16 nu has ~8-bit mantissa; rsqrt halves the relative error.
        assert jnp.allclose(a, b, rtol=3e-2, atol=3e-5)


def test_make_adam_dispatch():
    class Cfg:
        compact_adam = True
        adam_nu_dtype = "bfloat16"

    params = {"w": jnp.ones((4, 4))}
    tx = make_adam(Cfg(), 1e-3)
    state = tx.init(params)
    assert state.nu["w"].dtype == jnp.bfloat16

    class RefCfg:
        compact_adam = False

    state = make_adam(RefCfg(), 1e-3).init(params)
    # optax.adam state: (ScaleByAdamState(count, mu, nu), EmptyState)
    assert hasattr(state[0], "mu")
