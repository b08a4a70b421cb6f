"""Round-trip property tests for the message <-> tensor codec
(reference semantics: /root/reference/utils.py:74-97)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.stego import message_to_tensor, tensor_to_message


@pytest.mark.parametrize("sigma", [1, 2, 3, 4])
@pytest.mark.parametrize("delta", [0.0, 0.25, 0.49])
def test_roundtrip_exact(sigma, delta):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    bits = jax.random.bernoulli(k1, 0.5, (4, 8 * 16 * sigma)).astype(jnp.float32)
    z = message_to_tensor(bits, sigma=sigma, delta=delta, key=k2)
    assert z.shape == (4, 8 * 16)
    # values stay strictly inside (-1, 1) for delta < 0.5
    assert np.all(np.abs(np.asarray(z)) < 1.0)
    out = tensor_to_message(z, sigma=sigma)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


@pytest.mark.parametrize("sigma", [1, 2])
def test_roundtrip_under_noise_within_margin(sigma):
    """Perturbations below (0.5 - delta)*step must not flip any bit."""
    delta = 0.25
    step = 2.0 / (2 ** sigma)
    margin = (0.5 - delta) * step
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    bits = jax.random.bernoulli(k1, 0.5, (8, 64 * sigma)).astype(jnp.float32)
    z = message_to_tensor(bits, sigma=sigma, delta=delta, key=k2)
    noise = jax.random.uniform(k3, z.shape, jnp.float32, -margin * 0.99, margin * 0.99)
    out = tensor_to_message(z + noise, sigma=sigma)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))


def test_bin_centres_sigma1():
    # sigma=1: bit 0 -> -0.5, bit 1 -> +0.5 (step = 1).
    bits = jnp.asarray([[0.0, 1.0, 1.0, 0.0]])
    z = message_to_tensor(bits, sigma=1, delta=0.0)
    np.testing.assert_allclose(np.asarray(z), [[-0.5, 0.5, 0.5, -0.5]], atol=1e-7)


def test_bit_interleaving_matches_reference_layout():
    # sigma=2: reference packs message[:, 0::2] as MSB, message[:, 1::2] as LSB.
    bits = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])  # groups: (1,0)=2, (0,1)=1
    z = message_to_tensor(bits, sigma=2, delta=0.0)
    step = 0.5
    want = [[step * 2.5 - 1.0, step * 1.5 - 1.0]]
    np.testing.assert_allclose(np.asarray(z), want, atol=1e-7)


def test_nhwc_layout_matches_reference_channel_major():
    """N=2 bit->pixel map: the NHWC secret tensor must equal the
    reference's `Z.reshape(B, N, res, res)` (`/root/reference/train.py:257`)
    transposed to NHWC — a plain NHWC reshape would scramble N>=2."""
    from ideas_tpu.stego import (message_from_tensor_nhwc,
                                 tensor_nhwc_from_message)

    N, res, B = 2, 4, 3
    key = jax.random.PRNGKey(7)
    bits = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (B, N * res * res)
    ).astype(jnp.float32)
    z = tensor_nhwc_from_message(bits, N, res, sigma=1, delta=0.5, key=key)
    assert z.shape == (B, res, res, N)
    flat = message_to_tensor(bits, sigma=1, delta=0.5, key=key)
    want = flat.reshape(B, N, res, res).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(want))
    # inverse recovers the exact message (jitter stays inside the bin)
    out = message_from_tensor_nhwc(z, sigma=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
