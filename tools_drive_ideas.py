"""End-to-end hide/reveal round-trip drive (CPU-pinned; TPU holds the
production run; repo-root copy so `import ideas_tpu` resolves). Message -> tensor -> Gstru -> G -> E -> Ex -> message
through the PUBLIC package API at tiny_config."""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ideas_tpu.config import tiny_config
from ideas_tpu.models import init_model
from ideas_tpu.stego import codec

cfg = tiny_config(image_size=64, channel=8, texture_channel=64, batch_size=2)
res = cfg.image_size // 16
sigma = 1

Gs = init_model("StructureGenerator", cfg)
G = init_model("Generator", cfg)
E = init_model("DisentanglementEncoder", cfg)
Ex = init_model("TensorExtractor", cfg)

key = jax.random.PRNGKey(0)
rng = np.random.default_rng(0)
bits_per_image = cfg.N * res * res * sigma
msg = jnp.asarray(rng.integers(0, 2, size=(cfg.batch_size, bits_per_image)))
z = codec.tensor_nhwc_from_message(msg, N=cfg.N, res=res, sigma=sigma,
                                   delta=0.5, key=jax.random.PRNGKey(7))
t = jnp.asarray(rng.uniform(-1, 1, (cfg.batch_size, cfg.texture_channel)),
                jnp.float32)

kS, kG, kE, kX = jax.random.split(key, 4)
pS = jax.jit(Gs.init)(kS, z)
s = jax.jit(Gs.apply)(pS, z)
pG = jax.jit(G.init)(kG, s, t)
x = jax.jit(G.apply)(pG, s, t)
pE = jax.jit(E.init)(kE, x)
s2, t2 = jax.jit(E.apply)(pE, x)
pX = jax.jit(Ex.init)(kX, s2)
z2 = jax.jit(Ex.apply)(pX, s2)

msg2 = codec.message_from_tensor_nhwc(z2, sigma=sigma)
assert x.shape == (cfg.batch_size, cfg.image_size, cfg.image_size, 3), x.shape
assert z2.shape == z.shape, (z2.shape, z.shape)
assert msg2.shape == msg.shape, (msg2.shape, msg.shape)
# Untrained nets: no accuracy claim — the round-trip exercising every
# public surface (codec both ways, all 4 nets, jitted init+apply) is
# the verification; values must be finite and shapes exact.
assert np.isfinite(np.asarray(x)).all() and np.isfinite(np.asarray(z2)).all()
# Codec self-consistency IS exact (independent of training): encode with
# delta=0 then decode must recover every bit.
z_clean = codec.tensor_nhwc_from_message(msg, N=cfg.N, res=res, sigma=sigma,
                                         delta=0.0)
assert (codec.message_from_tensor_nhwc(z_clean, sigma=sigma) == msg).all()
print("DRIVE_IDEAS_OK hide/reveal round-trip:",
      "stego", x.shape, "recovered msg bits", msg2.shape,
      "codec exact round-trip OK,",
      "bit agreement through untrained nets", float((msg == msg2).mean()))
