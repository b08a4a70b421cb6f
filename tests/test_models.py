"""Shape/numerics tests for the 7 IDEAS networks against the hand-computed
channel tables of SURVEY.md section 2.1 rows 14-20."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ideas_tpu.config import tiny_config, TrainConfig
from ideas_tpu.models import (
    init_model,
    DisentanglementEncoder,
    Generator,
    StructureGenerator,
    TensorExtractor,
    ImageLevelDiscriminator,
    CooccurenceDiscriminator,
    DistributionDiscriminator,
)


CFG = tiny_config()
KEY = jax.random.PRNGKey(0)


def test_encoder_shapes():
    m = init_model("DisentanglementEncoder", CFG)
    x = jnp.zeros((2, CFG.image_size, CFG.image_size, 3))
    params = m.init(KEY, x)
    s, t = m.apply(params, x)
    assert s.shape == (2, CFG.image_size // 16, CFG.image_size // 16, CFG.structure_channel)
    assert t.shape == (2, CFG.texture_channel)
    assert np.all(np.abs(np.asarray(t)) <= 1.0)  # tanh head


def test_generator_shapes():
    m = init_model("Generator", CFG)
    s = jnp.zeros((2, CFG.image_size // 16, CFG.image_size // 16, CFG.structure_channel))
    t = jnp.zeros((2, CFG.texture_channel))
    params = m.init(KEY, s, t)
    y = m.apply(params, s, t)
    assert y.shape == (2, CFG.image_size, CFG.image_size, 3)


def test_structure_generator_and_extractor_shapes():
    g = init_model("StructureGenerator", CFG)
    z = jnp.zeros((2, CFG.image_size // 16, CFG.image_size // 16, CFG.N))
    pg = g.init(KEY, z)
    s2 = g.apply(pg, z)
    assert s2.shape == (2, CFG.image_size // 16, CFG.image_size // 16, CFG.structure_channel)

    ex = init_model("TensorExtractor", CFG)
    pe = ex.init(KEY, s2)
    zh = ex.apply(pe, s2)
    assert zh.shape == z.shape


def test_image_discriminator_shapes():
    m = init_model("ImageLevelDiscriminator", CFG)
    x = jnp.zeros((3, CFG.image_size, CFG.image_size, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (3, 1)


def test_cooccurrence_discriminator():
    m = init_model("CooccurenceDiscriminator", CFG)
    ps = CFG.image_size // 4  # patch target size (max_size = 1/4)
    patches = jnp.zeros((2 * CFG.n_crop, ps, ps, 3))
    refs = jnp.zeros((2 * CFG.n_crop * CFG.ref_crop, ps, ps, 3))
    params = m.init(KEY, patches, refs, CFG.ref_crop)
    out, ref_feat = m.apply(params, patches, refs, CFG.ref_crop)
    assert out.shape == (2 * CFG.n_crop, 1)
    # cached-reference second call (train.py:85)
    out2, _ = m.apply(params, patches, ref_input=ref_feat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_distribution_discriminator():
    m = init_model("DistributionDiscriminator", CFG)
    t = jnp.zeros((4, CFG.texture_channel))
    params = m.init(KEY, t)
    y = m.apply(params, t)
    assert y.shape == (4, 1)


def test_generator_channel_schedule_paper_config():
    """At 256^2 / channel=32, layers follow (4,8,12,16,16,16,8,4)*32 and
    upsample on the last four (models.py:281-292)."""
    cfg = TrainConfig(image_size=256, channel=32)
    m = init_model("Generator", cfg)
    s = jnp.zeros((1, 16, 16, 8))
    t = jnp.zeros((1, 2048))
    params = m.init(KEY, s, t)
    p = params["params"]
    # conv1 weights are (3, 3, in, out): check out-channels per layer.
    outs = [p[f"layer{i}"]["conv1"]["conv"]["weight"].shape[-1] for i in range(8)]
    assert outs == [32 * m_ for m_ in (4, 8, 12, 16, 16, 16, 8, 4)]
    y = m.apply(params, s, t)
    assert y.shape == (1, 256, 256, 3)


def test_payload_capacity_paper_config():
    """256 bits at 256^2, N=1, sigma=1 (BASELINE.md derived facts)."""
    cfg = TrainConfig(image_size=256, channel=32)
    assert cfg.N * (cfg.image_size // 16) ** 2 * 1 == 256
