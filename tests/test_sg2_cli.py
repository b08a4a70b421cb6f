"""SG2 CLI-level tests on CPU: checkpoint -> generate samples; ADA
augmentation inside the differentiated training step."""

import os

import numpy as np
import jax
import pytest

from ideas_tpu.checkpoint import CheckpointManager
from ideas_tpu.stylegan2.train import SG2Config, SG2Trainer


SIZE = 32


def test_generate_cli_from_checkpoint(tmp_path):
    cfg = SG2Config(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1)
    tr = SG2Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    ckpt_dir = tmp_path / "ckpt"
    CheckpointManager(str(ckpt_dir)).save(1, jax.device_get(state))

    from ideas_tpu.stylegan2.generate import main

    out = tmp_path / "samples"
    main([
        "--ckpt-dir", str(ckpt_dir), "--size", str(SIZE),
        "--style-dim", "32", "--n-mlp", "2", "--channel-multiplier", "1",
        "--pics", "2", "--sample", "4", "--truncation", "0.7",
        "--out", str(out),
    ])
    files = sorted(os.listdir(out))
    assert files == ["000000.png", "000001.png"]
    from PIL import Image

    im = Image.open(out / files[0])
    assert im.size == (2 * SIZE, 2 * SIZE)  # 4 samples in a 2x2 grid


def test_sg2_step_with_ada():
    cfg = SG2Config(size=SIZE, style_dim=32, n_mlp=2, channel_multiplier=1,
                    batch_size=4, augment_p=0.5)
    tr = SG2Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, SIZE, SIZE, 3),
                           minval=-1, maxval=1)
    step = tr.step_fn(do_r1=False, do_path=False, use_ada=True)
    state1, metrics = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["d"]))
    assert np.isfinite(float(metrics["g"]))
    # the ADA controller moved its statistic
    assert np.isfinite(float(jax.device_get(state1.ada_r_t)))
