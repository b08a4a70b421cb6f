"""Training configuration.

A dataclass with the same names and defaults as the reference's argparse
flags (`/root/reference/train.py:330-370`), CLI-overridable via
`ideas_tpu.train`. Extra TPU-native knobs live at the bottom.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class TrainConfig:
    # Reference flags (`train.py:330-366`), same defaults.
    exp_name: str = "default"
    dataset_path: str = ""
    dataset_type: str = "normal"  # 'lmdb' | 'normal' | 'synthetic'
    num_iters: int = 80000
    N: int = 1
    lambda_Ex: float = 10.0
    ckpt: Optional[str] = None
    lr: float = 0.002
    batch_size: int = 1
    image_size: int = 256
    real_r1: float = 10.0
    texture_r1: float = 1.0
    dist_r1: float = 1.0
    ref_crop: int = 4
    n_crop: int = 8
    d_reg_every: int = 16
    channel: int = 32
    channel_multiplier: int = 1
    structure_channel: int = 8
    texture_channel: int = 2048
    log_every: int = 200
    show_every: int = 1000
    save_every: int = 200000
    start_iter: int = 0
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    # TPU-native knobs (not in the reference).
    seed: int = 0
    compute_dtype: Any = jnp.float32  # jnp.bfloat16 for mixed precision
    remat: bool = False  # rematerialize generator blocks (memory for FLOPs)
    num_data_devices: int = 0  # 0 = use all visible devices (data parallel)
    num_spatial_devices: int = 1  # >1: shard image height over a 2nd mesh axis
    synthetic_family: str = "default"  # 'default' | 'rich' (device_synthetic)
    # Optional decision-margin hinge on the extracted tensor (0 = off,
    # reference-faithful). With sigma=1 serving, a bit flips iff
    # sign(z_hat) != sign(z); L1 alone spends capacity on magnitude
    # everywhere, while relu(margin - z_hat*sign(z)) pushes mass away
    # from the decision boundary — the delta=50% ACC lever (PERF.md).
    ex_margin: float = 0.0
    # Share one noise draw (Z, T2, patch crops) between the D and G
    # phases of an iteration (0 = off, reference-faithful: the reference
    # re-samples in each phase, `train.py:60-64,148-152`). When on, the
    # two phases' generator forwards become identical HLO subgraphs that
    # XLA CSE merges — fewer FLOPs per step. Note the semantic coupling:
    # G then trains against a D freshly updated on exactly these fakes
    # and patch crops (a standard same-batch GAN formulation, but not
    # the reference's). Quality A/B-verified at 128^2/6k; the round-3
    # 80k paper-budget run trains with the flag (final-eval sweep in
    # PERF.md). Both phases still see fresh noise each iteration.
    # Measured throughput win in PERF.md.
    share_phase_noise: bool = False
    # Compact Adam (0 = off, reference-faithful optax.adam states). All
    # three optimizers run b1=0 (`/root/reference/train.py:416-432`), so
    # Adam's first moment IS the gradient — storing it is pure HBM
    # capacity + bandwidth waste. When on, optimizer state is the second
    # moment only (exact same update sequence; verified vs optax.adam in
    # tests/test_optim.py), cutting optimizer memory 2x. NOTE: flips the
    # checkpointed opt-state structure, so it must match between a run
    # and its resume.
    compact_adam: bool = False
    # Second-moment dtype for compact_adam ('float32' exact;
    # 'bfloat16' halves it again — approximate, bench A/B in PERF.md).
    adam_nu_dtype: str = "float32"
    experiments_dir: str = "experiments"
    ema_halflife_kimg: float = 10.0  # accum = 0.5 ** (32/(10*1000)), train.py:30

    @property
    def ema_decay(self) -> float:
        return 0.5 ** (32.0 / (self.ema_halflife_kimg * 1000.0))

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**kw) -> TrainConfig:
    """A minimal config for tests/CI: 64^2 images, small channels."""
    base = dict(
        image_size=64,
        channel=8,
        texture_channel=64,
        structure_channel=8,
        batch_size=2,
        n_crop=2,
        ref_crop=2,
        num_iters=10,
        dataset_type="synthetic",
    )
    base.update(kw)
    return TrainConfig(**base)
