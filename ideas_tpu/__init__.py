"""IDEAS-TPU: a TPU-native JAX/Flax steganography-without-embedding framework.

A from-scratch rebuild of the capabilities of Lemok00/IDEAS (CVPR 2022,
"Image Disentanglement Autoencoder for Steganography without Embedding"),
designed TPU-first: NHWC layouts, XLA-batched modulated convolutions,
Pallas kernels for the fused ops that the reference implements in CUDA
(/root/reference/stylegan2/op/), and data-parallel training over a
`jax.sharding.Mesh`.

Package layout:
    ideas_tpu.ops       fused ops (upfirdn2d, fused_leaky_relu) + Pallas kernels
    ideas_tpu.nn        NN primitives (equalized-lr convs, modulated conv, blocks)
    ideas_tpu.models    the 7 IDEAS networks + factory, StyleGAN2 side tree
    ideas_tpu.stego     message <-> secret-tensor codec (adaptive mapping)
    ideas_tpu.losses    GAN losses (logistic, R1, non-saturating) + patchify
    ideas_tpu.data      host-side data pipeline (image folders, LMDB)
    ideas_tpu.parallel  mesh construction + sharding helpers
    ideas_tpu.train     training step + CLI driver
    ideas_tpu.eval      FID / InceptionV3 / LPIPS / PPL evaluation stack
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compiles on the TPU
    remote-compile relay take minutes; cached reloads take seconds."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "IDEAS_TPU_CACHE", os.path.expanduser("~/.cache/ideas_tpu_xla")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
