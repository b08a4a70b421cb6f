"""Rasterize the synthetic training family to PNG files on disk.

Purpose: give the production on-disk data path (`--dataset_type normal`
-> FolderDataset -> raw-uint8 device-normalize step, the analogue of the
reference's folder/LMDB training, `/root/reference/dataset.py:54-74` +
`train.py:444-451`) a real TPU training run. Every prior TPU quality run
used `synthetic_device` (batch rasterized inside the step); this writes
the SAME distribution to files so a short `normal` run validates the
loader + transfer + uint8-normalize seam end to end.

    python tools_make_dataset.py <out_dir> [n_images=2048] [resolution=256] [family=default]

CPU-only (forces the cpu platform before any backend init); float [-1,1]
images quantize to uint8 exactly the way the loader will de-quantize
(x/127.5 - 1), i.e. the on-disk dataset is the synthetic family as any
real dataset would be: 8-bit.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env vars lose to sitecustomize

import numpy as np
from PIL import Image


def main():
    out_dir = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    resolution = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    family = sys.argv[4] if len(sys.argv) > 4 else "default"

    from ideas_tpu.data.device_synthetic import synthetic_batch

    os.makedirs(out_dir, exist_ok=True)
    batch = 64
    key = jax.random.PRNGKey(7)
    written = 0
    while written < n_images:
        key, sub = jax.random.split(key)
        imgs = synthetic_batch(sub, batch, resolution, 0, family)
        arr = np.asarray(jax.device_get(imgs))
        arr = np.clip(np.round((arr + 1.0) * 127.5), 0, 255).astype(np.uint8)
        for i in range(min(batch, n_images - written)):
            Image.fromarray(arr[i]).save(
                os.path.join(out_dir, f"{written + i:06d}.png")
            )
        written += min(batch, n_images - written)
        print(f"wrote {written}/{n_images}", flush=True)
    print("MAKE_DATASET_OK")


if __name__ == "__main__":
    main()
