"""Convert pretrained torch state_dicts (.pth) to the .npz files the eval
stack loads (no torchvision / network needed — the .pth files themselves
must be provided, e.g. pytorch-fid's pt_inception-2015-12-05-6726825d.pth
or torchvision's vgg16/alexnet and lpips' linear weights).

    python -m ideas_tpu.tools.convert_pretrained inception \
        --pth pt_inception-2015-12-05-6726825d.pth --out inception.npz
    python -m ideas_tpu.tools.convert_pretrained backbone \
        --pth vgg16-397923af.pth --out vgg16.npz
    python -m ideas_tpu.tools.convert_pretrained lpips-linear \
        --pth vgg.pth --out vgg_lin.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def _load_pth(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["inception", "backbone", "lpips-linear"])
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)
    sd = _load_pth(a.pth)
    # Keys pass through verbatim; the loaders in ideas_tpu.eval.* do the
    # name/layout mapping. Drop num_batches_tracked noise.
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    np.savez(a.out, **sd)
    print(f"wrote {len(sd)} arrays to {a.out}")


if __name__ == "__main__":
    main()
