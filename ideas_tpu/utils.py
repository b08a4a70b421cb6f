"""Host-side utilities: image grids, time formatting, EMA helper."""

from __future__ import annotations

import numpy as np


def time_change(seconds: float) -> str:
    """'1h 2m 3s' formatting (`/root/reference/utils.py:12-34`)."""
    seconds = float(seconds)
    parts = []
    if seconds / 3600 > 1:
        h = int(seconds // 3600)
        m = int((seconds - h * 3600) // 60)
        s = int(seconds - h * 3600 - m * 60)
        parts += [f"{h}h ", f"{m}m "]
    elif seconds / 60 > 1:
        m = int(seconds // 60)
        s = int(seconds - m * 60)
        parts += [f"{m}m "]
    else:
        s = int(seconds)
    parts.append(f"{s}s")
    return "".join(parts)


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8."""
    return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """Save an (N, H, W, C) [-1,1] batch as a PNG grid with `nrow` images
    per row (the role of torchvision's save_image, `train.py:297-303`)."""
    from PIL import Image

    imgs = to_uint8(np.asarray(images))
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = imgs[i]
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)


def ema_update(ema_tree, params_tree, decay: float):
    """Pytree EMA (the reference's `accumulate`, `utils.py:55-60`)."""
    import jax

    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay),
                        ema_tree, params_tree)
