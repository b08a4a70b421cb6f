"""FID pipeline: real-statistics precomputation + Frechet distance
(`/root/reference/stylegan2/{calc_inception,fid}.py`).

`compute_stats` plays calc_inception.py's role (real features -> mu,
sigma, cacheable as .npz); `fid_from_stats` is `calc_fid`
(`fid.py:34-57`): ||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrt(S1 S2)), with the
matrix sqrt on the host via scipy (the reference does the same —
`scipy.linalg.sqrtm` is CPU-bound in both).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_feature_fn(params, resize_input: bool = True):
    from ideas_tpu.eval.inception import InceptionV3Features

    model = InceptionV3Features(resize_input=resize_input)

    @jax.jit
    def feature_fn(x):
        return model.apply(params, x)

    return feature_fn


def extract_features(feature_fn, batches: Iterable[np.ndarray],
                     max_items: Optional[int] = None) -> np.ndarray:
    """Run the feature extractor over an iterable of NHWC [-1,1] batches."""
    feats = []
    seen = 0
    for batch in batches:
        f = np.asarray(jax.device_get(feature_fn(jnp.asarray(batch))))
        feats.append(f)
        seen += len(f)
        if max_items is not None and seen >= max_items:
            break
    out = np.concatenate(feats, axis=0)
    return out[:max_items] if max_items else out


def compute_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_stats(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance (`fid.py:34-57`), incl. the reference's fallback
    jitter when sqrtm is singular."""
    import scipy.linalg

    def _sqrtm(m):
        out = scipy.linalg.sqrtm(m)  # scipy >= 1.16 drops the disp flag
        return out[0] if isinstance(out, tuple) else out

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    cov_sqrt = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            raise ValueError("sqrtm has large imaginary component")
        cov_sqrt = cov_sqrt.real
    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    )


def compute_fid(feature_fn, real_batches, fake_batches,
                n_sample: int = 50000) -> float:
    """End-to-end FID between two image streams (`fid.py:60-107`)."""
    real = extract_features(feature_fn, real_batches, n_sample)
    fake = extract_features(feature_fn, fake_batches, n_sample)
    return fid_from_stats(*compute_stats(real), *compute_stats(fake))
