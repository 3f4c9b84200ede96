"""Masked point-set statistics.

Replaces the reference's covariance helpers
(``/root/reference/include/eigen_covariance.h``): accumulation-loop mean /
covariance and the principal axis used by the kd-tree's PCA split plane
(eigen_kdtree.h:27-29). The dense matcher made the split plane itself
unnecessary, but the statistics remain framework surface (keyframe-cluster
summaries, scene-extent estimation) — here they are single fused
contractions over masked, padded sets and vmappable over batches.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def mean_and_covariance(points: Array, mask: Array) -> Tuple[Array, Array]:
    """Masked sample mean and covariance of (..., N, D) points.

    Matches ``computeMeanAndCovariance`` (eigen_covariance.h:5-30): the
    covariance uses the 1/(n-1) normalization of the accumulation form
    ``(sum xxᵀ - n mu muᵀ) / (n - 1)``.
    """
    w = mask.astype(points.dtype)
    n = jnp.sum(w, axis=-1)
    safe_n = jnp.maximum(n, 1.0)
    mu = jnp.sum(points * w[..., None], axis=-2) / safe_n[..., None]
    centered = (points - mu[..., None, :]) * w[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered) / jnp.maximum(
        n - 1.0, 1.0
    )[..., None, None]
    return mu, cov


def largest_eigenvector(cov: Array) -> Array:
    """Principal axis of a symmetric (..., D, D) matrix.

    Matches ``largestEigenVector`` (eigen_covariance.h:35-43):
    ``eigh`` orders eigenvalues ascending, so the last column is the
    principal direction.
    """
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[..., :, -1]


def smallest_eigenvector(m: Array) -> Array:
    """Matches ``smallestEigenVector`` (utils.h:83-91)."""
    _, vecs = jnp.linalg.eigh(m)
    return vecs[..., :, 0]
