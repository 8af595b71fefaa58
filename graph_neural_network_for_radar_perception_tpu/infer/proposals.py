"""Cluster proposal statistics: per-cluster mean, covariance, size, label.

Replaces modules/inference/inference.py:10-118's python loops over cluster
member lists with segment reductions over the node2cluster assignment — the
same quantities (sample mean, Bessel-corrected covariance with a 0.5·I
measurement-noise floor; gnn_detector.py:138) computed for all clusters at
once on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import segment as S

MEAS_NOISE_VAR = 0.5  # gnn_detector.py:138


class Proposals(NamedTuple):
    mu: jax.Array        # [C, 2]
    sigma: jax.Array     # [C, 2, 2]
    size: jax.Array      # [C] float — member counts
    label: jax.Array     # [C] int32 — majority-vote node class
    valid: jax.Array     # [C] bool


def compute_proposals(
    xy: jax.Array,           # [N, 2] measurement positions
    node_cls_idx: jax.Array,  # [N] predicted node class ids
    node2cluster: jax.Array,  # [N] cluster slot (void = C)
    node_mask: jax.Array,
    num_clusters_cap: int,
    num_classes: int,
) -> Proposals:
    c = num_clusters_cap
    counts = S.masked_segment_sum(
        jnp.ones_like(xy[:, 0]), node2cluster, c, node_mask
    )
    mu = S.masked_segment_sum(xy, node2cluster, c, node_mask)
    mu = mu / jnp.maximum(counts[:, None], 1.0)

    err = mu[jnp.clip(node2cluster, 0, c - 1)] - xy  # [N, 2]
    outer = err[:, :, None] * err[:, None, :]        # [N, 2, 2]
    ssq = S.masked_segment_sum(
        outer.reshape(-1, 4), node2cluster, c, node_mask
    ).reshape(c, 2, 2)
    denom = jnp.maximum(counts - 1.0, 1.0)[:, None, None]
    noise = MEAS_NOISE_VAR * jnp.eye(2, dtype=xy.dtype)
    sigma = jnp.where(
        (counts > 1)[:, None, None], ssq / denom + noise, noise
    )

    # Majority vote of member node classes (inference.py:106-118 /
    # gnn_detector.py:511-513 use bincount-argmax).
    onehot = jax.nn.one_hot(node_cls_idx, num_classes, dtype=xy.dtype)
    votes = S.masked_segment_sum(onehot, node2cluster, c, node_mask)
    label = jnp.argmax(votes, axis=-1).astype(jnp.int32)

    return Proposals(
        mu=mu,
        sigma=sigma,
        size=counts,
        label=label,
        valid=counts > 0,
    )


def rotation_invariant_cluster_features(xy: jax.Array, mask: jax.Array):
    """Rotation/translation-invariant per-point cluster features
    (modules/inference/feature.py:9-28, marked "not used" in the
    reference but kept as a capability): shift points to the cluster mean,
    rotate into the covariance eigenbasis, return [x', y', r, θ].

    xy: [M, 2] one cluster's points; mask: [M]."""
    m = mask.astype(xy.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(xy * m, axis=0) / cnt
    err = (xy - mu) * m
    sigma = (err.T @ err) / jnp.maximum(cnt - 1.0, 1.0)
    _, evecs = jnp.linalg.eigh(sigma)
    pts = (xy - mu) @ evecs
    r = jnp.sqrt(jnp.sum(pts**2, axis=-1))
    th = jnp.arctan2(pts[:, 1], pts[:, 0])
    return jnp.where(
        mask[:, None],
        jnp.stack([pts[:, 0], pts[:, 1], r, th], axis=-1),
        0.0,
    )


def cov_ellipse(mu, sigma, n_points: int = 32, chi2_scale: float = 9.21):
    """χ²-scaled covariance ellipse boundary points for visualisation
    (modules/inference/ellipse.py:4-37).  Returns [n_points, 2]."""
    evals, evecs = jnp.linalg.eigh(sigma)
    t = jnp.linspace(0.0, 2.0 * jnp.pi, n_points)
    circle = jnp.stack([jnp.cos(t), jnp.sin(t)], axis=-1)  # [P, 2]
    radii = jnp.sqrt(jnp.maximum(evals, 0.0) * chi2_scale)
    return mu[None, :] + (circle * radii[None, :]) @ evecs.T
