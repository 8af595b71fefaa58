"""The reference's three custom normalisations, mask-aware.

The reference defines (modules/neural_net/common.py:208-253):

* ``channel_normalization`` — per-row stats over the feature axis;
* ``layer_normalization``   — stats over the *whole tensor*;
* ``group_normalization``   — stats per channel-group over (rows, group dim),
  i.e. coupled across the batch/node axis.

All three use Bessel-corrected std (``torch.std``, ddof=1), eps added to the
*std* (not variance), and a single scalar affine pair (γ, β).  With padded
static shapes, layer/group norms must exclude padded rows from the statistics
(SURVEY.md §7 "numerics parity hooks"), hence the explicit mask arguments.

These are pure functions; flax modules in models/blocks.py own the scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-5  # reference modules/neural_net/constants.py:9


def _bessel_std(sum_x, sum_x2, count):
    """std with ddof=1 from accumulated moments; guards count<=1."""
    mean = sum_x / jnp.maximum(count, 1.0)
    var = (sum_x2 - count * mean * mean) / jnp.maximum(count - 1.0, 1.0)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


def channel_norm(x: jax.Array, gamma, beta, eps: float = EPS) -> jax.Array:
    """Per-row normalisation over the last axis (reference common.py:208-220).

    Padded rows produce garbage that downstream masks discard, so no mask is
    needed — this is the shipped config's norm
    (configuration_radarscenes_gnn.yml:51) and the padding-friendly hot path.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # torch.std: Bessel-corrected
    n = x.shape[-1]
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    return gamma * ((x - mean) / (std + eps)) + beta


def layer_norm(
    x: jax.Array, gamma, beta, mask: jax.Array | None = None, eps: float = EPS
) -> jax.Array:
    """Whole-tensor normalisation (reference common.py:223-233).

    mask: [N] bool over rows of x [N, D]; masked rows are excluded from the
    statistics but still transformed (then discarded downstream).
    """
    if mask is None:
        mean = jnp.mean(x)
        n = x.size
        var = jnp.sum((x - mean) ** 2) / max(n - 1, 1)
        std = jnp.sqrt(var)
    else:
        m = mask.astype(x.dtype)[:, None]
        count = jnp.sum(m) * x.shape[-1]
        sum_x = jnp.sum(x * m)
        sum_x2 = jnp.sum((x * x) * m)
        mean, std = _bessel_std(sum_x, sum_x2, count)
    return gamma * ((x - mean) / (std + eps)) + beta


def group_norm(
    x: jax.Array,
    gamma,
    beta,
    num_groups: int,
    mask: jax.Array | None = None,
    eps: float = EPS,
) -> jax.Array:
    """Group normalisation with batch-coupled statistics
    (reference common.py:236-253): x [N, D] → [N, G, D/G], stats over
    (N, D/G) per group.  mask excludes padded rows from the statistics.
    """
    n, d = x.shape
    g = num_groups
    xg = x.reshape(n, g, d // g)
    if mask is None:
        mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
        cnt = n * (d // g)
        var = jnp.sum((xg - mean) ** 2, axis=(0, 2), keepdims=True) / max(
            cnt - 1, 1
        )
        std = jnp.sqrt(var)
    else:
        m = mask.astype(x.dtype)[:, None, None]
        count = jnp.sum(m) * (d // g)
        sum_x = jnp.sum(xg * m, axis=(0, 2), keepdims=True)
        sum_x2 = jnp.sum(xg * xg * m, axis=(0, 2), keepdims=True)
        mean, std = _bessel_std(sum_x, sum_x2, count)
    out = gamma * ((xg - mean) / (std + eps)) + beta
    return out.reshape(n, d)
