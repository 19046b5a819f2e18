"""Inverse-CDF (importance) sampling along rays, fully vectorized for XLA.

Parity target: reference network/field.py:399-429 (`sample_pdf`), itself the
classic NeRF hierarchical sampler. Static shapes; the deterministic variant
uses bin-centred stratified u's, the stochastic one consumes an explicit
PRNG key (JAX functional RNG replaces torch's global generator).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: jax.Array | None = None) -> jnp.ndarray:
    """Draw `n_samples` positions per row proportional to `weights`.

    Args:
      bins:    [..., B] bin edges (ascending).
      weights: [..., B-1] non-negative weights per bin.
      n_samples: number of samples per row.
      key: PRNG key for stratification; None -> deterministic mid-quantiles.

    Returns: [..., n_samples] sampled positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., B]

    batch_shape = cdf.shape[:-1]
    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, batch_shape + (n_samples,))
    else:
        u = jax.random.uniform(key, batch_shape + (n_samples,), dtype=cdf.dtype)

    # searchsorted(side='right') as a dense comparison: the bin counts here are
    # tiny (<=129) so an O(S*B) VPU reduction beats the serialized binary-scan
    # lowering of jnp.searchsorted on TPU.
    inds = jnp.sum((u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
