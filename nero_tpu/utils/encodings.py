"""Directional / positional encodings as pure jnp functions.

Implements:
  * NeRF sin/cos positional encoding (parity: reference network/field.py:14-58;
    identity channels first, then [sin(f x), cos(f x)] per octave).
  * Ref-NeRF integrated directional encoding, IDE (parity: reference
    utils/ref_utils.py:53-117; Eq. 6-8 of arXiv 2112.03907), computed with
    real-valued de-Moivre recurrences instead of complex arithmetic so it
    maps onto the TPU VPU.
  * mip-NeRF integrated positional encoding, IPE (parity: reference
    network/field.py:369-378), used for the 2-D camera-plane "human light".
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------

def positional_encode(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding with log-sampled octaves 2^0 .. 2^(n-1).

    Output channel order: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...] —
    identity first, matching the reference embedder so that the geometric
    initialisation's "raw-xyz columns" convention carries over.
    """
    outs = [x] if include_input else []
    for i in range(num_freqs):
        freq = 2.0 ** i
        outs.append(jnp.sin(x * freq))
        outs.append(jnp.cos(x * freq))
    return jnp.concatenate(outs, axis=-1)


def positional_encode_dim(d: int, num_freqs: int, include_input: bool = True) -> int:
    return (d if include_input else 0) + 2 * d * num_freqs


# ---------------------------------------------------------------------------
# Integrated directional encoding (Ref-NeRF)
# ---------------------------------------------------------------------------

def _generalized_binomial(a: float, k: int) -> float:
    out = 1.0
    for i in range(k):
        out *= a - i
    return out / math.factorial(k)


def _assoc_legendre_coeff(l: int, m: int, k: int) -> float:
    # Coefficient of cos^k(theta) sin^m(theta) in P_l^m(cos theta).
    return ((-1) ** m * 2 ** l * math.factorial(l) / math.factorial(k)
            / math.factorial(l - k - m)
            * _generalized_binomial(0.5 * (l + k + m - 1.0), l))


def _sph_harm_coeff(l: int, m: int, k: int) -> float:
    return (math.sqrt((2.0 * l + 1.0) * math.factorial(l - m)
                      / (4.0 * math.pi * math.factorial(l + m)))
            * _assoc_legendre_coeff(l, m, k))


@lru_cache(maxsize=None)
def _ide_tables(deg_view: int):
    """(m,l) list and the z-Vandermonde coefficient matrix for IDE."""
    if deg_view > 5:
        raise ValueError("IDE deg_view > 5 is numerically unstable")
    ml_list = []
    for i in range(deg_view):
        l = 2 ** i
        for m in range(l + 1):
            ml_list.append((m, l))
    l_max = 2 ** (deg_view - 1)
    mat = np.zeros((l_max + 1, len(ml_list)), dtype=np.float64)
    for i, (m, l) in enumerate(ml_list):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    m_arr = np.array([m for m, _ in ml_list], dtype=np.int32)
    l_arr = np.array([l for _, l in ml_list], dtype=np.float32)
    sigma = 0.5 * l_arr * (l_arr + 1.0)
    return m_arr, sigma, mat.astype(np.float32), l_max


def ide_dim(deg_view: int) -> int:
    m_arr, _, _, _ = _ide_tables(deg_view)
    return 2 * len(m_arr)


def integrated_dir_encode(xyz: jnp.ndarray, kappa_inv, deg_view: int = 5) -> jnp.ndarray:
    """Integrated directional encoding (vMF-attenuated spherical harmonics).

    Args:
      xyz: [..., 3] unit directions.
      kappa_inv: [..., 1] (or scalar) reciprocal vMF concentration; 0 means
        a delta distribution (plain directional encoding).

    Returns: [..., 2 * n_ml] real array: [Re(ide), Im(ide)].
    """
    m_arr, sigma_np, mat_np, l_max = _ide_tables(deg_view)
    mat = jnp.asarray(mat_np)
    sigma = jnp.asarray(sigma_np)

    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2:3]

    # z-Vandermonde [.., l_max+1]: powers z^0..z^l_max.
    vmz = jnp.concatenate([z ** i for i in range(l_max + 1)], axis=-1)
    pz = jnp.matmul(vmz, mat)  # [..., n_ml]

    # (x + i y)^m for each needed m, via the recurrence
    # (re,im)_{m+1} = (re*x - im*y, re*y + im*x); gathered per ml entry.
    max_m = int(m_arr.max())
    res = [jnp.ones_like(x)]
    ims = [jnp.zeros_like(x)]
    for _ in range(max_m):
        re_p, im_p = res[-1], ims[-1]
        res.append(re_p * x - im_p * y)
        ims.append(re_p * y + im_p * x)
    re_all = jnp.concatenate(res, axis=-1)  # [..., max_m+1]
    im_all = jnp.concatenate(ims, axis=-1)
    re_m = re_all[..., m_arr]  # [..., n_ml]
    im_m = im_all[..., m_arr]

    sph_re = re_m * pz
    sph_im = im_m * pz

    kappa_inv = jnp.asarray(kappa_inv, dtype=xyz.dtype)
    if kappa_inv.ndim == 0:
        atten = jnp.exp(-sigma * kappa_inv)
        atten = jnp.broadcast_to(atten, sph_re.shape)
    else:
        atten = jnp.exp(-sigma * kappa_inv)

    return jnp.concatenate([sph_re * atten, sph_im * atten], axis=-1)


# ---------------------------------------------------------------------------
# Integrated positional encoding (mip-NeRF)
# ---------------------------------------------------------------------------

def expected_sin(mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """E[sin(x)] for x ~ N(mean, var)."""
    return jnp.exp(-0.5 * var) * jnp.sin(mean)


def integrated_pos_encode(mean: jnp.ndarray, var: jnp.ndarray,
                          min_deg: int, max_deg: int) -> jnp.ndarray:
    """mip-NeRF IPE over a diagonal Gaussian; output dim = 2*d*(max_deg-min_deg)."""
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)], dtype=mean.dtype)
    shape = mean.shape[:-1] + (-1,)
    scaled_mean = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
    scaled_var = jnp.reshape(var[..., None, :] * scales[:, None] ** 2, shape)
    return expected_sin(
        jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([scaled_var, scaled_var], axis=-1))
