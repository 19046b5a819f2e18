"""Split-sum environment-BRDF lookup table (the "FG LUT").

The Stage-I shader factors the specular reflection integral into a
prefiltered-light term and an environment-BRDF term F*G that depends only
on (N.V, roughness) — the split-sum approximation of Karis, "Real Shading
in Unreal Engine 4" (SIGGRAPH 2013 course). The reference loads a
precomputed 256x256x2 table (network/field.py:510-511) and samples it with
nvdiffrast's bilinear texture op (field.py:610-613); here we *generate* the
table once on the host by GGX importance sampling and sample it with a
plain jnp bilinear gather — no GPU texture unit needed.

Layout matches the reference asset: [256 (roughness rows), 256 (NoV cols), 2
(scale A, bias B)], float32, texel centres at (i + 0.5) / 256.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

LUT_RES = 256


def _hammersley(n: int) -> np.ndarray:
    """n x 2 low-discrepancy points (van der Corput radical inverse base 2)."""
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = ((bits << 16) | (bits >> 16)) & 0xFFFFFFFF
    bits = (((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)) & 0xFFFFFFFF
    bits = (((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)) & 0xFFFFFFFF
    bits = (((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)) & 0xFFFFFFFF
    bits = (((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)) & 0xFFFFFFFF
    return np.stack([i.astype(np.float64) / n, bits.astype(np.float64) * 2.3283064365386963e-10], -1)


def compute_fg_lut(res: int = LUT_RES, n_samples: int = 1024) -> np.ndarray:
    """Integrate the environment BRDF over GGX-importance-sampled half vectors."""
    nov = (np.arange(res, dtype=np.float64) + 0.5) / res  # columns
    rough = (np.arange(res, dtype=np.float64) + 0.5) / res  # rows
    nov = np.clip(nov, 1e-4, 1.0)
    NoV = nov[None, :]                      # [1, res]
    a = (rough ** 2)[:, None]               # alpha = roughness^2, [res, 1]
    k_ibl = a / 2.0                         # Schlick-GGX k for IBL (k = alpha/2)

    Vx = np.sqrt(1.0 - NoV ** 2)
    Vz = NoV

    xi = _hammersley(n_samples)
    A = np.zeros((res, res), dtype=np.float64)
    B = np.zeros((res, res), dtype=np.float64)
    for s in range(n_samples):
        x1, x2 = xi[s]
        phi = 2.0 * np.pi * x1
        cos_t = np.sqrt((1.0 - x2) / (1.0 + (a ** 2 - 1.0) * x2))  # [res,1]
        sin_t = np.sqrt(np.maximum(1.0 - cos_t ** 2, 0.0))
        Hx = np.cos(phi) * sin_t
        Hy = np.sin(phi) * sin_t
        Hz = cos_t
        VoH = Vx * Hx + Vz * Hz             # [res, res]
        Lz = 2.0 * VoH * Hz - Vz
        NoL = Lz
        NoH = np.broadcast_to(Hz, VoH.shape)
        valid = NoL > 0
        VoH_c = np.clip(VoH, 0.0, 1.0)
        NoL_c = np.clip(NoL, 1e-6, 1.0)
        NoH_c = np.clip(NoH, 1e-6, 1.0)
        G = (NoL_c / (NoL_c * (1 - k_ibl) + k_ibl)) * (NoV / (NoV * (1 - k_ibl) + k_ibl))
        G_vis = G * VoH_c / (NoH_c * NoV)
        Fc = (1.0 - VoH_c) ** 5
        A += np.where(valid, (1.0 - Fc) * G_vis, 0.0)
        B += np.where(valid, Fc * G_vis, 0.0)
    lut = np.stack([A, B], axis=-1) / n_samples
    return lut.astype(np.float32)


def get_fg_lut(cache_path: str = "assets/bsdf_256_256.bin") -> np.ndarray:
    """Load the LUT from cache, or compute+cache it (reference-compatible layout)."""
    if cache_path and os.path.exists(cache_path):
        data = np.fromfile(cache_path, dtype=np.float32)
        if data.size == LUT_RES * LUT_RES * 2:
            return data.reshape(LUT_RES, LUT_RES, 2)
    lut = compute_fg_lut()
    if cache_path:
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
        lut.tofile(cache_path)
    return lut


def fg_lookup(lut: jnp.ndarray, nov: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LUT sample with clamped boundaries.

    Args: lut [R,R,2]; nov, roughness [...,1] in [0,1].
    Returns [..., 2] (scale A, bias B). Matches dr.texture(filter_mode='linear',
    boundary_mode='clamp') texel-centre conventions.
    """
    res = lut.shape[0]
    u = jnp.clip(nov[..., 0], 0.0, 1.0) * res - 0.5       # column coord
    v = jnp.clip(roughness[..., 0], 0.0, 1.0) * res - 0.5  # row coord
    u0 = jnp.clip(jnp.floor(u), 0, res - 1)
    v0 = jnp.clip(jnp.floor(v), 0, res - 1)
    u1 = jnp.clip(u0 + 1, 0, res - 1)
    v1 = jnp.clip(v0 + 1, 0, res - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    u0i, u1i, v0i, v1i = u0.astype(jnp.int32), u1.astype(jnp.int32), v0.astype(jnp.int32), v1.astype(jnp.int32)
    c00 = lut[v0i, u0i]
    c01 = lut[v0i, u1i]
    c10 = lut[v1i, u0i]
    c11 = lut[v1i, u1i]
    top = c00 * (1 - fu) + c01 * fu
    bot = c10 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv
