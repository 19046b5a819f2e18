"""Background NeRF (NeRF++ outer model).

Parity: reference network/field.py:205-297 (`NeRFNetwork` with
use_viewdirs=True) and the inverted-sphere parametrisation applied by the
renderer (renderer.py:349-353, 514-519): inputs are (x/|x|, 1/|x|) in R^4
with PE(10), view dirs with PE(4); 8x256 trunk with a skip after layer 4;
heads: alpha (density), 256-d feature, and a 128-wide view branch -> rgb.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nero_tpu.ops.mlp import apply_dense, init_dense, set_final_bias
from nero_tpu.utils.encodings import positional_encode, positional_encode_dim


class BgNeRFConfig(NamedTuple):
    depth: int = 8
    width: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skip: int = 4            # concat embedded input AFTER this layer index
    rgb_bias_init: float | None = None  # renderer sets log(0.5)


def init_bg_nerf(key, cfg: BgNeRFConfig = BgNeRFConfig()):
    in_pts = positional_encode_dim(cfg.d_in, cfg.multires)
    in_view = positional_encode_dim(cfg.d_in_view, cfg.multires_view)
    w = cfg.width
    keys = jax.random.split(key, cfg.depth + 4)
    pts_layers = [init_dense(keys[0], in_pts, w, weight_norm=False)]
    for i in range(cfg.depth - 1):
        d_in_l = w + in_pts if i == cfg.skip else w
        pts_layers.append(init_dense(keys[i + 1], d_in_l, w, weight_norm=False))
    views_layer = init_dense(keys[cfg.depth], in_view + w, w // 2, weight_norm=False)
    feature_layer = init_dense(keys[cfg.depth + 1], w, w, weight_norm=False)
    alpha_layer = init_dense(keys[cfg.depth + 2], w, 1, weight_norm=False)
    rgb_layer = init_dense(keys[cfg.depth + 3], w // 2, 3, weight_norm=False)
    if cfg.rgb_bias_init is not None:
        [rgb_layer] = set_final_bias([rgb_layer], cfg.rgb_bias_init)
    return {"pts": pts_layers, "views": views_layer, "feature": feature_layer,
            "alpha": alpha_layer, "rgb": rgb_layer}


def _trunk(params, input_pts: jnp.ndarray, cfg: BgNeRFConfig) -> jnp.ndarray:
    h = input_pts
    for i, layer in enumerate(params["pts"]):
        h = jax.nn.relu(apply_dense(layer, h))
        if i == cfg.skip:
            h = jnp.concatenate([input_pts, h], axis=-1)
    return h


def bg_nerf_apply(params, pts4: jnp.ndarray, view_dirs: jnp.ndarray,
                  cfg: BgNeRFConfig = BgNeRFConfig()):
    """pts4 [...,4] inverted-sphere coords, view_dirs [...,3] -> (alpha, rgb)."""
    input_pts = positional_encode(pts4, cfg.multires)
    input_views = positional_encode(view_dirs, cfg.multires_view)
    h = _trunk(params, input_pts, cfg)
    alpha = apply_dense(params["alpha"], h)
    feature = apply_dense(params["feature"], h)
    hv = jnp.concatenate([feature, input_views], axis=-1)
    hv = jax.nn.relu(apply_dense(params["views"], hv))
    rgb = apply_dense(params["rgb"], hv)
    return alpha, rgb


def bg_nerf_density(params, pts4: jnp.ndarray, cfg: BgNeRFConfig = BgNeRFConfig()) -> jnp.ndarray:
    input_pts = positional_encode(pts4, cfg.multires)
    h = _trunk(params, input_pts, cfg)
    return apply_dense(params["alpha"], h)
