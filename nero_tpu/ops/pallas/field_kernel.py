"""Fused visibility-field kernel: PE(6) + 4-layer MLP, VMEM-resident.

The neural tracer's coarse pass evaluates a small distilled SDF MLP at ~19M
points per Stage-II step. In plain XLA each layer round-trips [N,128] f32
activations through HBM (~60 GB per pass -> measured ~12 TF/s). This kernel
keeps ALL weights and per-block activations in VMEM, so HBM traffic is just
the points in and scalars out (~0.1% of the XLA traffic).

Layout: points arrive TRANSPOSED as [8, N] (rows x,y,z; f32 tile-friendly);
the positional encoding is built row-wise in the transposed layout (pure
sublane concat of sin/cos rows); the first matmul contracts the feature
(sublane) axis directly, and the last matmul is computed output-transposed
so results leave as [8, N] row 0 — no lane-dim transposes anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK_N = 4096  # measured best on v5e (19.1 TF/s vs 18.8 @2048)
FEAT_PAD = 48  # 3 + 36 PE rows, padded to a multiple of 8 sublanes


def pack_field_params(params, pe: int = 6, topology: str = "std"):
    """Pad the field MLP (ops from geometry/neural_tracer.py) into kernel layout.

    std: dict w0 [FEAT_PAD,128], b0 [1,128], w1/w2 [128,128], b1/b2 [1,128],
    w3t [128,8] (col 0 = output), b3 [1,8].
    wide (3 dense layers, K=123 first contraction): w0 [128,128], b0, w1
    [128,128], b1, w2t [128,8], b2 [1,8]."""
    layers = params["layers"]
    width = layers[0]["w"].shape[1]
    assert width == 128, "kernel assumes width 128"
    if topology == "wide":
        from nero_tpu.geometry.neural_tracer import WIDE_DIM
        assert len(layers) == 3, "wide topology is 3 dense layers"
        assert layers[0]["w"].shape[0] == WIDE_DIM, layers[0]["w"].shape
        w0 = jnp.zeros((128, width)).at[:WIDE_DIM].set(layers[0]["w"])
        w2t = jnp.zeros((width, 8)).at[:, 0].set(layers[2]["w"][:, 0])
        b2 = jnp.zeros((1, 8)).at[0, 0].set(layers[2]["b"][0])
        return {"w0": w0, "b0": layers[0]["b"][None], "w1": layers[1]["w"],
                "b1": layers[1]["b"][None], "w2t": w2t, "b2": b2}
    assert len(layers) == 4, "kernel supports the default 4-layer field"
    in_dim = 3 + 6 * pe
    w0 = jnp.zeros((FEAT_PAD, width)).at[:in_dim].set(layers[0]["w"])
    w3t = jnp.zeros((width, 8)).at[:, 0].set(layers[3]["w"][:, 0])
    b3 = jnp.zeros((1, 8)).at[0, 0].set(layers[3]["b"][0])
    return {"w0": w0, "b0": layers[0]["b"][None], "w1": layers[1]["w"],
            "b1": layers[1]["b"][None], "w2": layers[2]["w"],
            "b2": layers[2]["b"][None], "w3t": w3t, "b3": b3}


def _kernel(pts_ref, w0, b0, w1, b1, w2, b2, w3t, b3, out_ref, *, pe):
    from nero_tpu.ops.pallas.march_kernel import _pe_rows

    x = pts_ref[...]  # [8, BN] rows 0..2 = xyz
    # double-angle recurrence PE: 2 transcendentals/coord instead of 2*pe —
    # the VPU sin/cos was the kernel bottleneck (28.9 -> 48.3 TF/s on v5e)
    feats = _pe_rows(x[0:3], pe)  # [39, BN]
    feats = jnp.concatenate(
        [feats, jnp.zeros((FEAT_PAD - feats.shape[0], feats.shape[1]),
                          feats.dtype)], axis=0)

    cast = lambda a: a.astype(jnp.bfloat16)
    # h = feats^T @ w0 : contract the sublane (feature) axis
    h = jax.lax.dot_general(cast(feats), cast(w0[...]),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BN,128]
    h = jax.nn.relu(h + b0[...])
    h = jax.nn.relu(jnp.dot(cast(h), cast(w1[...]),
                            preferred_element_type=jnp.float32) + b1[...])
    h = jax.nn.relu(jnp.dot(cast(h), cast(w2[...]),
                            preferred_element_type=jnp.float32) + b2[...])
    # out^T = (h @ w3)^T computed directly as w3t^T @ h^T : [8, BN]
    out = jax.lax.dot_general(cast(w3t[...]), cast(h),
                              dimension_numbers=(((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[...] = out + b3[...].reshape(8, 1)


@functools.partial(jax.jit, static_argnames=("pe", "interpret"))
def _field_fwd_t(pts_t, packed, pe: int = 6, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts_t.shape[1]
    names = ["w0", "b0", "w1", "b1", "w2", "b2", "w3t", "b3"]
    out = pl.pallas_call(
        functools.partial(_kernel, pe=pe),
        name="nero_field_fwd",
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(n // BLOCK_N,),
        in_specs=[pl.BlockSpec((8, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names],
        out_specs=pl.BlockSpec((8, BLOCK_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_t, *[packed[k] for k in names])
    return out[0]


# per-point matmul FLOPs of the 4-layer field (w0 [48,128], w1/w2 [128,128],
# w3t [128,8]); published for core/mfu.py's Pallas FLOP accounting
POINT_FLOPS = 2 * (FEAT_PAD * 128 + 2 * 128 * 128 + 128 * 8)
# wide topology: 3 matmuls, every one full-K (w0 [128,128] @ K=123 padded,
# w1 [128,128], w2t [128,8])
POINT_FLOPS_WIDE = 2 * (128 * 128 + 128 * 128 + 128 * 8)


def hlo_flops(name: str, out_shapes, in_shapes):
    if name == "nero_field_fwd":
        return float(out_shapes[0][1]) * POINT_FLOPS   # out (8, N)
    return None


def field_fwd_fused(packed, pts: jnp.ndarray, pe: int = 6,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused field eval: [..., 3] -> [...] (no grad; used by the tracer)."""
    from nero_tpu.ops.pallas.interp import resolve
    interpret = resolve(interpret)
    # no-grad kernel: sever tangents before the pallas_call (no JVP rule)
    packed = jax.tree_util.tree_map(jax.lax.stop_gradient, packed)
    pts = jax.lax.stop_gradient(pts)
    shape = pts.shape[:-1]
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    n_pad = (-n) % BLOCK_N
    flat = jnp.pad(flat, ((0, n_pad), (0, 0)))
    pts_t = jnp.pad(flat.T, ((0, 5), (0, 0)))  # [8, N]
    vals = _field_fwd_t(pts_t, packed, pe, interpret)
    return vals[:n].reshape(shape)
