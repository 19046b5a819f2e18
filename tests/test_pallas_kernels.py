"""Pallas kernel correctness (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from nero_tpu.fields.sdf import SDFConfig, init_sdf, sdf_value
from nero_tpu.ops.pallas.sdf_kernel import pack_sdf_params, sdf_fwd_fused


def test_fused_sdf_matches_reference():
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    packed = pack_sdf_params(params, cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (600, 3), minval=-1, maxval=1)
    ref = np.asarray(sdf_value(params, pts, cfg))
    out = np.asarray(sdf_fwd_fused(packed, pts, cfg, interpret=True))
    assert out.shape == ref.shape
    # kernel runs matmuls in bf16 -> tolerance reflects that
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert np.abs(out - ref).mean() < 3e-3
