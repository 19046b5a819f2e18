"""Pallas FLOP accounting (core/mfu.py): parser + analytic-counter checks.

XLA's cost_analysis reports 0 FLOPs for tpu_custom_call, so each kernel
publishes a closed-form matmul count (VERDICT r3 weak #1). These tests pin:
(a) the HLO text parser extracts names/shapes and dispatches correctly,
(b) the forward counters match XLA's own count of the equivalent unfused
    math (matmuls dominate; tolerance covers uncounted elementwise ops),
(c) the backward counters match the interpret-mode kernels' compiled cost
    (single-block grid, so the grid loop body is counted exactly once).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nero_tpu.core.mfu import flops_breakdown, pallas_flops_of_text


# --------------------------------------------------------------------------
# (a) parser
# --------------------------------------------------------------------------

_FWD_LINE = (
    '  %nero_sdf_grad_fwd.42 = (f32[512,8]{1,0:T(8,128)S(1)}, '
    'f32[512,256]{1,0:T(8,128)}) custom-call(%pts.1, %w.2), '
    'custom_call_target="tpu_custom_call", '
    'operand_layout_constraints={f32[512,8]{1,0}, f32[128,256]{1,0}}, '
    'metadata={op_name="jit(step)/nero_sdf_grad_fwd/pallas_call" '
    'source_file="a.py" source_line=1}, backend_config={}'
)
_MARCH_LINE = (
    '  ROOT %nero_march_c32_r8.7 = f32[8,393216]{1,0:T(8,128)} '
    'custom-call(%rays.1), custom_call_target="tpu_custom_call", '
    'operand_layout_constraints={f32[8,393216]{1,0}}, '
    'metadata={op_name="jit(f)/nero_march_c32_r8/pallas_call"}'
)
_UNKNOWN_LINE = (
    '  %somebody_elses_kernel.1 = f32[8,8]{1,0} custom-call(%x.1), '
    'custom_call_target="tpu_custom_call", '
    'operand_layout_constraints={f32[8,8]{1,0}}'
)


def test_parser_dispatch_and_shapes():
    from nero_tpu.ops.pallas.field_kernel import POINT_FLOPS
    from nero_tpu.ops.pallas.sdf_grad_kernel import _K_FWD

    total, by_kernel, unknown = pallas_flops_of_text(
        "\n".join([_FWD_LINE, _MARCH_LINE, _UNKNOWN_LINE, "%y = add(%a, %b)"]))
    assert unknown == 1
    assert by_kernel["nero_sdf_grad_fwd"] == 2.0 * 4 * 512 * _K_FWD
    assert by_kernel["nero_march_c32_r8"] == 393216 * 40 * POINT_FLOPS
    assert total == sum(by_kernel.values())


def test_sphere_march_name_flops():
    from nero_tpu.ops.pallas.field_kernel import POINT_FLOPS
    from nero_tpu.ops.pallas.march_kernel import hlo_flops

    # sphere march encodes its iteration budget: s20 + r8 = 28 evals/ray
    assert hlo_flops("nero_smarch_s20_r8", [(8, 4096)], []) == \
        4096 * 28 * POINT_FLOPS
    assert hlo_flops("nero_march_c32_r8", [(8, 4096)], []) == \
        4096 * 40 * POINT_FLOPS
    assert hlo_flops("something_else", [(8, 4096)], []) is None

    # wide topology (_w suffix): 3 full-K matmuls per eval
    from nero_tpu.ops.pallas.field_kernel import POINT_FLOPS_WIDE
    assert POINT_FLOPS_WIDE == 2 * (128 * 128 + 128 * 128 + 128 * 8)
    assert hlo_flops("nero_smarch_s20_r8_w", [(8, 4096)], []) == \
        4096 * 28 * POINT_FLOPS_WIDE

    # Illinois refine tag (`i`): same 1 field eval per refine iteration
    assert hlo_flops("nero_smarch_s20_r3i", [(8, 4096)], []) == \
        4096 * 23 * POINT_FLOPS
    assert hlo_flops("nero_smarch_s20_r3i_w", [(8, 4096)], []) == \
        4096 * 23 * POINT_FLOPS_WIDE


def test_parser_instruction_name_fallback():
    # no op_name metadata -> kernel identified from the instruction name
    line = _MARCH_LINE.split(", metadata=")[0]
    total, by_kernel, unknown = pallas_flops_of_text(line)
    assert unknown == 0 and "nero_march_c32_r8" in by_kernel


# --------------------------------------------------------------------------
# (b) forward counters vs XLA's count of the equivalent unfused math
# --------------------------------------------------------------------------


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_sdf_grad_fwd_counter_matches_equivalent_math():
    from nero_tpu.ops.pallas import sdf_grad_kernel as K

    n = 256
    pe_all = jnp.zeros((4 * n, K.PE_PAD))
    packed = [jnp.zeros((K.PE_PAD, 256)), *[jnp.zeros((256, 256))] * 4,
              jnp.zeros((K.PE_PAD, 256)), *[jnp.zeros((256, 256))] * 3,
              jnp.zeros((256, K.OUT_PAD)), jnp.zeros((16, K.OUT_PAD)),
              jnp.zeros((8, K.PE_PAD))]

    def fwd(pe_all, packed):
        z8, _ = K._fwd_layers(pe_all, packed, 100.0, n)
        return z8

    xla = _xla_flops(fwd, pe_all, packed)
    ours = K.hlo_flops("nero_sdf_grad_fwd", [(n, 8), (n, 256)], [(n, 8)])
    # ours counts matmuls only; XLA additionally counts the activations
    assert ours <= xla <= ours * 1.05, (ours, xla)


def test_field_and_march_counters_match_equivalent_math():
    from nero_tpu.ops.pallas import field_kernel as FK
    from nero_tpu.ops.pallas import march_kernel as MK

    n = 1024
    packed = {"w0": jnp.zeros((FK.FEAT_PAD, 128)), "b0": jnp.zeros((1, 128)),
              "w1": jnp.zeros((128, 128)), "b1": jnp.zeros((1, 128)),
              "w2": jnp.zeros((128, 128)), "b2": jnp.zeros((1, 128)),
              "w3t": jnp.zeros((128, 8)), "b3": jnp.zeros((1, 8))}

    def field(pts_t, packed):
        return MK._field_eval_t(pts_t, packed["w0"], packed["b0"],
                                packed["w1"], packed["b1"], packed["w2"],
                                packed["b2"], packed["w3t"], packed["b3"], 6)

    xla = _xla_flops(field, jnp.zeros((3, n)), packed)
    ours = FK.hlo_flops("nero_field_fwd", [(8, n)], [(8, n)])
    assert ours <= xla <= ours * 1.10, (ours, xla)
    # march = (n_coarse + n_refine) field evals per ray
    march = MK.hlo_flops("nero_march_c48_r8", [(8, n)], [(8, n)])
    assert march == pytest.approx(56 * ours, rel=1e-9)


def test_predictor_counters_match_equivalent_math():
    from nero_tpu.ops.pallas import predictor_kernel as PK

    n, DI, DO = 512, 128, 128
    ws = (jnp.zeros((DI, 256)), jnp.zeros((256, 256)), jnp.zeros((256, 256)),
          jnp.zeros((256, DO)), jnp.zeros((8, 256)))

    def fwd(x, ws):
        w1, w2, w3, w4, b = ws
        h = jnp.maximum(x @ w1 + b[0:1], 0.0)
        h = jnp.maximum(h @ w2 + b[1:2], 0.0)
        h = jnp.maximum(h @ w3 + b[2:3], 0.0)
        return h @ w4 + b[3:4, :DO]

    xla = _xla_flops(fwd, jnp.zeros((n, DI)), ws)
    ours = PK.hlo_flops("nero_predictor_fwd", [(n, DO)], [(n, DI)])
    assert ours <= xla <= ours * 1.05, (ours, xla)

    # backward: fwd recompute + full reverse = vjp cost + the fwd the XLA
    # vjp does NOT recompute (it saves residuals) - dx is produced by both
    def loss_vjp(x, ws):
        out, vjp = jax.vjp(fwd, x, ws)
        return vjp(out)

    xla_vjp = _xla_flops(loss_vjp, jnp.zeros((n, DI)), ws)
    ours_bwd = PK.hlo_flops("nero_predictor_bwd", [(n, DI)], [(n, DI), (n, DO)])
    # xla_vjp = full fwd + reverse; ours_bwd = fwd recompute (which skips the
    # final z4 = h3 @ w4 - the reverse never needs z4) + reverse
    expect = ours_bwd + 2 * n * 256 * DO
    assert expect <= xla_vjp <= expect * 1.05, (ours_bwd, expect, xla_vjp)


# --------------------------------------------------------------------------
# (c) backward counter vs the interpret-mode kernel's compiled cost
# --------------------------------------------------------------------------


def test_sdf_grad_bwd_counter_matches_interpret_kernel():
    from nero_tpu.ops.pallas import sdf_grad_kernel as K

    n = K.BB_BWD  # single grid block: the grid loop body is counted once
    pts8 = jnp.zeros((n, 8))
    gsg = jnp.zeros((n, 8))
    gfeats = jnp.zeros((n, 256))
    packed = (jnp.zeros((K.PE_PAD, 256)), *[jnp.zeros((256, 256))] * 4,
              jnp.zeros((K.PE_PAD, 256)), *[jnp.zeros((256, 256))] * 3,
              jnp.zeros((256, K.OUT_PAD)), jnp.zeros((16, K.OUT_PAD)),
              jnp.zeros((8, K.PE_PAD)))

    def bwd(pts8, gsg, gfeats, packed):
        return K._bwd_call(pts8, gsg, gfeats, packed, 100.0, 2.0,
                           interpret=True)

    xla = _xla_flops(bwd, pts8, gsg, gfeats, packed)
    ours = K.hlo_flops("nero_sdf_grad_bwd",
                       [(K.PE_PAD, 256)], [(n, 8), (n, 8), (n, 256)])
    assert abs(xla - ours) / ours < 0.05, (ours, xla)


def test_flops_breakdown_no_pallas_graph():
    b = flops_breakdown(jax.jit(lambda x: x @ x), jnp.zeros((64, 64)))
    assert b["pallas"] == 0.0 and b["total"] == b["xla"] > 0


# --------------------------------------------------------------------------
# (d) A/B engagement guard: a self-vs-self arm must abort (VERDICT r4 #4)
# --------------------------------------------------------------------------


def test_assert_kernels_aborts_on_vacuous_arm():
    from nero_tpu.core.mfu import assert_kernels

    fn = jax.jit(lambda x: x @ x)  # compiles NO pallas kernels (CPU / XLA)
    x = jnp.zeros((64, 64))
    # honest expectation: absent -> passes, returns the compiled names
    assert assert_kernels(fn, {"nero_shader": False}, "xla arm", x) == []
    # vacuous arm: claims the fused kernel is engaged, but HLO has none
    with pytest.raises(AssertionError, match="nero_shader"):
        assert_kernels(fn, {"nero_shader": True}, "fused arm", x)
    # name-list form (ceiling_stage2.run_variant feeds pallas_by_kernel keys)
    assert_kernels(["nero_smarch_s20_r8"], {"nero_smarch_": True,
                                            "nero_march_": False})
    with pytest.raises(AssertionError, match="nero_march_"):
        assert_kernels(["nero_smarch_s20_r8"], {"nero_march_": True})
