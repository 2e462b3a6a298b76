"""Fused dst-layout Pallas interior: parity vs the golden scalar model.

Runs in Pallas interpret mode on the CPU harness; the same code path is the
TPU fast path (kernels/pallas_fused.py). Mirrors the reference's opt=0/1/2/3
cross-impl equivalence discipline (SURVEY.md §4).
"""

import numpy as np
import pytest

from jincresize_tpu.golden import apply_plane_numpy
from jincresize_tpu.operator import build_plane_operator, radius_for_tap


def _fused_parity(op, seed=0, dtype=np.float32, peak=None, tol=1e-6):
    import jax.numpy as jnp

    from jincresize_tpu.apply_conv import ConvApplier

    ap = ConvApplier(op, interior="fused")
    rng = np.random.default_rng(seed)
    if dtype == np.float32:
        src = rng.random((op.src_height, op.src_width), dtype=np.float32)
    else:
        src = rng.integers(0, int(peak) + 1, (op.src_height, op.src_width)).astype(
            dtype
        )
    a = np.asarray(ap(jnp.asarray(src), out_dtype=dtype, peak=peak))
    b = apply_plane_numpy(op, src, out_dtype=dtype, peak=peak)
    if dtype == np.float32:
        assert np.abs(a - b).max() <= tol
    else:
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@pytest.mark.parametrize(
    "sw,sh,dw,dh,tap",
    [
        (64, 48, 128, 96, 8),  # exact 2x up, tap 8 (the flagship config shape)
        (96, 60, 64, 40, 3),  # downscale
        (90, 60, 60, 40, 4),  # 2/3 downscale (p=2, q=3)
        (64, 64, 256, 256, 3),  # 4x up (p=4, q=1)
        (40, 30, 200, 150, 3),  # 5x up (many column phases)
    ],
)
def test_fused_parity_f32(sw, sh, dw, dh, tap):
    op = build_plane_operator(sw, sh, dw, dh, radius_for_tap(tap))
    _fused_parity(op)


def test_fused_parity_u8():
    op = build_plane_operator(64, 48, 128, 96, radius_for_tap(8))
    _fused_parity(op, dtype=np.uint8, peak=255.0)


def test_fused_parity_subpixel_crop():
    op = build_plane_operator(
        64, 48, 128, 96, radius_for_tap(4), crop_left=0.25, crop_top=-0.5
    )
    _fused_parity(op)


@pytest.mark.parametrize(
    "sw,sh,dw,dh,tap",
    [
        (64, 48, 128, 96, 6),  # 2x up (p=2, q=1)
        (90, 60, 60, 40, 4),  # 2/3 down (p=2, q=3)
    ],
)
def test_fused_matches_shift_interior(sw, sh, dw, dh, tap):
    """Cross-impl equivalence: fused kernel vs XLA shift-sum, same operator.

    Geometries are chosen with small phase counts: large-period plans (float
    drift on non-exact ratios can push p to ~40) make the unrolled shift-sum
    comparator's trace explode — the fused path itself is exercised on such
    plans only through its auto-dispatch guard (is_supported rejects them).
    """
    import jax.numpy as jnp

    from jincresize_tpu.apply_conv import ConvApplier

    op = build_plane_operator(sw, sh, dw, dh, radius_for_tap(tap))
    a_f = ConvApplier(op, interior="fused")
    a_s = ConvApplier(op, interior="shift")
    src = np.random.default_rng(1).random((sh, sw), dtype=np.float32)
    ra = np.asarray(a_f(jnp.asarray(src)))
    rb = np.asarray(a_s(jnp.asarray(src)))
    assert np.abs(ra - rb).max() <= 2e-6


def test_strip_kernel_engaged_and_correct():
    """The Pallas strip kernel must engage (not silently fall back) and match."""
    import jax.numpy as jnp

    from jincresize_tpu.apply_conv import ConvApplier
    from jincresize_tpu.kernels.pallas_strips import make_strips_interior
    from jincresize_tpu.phase import plan_phases

    op = build_plane_operator(64, 48, 128, 96, radius_for_tap(8))
    plan = plan_phases(op)
    assert make_strips_interior(op, plan, interpret=True) is not None
    ap = ConvApplier(op, interior="fused")
    src = np.random.default_rng(5).random((48, 64), dtype=np.float32)
    a = np.asarray(ap(jnp.asarray(src)))
    b = apply_plane_numpy(op, src, out_dtype=np.float32)
    assert np.abs(a - b).max() <= 1e-6


def test_strip_kernel_declines_wide_phase_plans():
    """px>5 scoped-VMEM-OOMs the strip kernel at compile on real TPU (r3);
    make_strips_interior must return None and the ConvApplier must still
    produce correct output through the XLA strips path."""
    import jax.numpy as jnp

    from jincresize_tpu.apply_conv import ConvApplier
    from jincresize_tpu.kernels.pallas_strips import make_strips_interior
    from jincresize_tpu.phase import plan_phases

    # Anisotropic 8/3-by-4/3 (px=8, py=4) in f64 geometry mode.
    op = build_plane_operator(
        360, 240, 960, 320, radius_for_tap(4),
        crop_left=0.3, crop_top=0.3, pos_precision="f64")
    plan = plan_phases(op)
    assert (plan.y.p, plan.x.p) == (4, 8)
    assert make_strips_interior(op, plan, interpret=True) is None
    ap = ConvApplier(op, interior="fused")
    assert ap._strips_kfn_spec is None  # kernel declined, slicing path in use
    src = np.random.default_rng(5).random((240, 360), dtype=np.float32)
    a = np.asarray(ap(jnp.asarray(src)))
    b = apply_plane_numpy(op, src, out_dtype=np.float32)
    assert np.abs(a - b).max() <= 1e-6
