"""SpGEMM composition tests: composed operator vs sequential application."""

import numpy as np
import pytest

from jincresize_tpu.compose import compose
from jincresize_tpu.golden import apply_plane_numpy, materialize_blocks
from jincresize_tpu.operator import build_plane_operator, radius_for_tap


@pytest.fixture(scope="module")
def ops():
    A = build_plane_operator(40, 30, 60, 44, radius_for_tap(2))
    B = build_plane_operator(60, 44, 90, 66, radius_for_tap(2))
    return A, B


def test_composed_matches_sequential_float(ops):
    A, B = ops
    R = compose(A, B)
    rng = np.random.default_rng(0)
    src = rng.random((30, 40), dtype=np.float32)
    seq = apply_plane_numpy(B, apply_plane_numpy(A, src))
    one = apply_plane_numpy(R, src)
    # float32-accumulation differences only; composition itself is float64.
    assert np.abs(one - seq).max() < 1e-4


def test_composed_rows_sum_to_one(ops):
    A, B = ops
    R = compose(A, B)
    blocks = materialize_blocks(R)
    sums = blocks.reshape(R.dst_height, R.dst_width, -1).astype(np.float64).sum(-1)
    assert np.abs(sums - 1.0).max() < 1e-4


def test_composed_geometry(ops):
    A, B = ops
    R = compose(A, B)
    assert (R.src_width, R.src_height) == (A.src_width, A.src_height)
    assert (R.dst_width, R.dst_height) == (B.dst_width, B.dst_height)
    assert R.filter_size >= A.filter_size  # support widens through composition


def test_compose_with_downscale():
    A = build_plane_operator(48, 36, 24, 18, radius_for_tap(2))  # down 2x
    B = build_plane_operator(24, 18, 36, 28, radius_for_tap(2))  # up 1.5x
    R = compose(A, B)
    rng = np.random.default_rng(1)
    src = rng.random((36, 48), dtype=np.float32)
    seq = apply_plane_numpy(B, apply_plane_numpy(A, src))
    one = apply_plane_numpy(R, src)
    assert np.abs(one - seq).max() < 1e-4


def test_compose_dim_mismatch():
    A = build_plane_operator(40, 30, 60, 44, radius_for_tap(2))
    B = build_plane_operator(61, 44, 90, 66, radius_for_tap(2))
    with pytest.raises(ValueError, match="source geometry must match"):
        compose(A, B)


def test_compose_large_plane_dedup():
    """ROADMAP 9: border composition dedups by block identity — a 1080p->4K
    chain composes in seconds (was hours of per-pixel Python) and still
    matches the two-pass float application."""
    import time

    A = build_plane_operator(480, 270, 960, 540, radius_for_tap(3))
    B = build_plane_operator(960, 540, 1920, 1080, radius_for_tap(3))
    t0 = time.time()
    C = compose(A, B)
    dt = time.time() - t0
    assert dt < 120.0  # generous CI bound; ~1s typical
    rng = np.random.default_rng(3)
    src = rng.random((270, 480), dtype=np.float32)
    two = apply_plane_numpy(B, apply_plane_numpy(A, src))
    one = apply_plane_numpy(C, src)
    assert np.abs(one - two).max() < 5e-6


def test_composed_operator_reenters_conv_path():
    """Composed operators are regular PlaneOperators: the phase compiler and
    the conv applier accept them unchanged (the SpGEMM north star — one
    fused pass through the fast path)."""
    from jincresize_tpu.apply_conv import ConvApplier
    from jincresize_tpu.phase import plan_phases

    A = build_plane_operator(64, 48, 128, 96, radius_for_tap(2))
    B = build_plane_operator(128, 96, 256, 192, radius_for_tap(2))
    C = compose(A, B)
    assert plan_phases(C) is not None, "composed 4x chain should be periodic"
    applier = ConvApplier(C)
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    src = rng.random((48, 64), dtype=np.float32)
    out = np.asarray(applier(jnp.asarray(src)))
    ref = apply_plane_numpy(C, src)
    assert np.abs(out - ref).max() < 1e-5
