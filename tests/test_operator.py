"""Operator-builder property tests (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from jincresize_tpu.golden import apply_plane_numpy, materialize_blocks
from jincresize_tpu.operator import build_plane_operator, radius_for_tap

f32 = np.float32


@pytest.fixture(scope="module")
def op():
    return build_plane_operator(48, 32, 72, 50, radius_for_tap(3))


def test_rows_sum_to_one(op):
    # Normalization (JincResize.cpp:504-514): every pixel's block sums to ~1.
    blocks = materialize_blocks(op)
    sums = blocks.reshape(blocks.shape[0], blocks.shape[1], -1).astype(np.float64).sum(-1)
    assert np.abs(sums - 1.0).max() < 1e-5


def test_dc_invariance(op):
    # A constant image must be reproduced exactly after integer rounding.
    src = np.full((32, 48), 119, dtype=np.uint8)
    out = apply_plane_numpy(op, src, out_dtype=np.uint8, peak=255)
    assert (out == 119).all()


def test_dc_invariance_float(op):
    src = np.full((32, 48), 0.6181, dtype=f32)
    out = apply_plane_numpy(op, src)
    assert np.abs(out - 0.6181).max() < 1e-5


def test_windows_in_bounds(op):
    fs = op.filter_size
    assert (op.start_x >= 0).all() and (op.start_x + fs <= 48).all()
    assert (op.start_y >= 0).all() and (op.start_y + fs <= 32).all()


def test_dedup_and_stats(op):
    st = op.stats()
    assert st["dict_blocks"] > 0
    assert st["interior_pixels"] + st["border_pixels"] == st["dst_pixels"]
    assert st["dedup_ratio"] > 1.0  # quantization must deduplicate interior


def test_quant1_single_block():
    # quantize 1x1: all interior pixels share one block.
    op1 = build_plane_operator(
        48, 32, 72, 50, radius_for_tap(3), quantize_x=1, quantize_y=1
    )
    assert op1.pair_blocks.shape[:2] == (1, 1)


def test_border_strips_cover_border(op):
    covered = np.zeros((op.dst_height, op.dst_width), dtype=bool)
    covered[op.y_lo : op.y_hi, op.x_lo : op.x_hi] = True
    for s in op.strips:
        assert not covered[s.y0 : s.y1, s.x0 : s.x1].any()  # no overlap
        covered[s.y0 : s.y1, s.x0 : s.x1] = True
    assert covered.all()


def test_tap_radius_table():
    assert radius_for_tap(1) == pytest.approx(1.2196698912665045)
    assert radius_for_tap(8) == pytest.approx(8.2453949139520427)
    with pytest.raises(ValueError):
        radius_for_tap(0)
    with pytest.raises(ValueError):
        radius_for_tap(17)
