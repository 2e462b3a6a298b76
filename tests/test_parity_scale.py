"""Production-scale parity: sampled scalar oracle vs the vectorized builder.

The tiny-dim fuzz (test_fuzz.py, <=73x65 destinations) pins the builder
bitwise, but float32 position drift — the thing the first-occurrence
factorization claim (operator.py:25-31) depends on — barely accumulates at
those sizes. Here the sampled scalar oracle (golden.reference_sample_pixels:
serial ``pos += step`` recurrences exactly like JincResize.cpp:524,531)
checks a few hundred destination pixels of >=1080p geometries, where the
serial recurrence has drifted thousands of ulps from the closed form.
"""

from __future__ import annotations

import numpy as np
import pytest

from jincresize_tpu.golden import reference_sample_pixels
from jincresize_tpu.operator import build_plane_operator, radius_for_tap

GEOMETRIES = [
    # 960x540 -> 1920x1080 tap3: exact 2x (periodic; conv-path domain).
    dict(src_width=960, src_height=540, dst_width=1920, dst_height=1080,
         radius=radius_for_tap(3)),
    # 1280x720 -> 1919x1081 tap2: aperiodic (gather-path domain), with a
    # sub-pixel crop so both position recurrences start off-grid.
    dict(src_width=1280, src_height=720, dst_width=1919, dst_height=1081,
         radius=radius_for_tap(2), crop_left=0.37, crop_top=1.12,
         crop_width=1278.9, crop_height=718.3),
    # 1920x1080 -> 1280x720 tap3 downscale (filter_step < 1 branch).
    dict(src_width=1920, src_height=1080, dst_width=1280, dst_height=720,
         radius=radius_for_tap(3)),
]


@pytest.mark.parametrize("gi", range(len(GEOMETRIES)))
def test_builder_matches_sampled_oracle_at_scale(gi):
    g = GEOMETRIES[gi]
    op = build_plane_operator(**g)
    rng = np.random.default_rng(7000 + gi)
    src = rng.random((g["src_height"], g["src_width"]), dtype=np.float32)

    n = 256
    ys = rng.integers(0, g["dst_height"], n)
    xs = rng.integers(0, g["dst_width"], n)
    # Force coverage of the extreme borders and the interior seams, where
    # the window-clamp branches and the first-occurrence rows live.
    forced_y = [0, 1, g["dst_height"] - 1, op.y_lo, op.y_hi - 1]
    forced_x = [0, 1, g["dst_width"] - 1, op.x_lo, op.x_hi - 1]
    ys = np.concatenate([ys, np.repeat(forced_y, len(forced_x))])
    xs = np.concatenate([xs, np.tile(forced_x, len(forced_y))])

    vals, blocks, sy, sx = reference_sample_pixels(
        src, ys, xs,
        dst_width=g["dst_width"], dst_height=g["dst_height"],
        radius=g["radius"],
        crop_left=g.get("crop_left", 0.0), crop_top=g.get("crop_top", 0.0),
        crop_width=g.get("crop_width"), crop_height=g.get("crop_height"),
    )

    # Window starts: bitwise (these feed every gather in every engine).
    np.testing.assert_array_equal(op.start_y[ys], sy)
    np.testing.assert_array_equal(op.start_x[xs], sx)

    # Coefficient blocks: bitwise for interior pixels (dictionary lookup)
    # AND border pixels (strip blocks) — the builder claims bit parity with
    # the reference's memoized first-come blocks at any scale.
    strip_map = {}
    for s in op.strips:
        strip_map[(s.y0, s.y1, s.x0, s.x1)] = s

    def op_block(y, x):
        if op.y_lo <= y < op.y_hi and op.x_lo <= x < op.x_hi:
            return op.pair_blocks[op.cy_idx[y], op.cx_idx[x]]
        for (y0, y1, x0, x1), s in strip_map.items():
            if y0 <= y < y1 and x0 <= x < x1:
                return s.blocks[y - y0, x - x0]
        raise AssertionError(f"pixel ({y},{x}) in no region")

    for i in range(len(ys)):
        b = op_block(int(ys[i]), int(xs[i]))
        np.testing.assert_array_equal(
            b, blocks[i], err_msg=f"block mismatch at ({ys[i]},{xs[i]})"
        )
        # Value sanity (accumulation-order tolerance, not bitwise).
        ref = float(
            np.dot(
                blocks[i].reshape(-1).astype(np.float64),
                _window(src, int(sy[i]), int(sx[i]), op.filter_size).reshape(-1),
            )
        )
        assert abs(float(vals[i]) - ref) <= 1e-5 * max(1.0, abs(ref))


def _window(src, y0, x0, fs):
    H, W = src.shape
    ys = np.clip(np.arange(y0, y0 + fs), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + fs), 0, W - 1)
    return src[np.ix_(ys, xs)].astype(np.float64)
