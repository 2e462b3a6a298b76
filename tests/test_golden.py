"""End-to-end builder+apply vs the independent scalar oracle (bit-exact)."""

import numpy as np
import pytest

from jincresize_tpu.golden import apply_plane_numpy, reference_resize_plane
from jincresize_tpu.operator import build_plane_operator, radius_for_tap

CASES = [
    # (src_w, src_h, dst_w, dst_h, tap, kwargs) — tiny sizes: the oracle is scalar.
    (48, 32, 72, 50, 3, {}),
    (48, 32, 24, 18, 2, {}),
    (40, 40, 60, 60, 3, dict(quantize_x=100, quantize_y=37)),
    (
        48,
        32,
        64,
        44,
        3,
        dict(crop_left=1.7, crop_top=0.3, crop_width=43.5, crop_height=30.2),
    ),
]


@pytest.mark.parametrize("sw,sh,dw,dh,tap,kw", CASES)
def test_matches_scalar_oracle_u16(sw, sh, dw, dh, tap, kw):
    rng = np.random.default_rng(sw * dh + tap)
    src = rng.integers(0, 1024, size=(sh, sw)).astype(np.uint16)
    r = radius_for_tap(tap)
    op = build_plane_operator(sw, sh, dw, dh, r, **kw)
    a = apply_plane_numpy(op, src, out_dtype=np.uint16, peak=1023)
    b = reference_resize_plane(
        src, dw, dh, r, out_dtype=np.uint16, peak=1023, **kw
    )
    np.testing.assert_array_equal(a, b)


def test_matches_scalar_oracle_f32_and_blur():
    rng = np.random.default_rng(7)
    src = rng.random((32, 48), dtype=np.float32)
    r = radius_for_tap(3)
    blur = 0.9812505
    op = build_plane_operator(48, 32, 72, 50, r, blur=blur)
    a = apply_plane_numpy(op, src)
    b = reference_resize_plane(src, 72, 50, r, blur=blur)
    np.testing.assert_array_equal(a, b)
