"""Native C++ builder core: availability and bit-parity with NumPy."""

import numpy as np
import pytest

from jincresize_tpu import native
from jincresize_tpu.filters import build_lut
from jincresize_tpu.geometry import build_plane_geometry
from jincresize_tpu.operator import compute_blocks, radius_for_tap


def test_native_builds_and_matches_numpy():
    lib = native.get_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    radius = radius_for_tap(3)
    lut = build_lut(radius, 1.0)
    g = build_plane_geometry(64, 48, 96, 72, radius, 0.0, 0.0, 64.0, 48.0, 256, 256)
    dy = g.y.dist_quant[:20]
    dx = g.x.dist_quant[:30]
    nat = native.compute_blocks_native(
        dy, dx, g.y.filter_step, g.x.filter_step, lut, radius, 1024
    )
    # NumPy path via the module-level fallback.
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        ref = compute_blocks(
            dy, dx, g.y.filter_step, g.x.filter_step, lut, radius
        )
    finally:
        native._LIB, native._TRIED = saved
    np.testing.assert_array_equal(nat, ref)  # bit-exact


def test_native_disabled_by_env(monkeypatch):
    monkeypatch.setenv("JINCRESIZE_NATIVE", "0")
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, False
    try:
        assert native.get_library() is None
    finally:
        native._LIB, native._TRIED = saved
