"""Geometry tests: float32 position semantics and border structure."""

import numpy as np

from jincresize_tpu import geometry

f32 = np.float32


def test_cumsum_matches_serial_accumulation():
    # np.cumsum float32 must equal the reference's serial xpos += x_step walk.
    start, step, n = f32(-0.25), f32(2.0 / 3.0), 5000
    vec = geometry.accumulate_positions(start, step, n)
    pos = start
    for i in range(n):
        assert vec[i] == pos, i
        pos = f32(pos + step)


def test_trunc_toward_zero():
    vals = np.array([-1.7, -0.3, 0.0, 0.3, 1.7, 2.999999])
    assert list(geometry.trunc_to_int(vals)) == [-1, 0, 0, 0, 1, 2]


def _plane(sw, sh, dw, dh, **kw):
    return geometry.build_plane_geometry(
        src_width=sw, src_height=sh, dst_width=dw, dst_height=dh,
        radius=3.2383154841662362,
        crop_left=kw.get("crop_left", 0.0), crop_top=kw.get("crop_top", 0.0),
        crop_width=kw.get("crop_width", float(sw)),
        crop_height=kw.get("crop_height", float(sh)),
        quantize_x=kw.get("quantize_x", 256), quantize_y=kw.get("quantize_y", 256),
    )


def test_filter_size_upscale():
    g = _plane(64, 64, 128, 128)
    # upscale: filter_step=1, fs = ceil(2*radius) = 7 (BASELINE.md tap-3 row)
    assert g.filter_size == 7


def test_filter_size_downscale_inflates():
    g = _plane(128, 128, 64, 64)
    # downscale 2x: support doubles -> fs = ceil(2 * 2 * radius) = 13
    assert g.filter_size == 13


def test_border_is_prefix_suffix():
    for dims in [(64, 64, 128, 96), (100, 50, 40, 80), (16, 16, 200, 200)]:
        g = _plane(*dims)
        for ax in (g.x, g.y):
            b = ax.border
            inter = np.flatnonzero(~b)
            if len(inter):
                assert not b[inter[0] : inter[-1] + 1].any()
            # windows stay in bounds after clamping
            assert (ax.start >= 0).all()
            assert (ax.start + g.filter_size - 1 <= ax.size_src - 1).all() or len(
                inter
            ) == 0


def test_start_monotone_nondecreasing():
    g = _plane(64, 64, 128, 96)
    assert (np.diff(g.x.start) >= 0).all()
    assert (np.diff(g.y.start) >= 0).all()


def test_chroma_crop_formulas():
    # MPEG2: horizontal shift by half the scale phase (JincResize.cpp:838-839).
    cl, ct, cw, ch = geometry.chroma_crop(
        "mpeg2", 1280, 720, 1920, 1080, 0.0, 0.0, 1280.0, 720.0, 1, 1
    )
    assert cl == (0.5 * (1.0 - 1280 / 1920)) / 2.0
    assert ct == 0.0
    assert cw == 640.0 and ch == 360.0
    # MPEG1: plain scale.
    cl1, ct1, _, _ = geometry.chroma_crop(
        "mpeg1", 1280, 720, 1920, 1080, 3.0, 2.0, 1280.0, 720.0, 1, 1
    )
    assert cl1 == 1.5 and ct1 == 1.0
    # topleft: vertical shift too (420 only).
    cl2, ct2, _, _ = geometry.chroma_crop(
        "topleft", 1280, 720, 1920, 1080, 0.0, 0.0, 1280.0, 720.0, 1, 1
    )
    assert cl2 == cl and ct2 == (0.5 * (1.0 - 720 / 1080)) / 2.0
