"""Format-matrix parity (SURVEY.md §4): device impl vs host golden.

{u8,u16,f32} x {Y, 420, 422, 444, 411, RGB(P), +alpha} x {up, down, sub-pixel
crop} x cplace {mpeg1, mpeg2, topleft} x quant {1, 256} — sampled pairwise
rather than the full cross product, with every level of every factor covered.
Tolerance: 1 LSB for integer formats, 1e-6 for float (the reference's own
opt=0..3 paths differ by accumulation order, SURVEY.md §4).
"""

import numpy as np
import pytest

from jincresize_tpu.api import jinc_resize
from jincresize_tpu.clip import (
    Clip,
    gray,
    random_frame,
    rgbp,
    yuv411p,
    yuv420p,
    yuv422p,
    yuv444p,
)


def _parity(fmt, sw, sh, dw, dh, seed=0, **kw):
    clip = Clip.from_frames([random_frame(fmt, sw, sh, seed=seed)])
    dev = jinc_resize(clip, dw, dh, **kw).frames[0]
    ref = jinc_resize(clip, dw, dh, impl="numpy", **kw).frames[0]
    for name in fmt.plane_names:
        a, b = dev.planes[name], ref.planes[name]
        if fmt.bits == 32:
            assert np.abs(a - b).max() <= 1e-6, name
        else:
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, name


CASES = [
    # (fmt, sw, sh, dw, dh, kwargs)
    (gray(8), 48, 36, 96, 72, {}),
    (yuv420p(8), 64, 48, 128, 96, {"cplace": "mpeg2"}),
    (yuv420p(16), 64, 48, 128, 96, {"cplace": "mpeg1"}),
    (yuv420p(8), 64, 48, 128, 96, {"cplace": "topleft"}),
    (yuv422p(10), 64, 48, 96, 72, {"tap": 4}),
    (yuv444p(32), 48, 36, 96, 72, {"tap": 4}),
    (yuv411p(8), 64, 48, 128, 96, {}),
    (rgbp(8), 48, 36, 96, 72, {}),
    (rgbp(32), 48, 36, 72, 54, {"tap": 4}),
    (yuv420p(8, alpha=True), 64, 48, 128, 96, {}),
    # downscale
    (yuv420p(8), 96, 64, 64, 48, {"tap": 3}),
    (gray(16), 96, 72, 48, 36, {"tap": 4}),
    # sub-pixel crop + blur
    (gray(8), 64, 48, 128, 96, {"src_left": 0.25, "src_top": -0.5, "blur": 0.98}),
    # quant extremes
    (gray(8), 64, 48, 96, 72, {"quant_x": 1, "quant_y": 1}),
    (yuv420p(8), 64, 48, 96, 72, {"quant_x": 256, "quant_y": 256}),
]


@pytest.mark.parametrize(
    "fmt,sw,sh,dw,dh,kw",
    CASES,
    ids=[
        f"{f.family}{f.sub_w}{f.sub_h}-{f.bits}{'a' if f.has_alpha else ''}"
        f"-{sw}x{sh}to{dw}x{dh}-" + "-".join(f"{k}={v}" for k, v in kw.items())
        for f, sw, sh, dw, dh, kw in CASES
    ],
)
def test_device_matches_golden(fmt, sw, sh, dw, dh, kw):
    _parity(fmt, sw, sh, dw, dh, **kw)


def test_float_clamp_semantics():
    """SIMD float-path source clamp (resize_plane_avx2.cpp:24): chroma/alpha
    clamp at -0.5, luma at 0.0 — active unless opt==0 (C kernel semantics).
    Device and golden must agree under BOTH dispatch modes, and the clamp
    must actually matter for negative inputs."""
    fmt = yuv444p(32)
    rng = np.random.default_rng(5)
    planes = {
        n: (rng.random((24, 32), dtype=np.float32) * 2.0 - 1.0)
        for n in fmt.plane_names
    }
    from jincresize_tpu.clip import Frame

    clip = Clip.from_frames([Frame(format=fmt, planes=planes)])
    for opt in (-1, 0):
        dev = jinc_resize(clip, 64, 48, opt=opt).frames[0]
        ref = jinc_resize(clip, 64, 48, opt=opt, impl="numpy").frames[0]
        for n in fmt.plane_names:
            assert np.abs(dev.planes[n] - ref.planes[n]).max() <= 1e-6, (opt, n)
    clamped = jinc_resize(clip, 64, 48, opt=-1, impl="numpy").frames[0]
    raw = jinc_resize(clip, 64, 48, opt=0, impl="numpy").frames[0]
    assert any(
        not np.array_equal(clamped.planes[n], raw.planes[n])
        for n in fmt.plane_names
    ), "clamp had no effect on negative inputs"


def test_u16_overshoot_clamp():
    """Jinc ringing overshoots hard edges; integer stores clamp to [0, peak]
    (JincResize.cpp:581 lrintf(clamp(...))). A u16 step edge must saturate
    identically on device and host."""
    fmt = gray(16)
    img = np.zeros((32, 48), np.uint16)
    img[:, 24:] = 65535
    from jincresize_tpu.clip import Frame

    clip = Clip.from_frames([Frame(format=fmt, planes={"Y": img})])
    dev = jinc_resize(clip, 96, 64, tap=8).frames[0].planes["Y"]
    ref = jinc_resize(clip, 96, 64, tap=8, impl="numpy").frames[0].planes["Y"]
    assert np.abs(dev.astype(int) - ref.astype(int)).max() <= 1
    # Ringing against the clamp boundary is present (documents the
    # C-vs-SIMD saturation equivalence class).
    assert (ref == 0).any() and (ref == 65535).any()


def test_alpha_float_clamp_quirk():
    """The ALPHA float-clamp quirk (ROADMAP 15 / r3 VERDICT weak #7): the
    SIMD kernels pick the source clamp by plane INDEX — ``(i && !is_rgb) ?
    -0.5 : 0.0`` (resize_plane_avx2.cpp:24) — so a YUVA float ALPHA plane
    (i=3) gets the CHROMA clamp of -0.5, not the 0.0 a full-range plane
    would suggest, while RGBA alpha gets 0.0. Pinned by resampling an alpha
    plane holding values in (-0.5, 0): they must survive (not be zeroed)
    for YUVA and be zeroed for RGBA."""
    from jincresize_tpu.clip import Frame, rgbp

    rng = np.random.default_rng(6)
    alpha = (rng.random((24, 32), dtype=np.float32) * 0.4 - 0.45).astype(
        np.float32
    )  # all in (-0.45, -0.05): between the two clamp levels
    pos = rng.random((24, 32), dtype=np.float32)

    fmt_yuva = yuv444p(32, alpha=True)
    planes = {"Y": pos, "U": pos, "V": pos, "A": alpha}
    clip = Clip.from_frames([Frame(format=fmt_yuva, planes=planes)])
    out_a = jinc_resize(clip, 64, 48).frames[0].planes["A"]
    # -0.5 clamp: the negative alpha values pass through the resampler.
    assert out_a.min() < -0.05, "YUVA alpha was clamped at 0 (expected -0.5)"

    fmt_rgba = rgbp(32, alpha=True)
    planes_r = {"G": pos, "B": pos, "R": pos, "A": alpha}
    clip_r = Clip.from_frames([Frame(format=fmt_rgba, planes=planes_r)])
    out_ra = jinc_resize(clip_r, 64, 48).frames[0].planes["A"]
    # RGB family: min_val = 0.0 for every plane index — alpha zeroes out.
    assert out_ra.min() >= -1e-6 and out_ra.max() <= 1e-6


def test_u16_subpeak_overshoot_simd_vs_c():
    """The 9..15-bit overshoot clamp difference (ROADMAP 15 / r3 VERDICT
    weak #7): the C kernel clamps integer stores at ``peak``
    (JincResize.cpp:581-584), but the SIMD u16 stores saturate at the TYPE
    max via ``_mm_packus_epi32`` (resize_plane_avx2.cpp:89) — so 10-bit
    ringing overshoot exceeds peak=1023 on the reference's default dispatch.
    The rebuild mirrors the dispatch: opt!=0 (default) -> type-max
    saturation on EVERY engine, including the numpy golden, which models
    whichever reference kernel the configured opt would dispatch to on a
    SIMD-capable host (opt=-1 on a host without SSE4.1 would fall back to
    the C kernel's peak clamp — that host class is not modeled); opt=0 ->
    the C kernel's peak clamp on every engine."""
    from jincresize_tpu.clip import Frame

    fmt = gray(10)
    img = np.zeros((32, 48), np.uint16)
    img[:, 24:] = 1023  # hard edge at 10-bit peak -> ringing overshoot
    clip = Clip.from_frames([Frame(format=fmt, planes={"Y": img})])
    simd = jinc_resize(clip, 96, 64, tap=8).frames[0].planes["Y"]
    c_dev = jinc_resize(clip, 96, 64, tap=8, opt=0).frames[0].planes["Y"]
    c_host = (
        jinc_resize(clip, 96, 64, tap=8, opt=0, impl="numpy")
        .frames[0]
        .planes["Y"]
    )
    assert int(simd.max()) > 1023, "SIMD semantics must overshoot past peak"
    assert int(c_dev.max()) <= 1023 and int(c_host.max()) <= 1023
    # Away from the overshoot band the two dispatches agree.
    inside = (simd <= 1023) & (c_dev <= 1023)
    assert np.abs(
        simd[inside].astype(int) - c_dev[inside].astype(int)
    ).max() <= 1


def test_alpha_f32_uses_luma_operator():
    """Alpha planes resample with out[0] (the luma operator) even for
    subsampled formats (resize_plane kernels' table select)."""
    fmt = yuv420p(32, alpha=True)
    clip = Clip.from_frames([random_frame(fmt, 32, 24, seed=9)])
    dev = jinc_resize(clip, 64, 48).frames[0]
    ref = jinc_resize(clip, 64, 48, impl="numpy").frames[0]
    assert dev.planes["A"].shape == (48, 64)
    assert np.abs(dev.planes["A"] - ref.planes["A"]).max() <= 1e-6
