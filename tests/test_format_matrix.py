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
