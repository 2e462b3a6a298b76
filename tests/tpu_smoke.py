"""On-TPU geometry smoke sweep (not collected by pytest on CPU runs).

Mosaic lowering failures (e.g. lane-strided slices on qx>1 geometries) do
NOT reproduce in interpret mode — run this on real TPU hardware after any
kernel change: `python tests/tpu_smoke.py`. Each case pushes a different
phase structure through the public API and checks parity against the host
golden (ROADMAP 15).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CASES = [
    # (name, src_w, src_h, dst_w, dst_h, tap, bits, kwargs)
    ("2x upscale qx=1", 96, 64, 192, 128, 8, 8, {}),
    ("2x downscale qx=2", 192, 128, 96, 64, 3, 8, {}),
    ("3/2 upscale px=3 qx=2", 128, 96, 192, 144, 4, 16, {}),
    ("4x upscale px=4", 64, 48, 256, 192, 3, 32, {}),
    ("2/3 downscale px=2 qx=3", 192, 144, 128, 96, 3, 8, {}),
    ("subpixel crop", 100, 80, 160, 120, 4, 8, {"src_left": 1.25, "src_top": 0.5}),
    ("blur + quant1", 96, 64, 144, 96, 3, 16, {"blur": 0.98, "quant_x": 1, "quant_y": 1}),
    ("tap16 2x upscale", 96, 64, 192, 128, 16, 32, {}),
    ("420 topleft chroma", 128, 96, 256, 192, 3, 8, {"cplace": "topleft", "fmt": "420"}),
    # Drift-free geometry mode: same engines, f64 positions. Parity here is
    # vs the host golden on the SAME f64 operator, so the 1-LSB bound holds.
    ("f64 3/2 subpixel crop", 128, 96, 192, 144, 4, 8,
     {"src_left": 0.123, "src_top": 0.456, "pos_precision": "f64"}),
    # Anisotropic wide-phase plan (px=8, py=4): the strip kernel must
    # decline (px>5 scoped-VMEM-OOMs at compile, r3) and the fused interior
    # still run with XLA strips.
    ("f64 8/3-by-4/3 px=8", 360, 240, 960, 320, 4, 8,
     {"src_left": 0.3, "src_top": 0.3, "pos_precision": "f64"}),
    # Segment-periodic engine (r4): genuinely drifted 1.5x under PARITY
    # positions (10 x / 5 y class staircase steps at this size), forced via
    # impl='seg' (auto gates small outputs to the gather path because seg
    # construction compiles a per-geometry kernel).
    ("seg 1.5x drifted parity", 640, 360, 960, 540, 8, 8, {"impl": "seg"}),
    # Seg exception fixup on hardware (r4 VERDICT weak #6): 2.5x wide plane
    # with start-offset outliers (4+ exception columns, host-verified by
    # tests/test_apply_conv_seg.py on the same geometry).
    ("seg 2.5x exceptions", 1920, 80, 4800, 200, 2, 8, {"impl": "seg"}),
    # tap16 deep downscale: at this small output (< the 1M-px deep-fused
    # gate) auto runs the channelized-MXU deep-tap form (_shift_sum_mxu,
    # the TPU default past SHIFT_UNROLL_MAX) — the unrolled form SIGKILLed
    # the TPU compiler at this support size.
    ("tap16 0.5x deep-shift", 480, 270, 240, 135, 16, 8, {}),
    # Same geometry through the fused Pallas kernel (r5: single-phase
    # deep-tap plans are inside its envelope; auto picks it at >= 1M px —
    # impl='pallas' forces it here so the deep-tap kernel shape is pinned
    # on hardware without a minutes-scale 4K compile).
    ("tap16 0.5x deep-fused", 480, 270, 240, 135, 16, 8, {"impl": "pallas"}),
    # Multi-phase deep-tap fused (r5: envelope admits py*px <= 4): 2/3
    # downscale tap16, fs=49, p=(2,2) — measured 7.13 ms/frame at 4K
    # (4.7x the XLA channelized form).
    ("tap16 2/3 deep-fused p2", 480, 270, 320, 180, 16, 8, {"impl": "pallas"}),
]


def main():
    from jincresize_tpu.api import jinc_resize
    from jincresize_tpu.clip import Clip, random_frame, yuv420p, yuv444p

    failures = 0
    for name, sw, sh, dw, dh, tap, bits, kw in CASES:
        kw = dict(kw)
        fmt = yuv420p(bits) if kw.pop("fmt", None) == "420" else yuv444p(bits)
        clip = Clip.from_frames([random_frame(fmt, sw, sh, seed=7)])
        try:
            out = jinc_resize(clip, dw, dh, tap=tap, **kw).frames[0]
            ref_kw = {k: v for k, v in kw.items() if k != "impl"}
            ref = jinc_resize(
                clip, dw, dh, tap=tap, impl="numpy", **ref_kw
            ).frames[0]
            if bits == 32:
                d = max(
                    float(np.abs(out.planes[n] - ref.planes[n]).max())
                    for n in out.planes
                )
                ok = d < 2e-6
            else:
                d = max(
                    int(
                        np.abs(
                            out.planes[n].astype(np.int64)
                            - ref.planes[n].astype(np.int64)
                        ).max()
                    )
                    for n in out.planes
                )
                ok = d <= 1
            status = "ok" if ok else "PARITY FAIL"
            if not ok:
                failures += 1
            print(f"{name:28s} {status}  maxdiff={d}")
        except Exception as e:  # noqa: BLE001 — smoke harness reports and moves on
            failures += 1
            print(f"{name:28s} RUN FAIL: {str(e)[:140]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
