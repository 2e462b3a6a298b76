"""Command-line interface: resample planar frames stored as .npy/.npz.

The reference's "CLI" is the AviSynth script-function registration
(JincResize.cpp:1042-1111); the TPU rebuild exposes the same parameter
surface as a standalone command:

    python -m jincresize_tpu INPUT OUTPUT --width W --height H [--tap N] ...

INPUT formats:
  * .npy — a single 2-D array (GRAY plane) or 3-D (planes, H, W) 444/RGB stack;
  * .npz — named planes (Y/U/V/A or G/B/R/A) with optional `_props` JSON.

Output mirrors the input container.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load(path: str):
    from .clip import Frame, VideoFormat

    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=False)
        names = [n for n in ("Y", "U", "V", "A", "G", "B", "R") if n in z.files]
        planes = {n: z[n] for n in names}
        props = {}
        if "_props" in z.files:
            props = json.loads(str(z["_props"]))
        if "G" in planes:
            family = "RGB"
            sub_w = sub_h = 0
        elif "U" in planes:
            family = "YUV"
            ly, lx = planes["Y"].shape
            cy, cx = planes["U"].shape
            sub_w = (lx // cx).bit_length() - 1
            sub_h = (ly // cy).bit_length() - 1
        else:
            family = "GRAY"
            sub_w = sub_h = 0
        arr = next(iter(planes.values()))
        bits = 32 if arr.dtype == np.float32 else (8 if arr.dtype == np.uint8 else 16)
        fmt = VideoFormat(family, sub_w, sub_h, bits, has_alpha="A" in planes)
        return Frame(format=fmt, planes=planes, props=props)
    arr = np.load(path)
    bits = 32 if arr.dtype == np.float32 else (8 if arr.dtype == np.uint8 else 16)
    if arr.ndim == 2:
        fmt = VideoFormat("GRAY", 0, 0, bits)
        return Frame(format=fmt, planes={"Y": arr})
    if arr.ndim == 3 and arr.shape[0] == 3:
        fmt = VideoFormat("RGB", 0, 0, bits)
        return Frame(
            format=fmt, planes={"G": arr[0], "B": arr[1], "R": arr[2]}
        )
    raise SystemExit(f"unsupported input array shape {arr.shape}")


def _save(path: str, frame) -> None:
    if path.endswith(".npz"):
        arrays = dict(frame.planes)
        arrays["_props"] = np.array(json.dumps(frame.props))
        np.savez(path, **arrays)
    else:
        names = frame.format.plane_names
        if len(names) == 1:
            np.save(path, frame.planes[names[0]])
        else:
            np.save(path, np.stack([frame.planes[n] for n in names[:3]]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="jincresize_tpu", description=__doc__.split("\n")[0]
    )
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--src-left", type=float, default=0.0)
    ap.add_argument("--src-top", type=float, default=0.0)
    ap.add_argument("--src-width", type=float, default=None)
    ap.add_argument("--src-height", type=float, default=None)
    ap.add_argument("--quant-x", type=int, default=256)
    ap.add_argument("--quant-y", type=int, default=256)
    ap.add_argument("--tap", type=int, default=3)
    ap.add_argument("--blur", type=float, default=0.0)
    ap.add_argument("--cplace", default=None)
    ap.add_argument(
        "--impl", default="auto", choices=["auto", "conv", "xla", "pallas", "numpy"]
    )
    args = ap.parse_args(argv)

    from .api import JincConfig, JincError, JincResizer

    frame = _load(args.input).validate()
    cfg = JincConfig(
        target_width=args.width,
        target_height=args.height,
        src_left=args.src_left,
        src_top=args.src_top,
        src_width=args.src_width,
        src_height=args.src_height,
        quant_x=args.quant_x,
        quant_y=args.quant_y,
        tap=args.tap,
        blur=args.blur,
        cplace=args.cplace,
        impl=args.impl,
    )
    try:
        resizer = JincResizer(
            frame.format, frame.width, frame.height, cfg, frame0=frame
        )
    except JincError as e:
        print(str(e), file=sys.stderr)
        return 2
    out = resizer.process_frame(frame)
    _save(args.output, out)
    print(
        f"{frame.width}x{frame.height} -> {out.width}x{out.height} "
        f"({frame.format.family}, {frame.format.bits}-bit, tap={cfg.tap})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
