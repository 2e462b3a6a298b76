"""On-device benchmark of the general-geometry gather engine.

Measures the 1080p->4K tap8 case from VERDICT r2 (the one regime where the
rebuild could lose to the reference's AVX-512 socket): the XLA gather
fallback was 24 ms/frame; kernels/pallas_gather.py measures 6.93 ms on the
default 2x crop config and 8.79 ms on a truly aperiodic 1.947x ratio with
the full 256x256-class dictionary (r4 re-measurements, 8-frame batches —
the r3-recorded 16.4 ms does not reproduce on the current stack; a
cy=const ablation shows the kernel is VPU-compute-bound with weight DMA
fully hidden, see the kernel docstring). Note: 1080p->4K is exactly 2x, so
this op is actually periodic (impl='auto' runs it on the conv path at
1.7 ms); --impl gather forces the general kernel onto it, which is
weight-layout-equivalent to the aperiodic case (per-row class planes, no
periodicity assumption).

--geometry 1.5x measures the genuinely quasi-periodic regime (1.5x upscale
with sub-pixel crop: f32 position drift fragments the phase pattern).
Measured v5e, 8 frames, 1920x1080->2880x1620 tap8 (on-device loop):

  * r3 parity baseline, gather kernel:      12.21 ms/frame
  * r4 parity, --impl seg (or auto): the segment-periodic fused engine
    (kernels/pallas_fused_seg.py) runs the TRUE drifted operator on the
    MXU — measured 3.09 ms/frame on this tool's crop-0.3 config (auto
    selects fused-seg; dict 675 blocks) and 3.03 ms/frame without the
    crop (interior-only 2.63) — 4.0x the gather kernel at identical 1-LSB
    parity. Progression recorded in ROADMAP 18: 8.61 first cut -> 5.89
    banded strips -> 5.06 concat assembly -> 3.03 sliced-window strip
    im2col.
  * --pos-precision f64 (documented non-parity): exactly periodic (p=3),
    plain fused conv path, 1.43 ms/frame (r3).

--geometry 4k is the r4 VERDICT #1 geometry (2560x1440->3840x2160 tap8,
drifted 1.5x at 4K output scale), admitted to the seg engine in r5 by
band-slab dedup + per-chunk dot-M (350 MB resident vs ~1.5 GB before).
Measured v5e, 8 frames, crop 0.3: gather 9.22 ms/frame; seg fp32 parity
3.37 (0-LSB check, 2.7x); seg --u8 (fp32_u8src -> exact in-kernel 3-pass
weight split) 2.73 (1-LSB check, **3.4x** the gather baseline on the
reference's dominant u8 pipeline).

Usage: python tools/bench_gather.py [--frames N] [--impl gather|xla|auto]
                                    [--geometry 2x|1.5x] [--pos-precision f32|f64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument(
        "--impl", default="gather", choices=["gather", "xla", "auto", "seg"]
    )
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument(
        "--geometry",
        default="2x",
        choices=["2x", "1.5x", "4k"],
        help="4k = 2560x1440->3840x2160, the r4 VERDICT #1 'done'-bar "
        "geometry: drifted 1.5x at 4K output scale, formerly above the seg "
        "weight gate (r5 slab dedup brings it to 433 MB resident)",
    )
    ap.add_argument("--pos-precision", default="f32", choices=["f32", "f64"])
    ap.add_argument(
        "--check",
        action="store_true",
        help="verify u8 output of frame 0 against the host golden (<=1 LSB)",
    )
    ap.add_argument(
        "--u8",
        action="store_true",
        help="u8-valued sources + precision='fp32_u8src' (the reference's "
        "dominant real pipeline): bf16-exact sources let the seg kernel run "
        "the EXACT in-kernel 3-pass weight split instead of 6-pass HIGHEST",
    )
    args = ap.parse_args()

    import jax

    os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jincresize_tpu.cache import cached_build
    from jincresize_tpu.operator import build_plane_operator, radius_for_tap
    from jincresize_tpu.phase import plan_phases

    if args.geometry == "1.5x":
        sw, sh, dw, dh = 1920, 1080, 2880, 1620
    elif args.geometry == "4k":
        sw, sh, dw, dh = 2560, 1440, 3840, 2160
    else:
        sw, sh, dw, dh = 1920, 1080, 3840, 2160
    t0 = time.time()
    # src_left=0.3 + f32 positions: drift fragments the class dictionary
    # (quasi-periodic for 1.5x; the 2x case stays periodic and only proxies
    # the gather layout — see module docstring). pos_precision='f64' removes
    # the drift so the phase planner finds the exact rational period.
    op = cached_build(
        build_plane_operator,
        src_width=sw,
        src_height=sh,
        dst_width=dw,
        dst_height=dh,
        radius=radius_for_tap(8),
        crop_left=0.3,
        crop_top=0.3,
        pos_precision=None if args.pos_precision == "f32" else args.pos_precision,
    )
    print(
        f"# built in {time.time()-t0:.1f}s: {op.stats()} "
        f"periodic={plan_phases(op) is not None}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    if args.u8:
        src = jnp.asarray(
            rng.integers(0, 256, (args.frames, sh, sw)).astype(np.float32)
        )
    else:
        src = jnp.asarray(rng.random((args.frames, sh, sw), dtype=np.float32))

    if args.impl == "gather":
        from jincresize_tpu.apply_gather import GatherApplier

        app = GatherApplier(op)
        print(f"# tiles: {app.tile_info}", file=sys.stderr)
        fn = app
    elif args.impl == "seg":
        from jincresize_tpu.apply_conv_seg import SegConvApplier

        app = SegConvApplier(
            op, precision="fp32_u8src" if args.u8 else "fp32"
        )
        print(f"# tiles: {app.tile_info}", file=sys.stderr)
        fn = app
    elif args.impl == "auto":
        from jincresize_tpu.api import _select_engine

        app, engine = _select_engine(op, "auto", "fp32")
        print(f"# auto selected engine: {engine}", file=sys.stderr)
        if app is None:
            from jincresize_tpu import apply_xla

            dop = apply_xla.to_device(op)
            fn = jax.jit(lambda s: apply_xla.resize_plane_batch(dop, s))
        else:
            fn = app
    else:
        from jincresize_tpu import apply_xla

        dop = apply_xla.to_device(op)
        fn = jax.jit(lambda s: apply_xla.resize_plane_batch(dop, s))

    def run(x):
        return float(jnp.sum(fn(x)))

    t0 = time.time()
    run(src)
    print(f"# compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    if args.check:
        from jincresize_tpu.golden import apply_plane_numpy

        dev = np.asarray(fn(src[0], out_dtype=np.uint8, peak=255.0))
        ref = apply_plane_numpy(op, np.asarray(src[0]), out_dtype=np.uint8,
                                peak=255.0)
        diff = int(np.abs(dev.astype(int) - ref.astype(int)).max())
        print(f"# parity check vs host golden: max LSB diff = {diff}",
              file=sys.stderr)
        assert diff <= 1, f"parity violated: {diff} LSB"

    R = 4

    # Engines holding big device params (the seg applier's expanded weights)
    # must receive them as ARGUMENTS of the timing jit: wrapping the applier
    # call in an outer jit would re-capture them as program constants, which
    # the remote-compile transport rejects (HTTP 413).
    params = getattr(fn, "_params", None)
    if params is not None:
        inner = fn._apply

        @jax.jit
        def looped_p(p, s):
            def it(i, acc):
                return acc + jnp.sum(inner(p, s + i * jnp.float32(1e-9)))

            return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))

        run_loop = lambda: float(looped_p(params, src))
    else:

        @jax.jit
        def looped(s):
            def it(i, acc):
                return acc + jnp.sum(fn(s + i * jnp.float32(1e-9)))

            return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))

        run_loop = lambda: float(looped(src))

    run_loop()
    t0 = time.time()
    for _ in range(args.iters):
        run_loop()
    dt = (time.time() - t0) / (args.iters * R * args.frames)
    print(
        f"impl={args.impl} frames={args.frames}: {dt*1e3:.2f} ms/frame "
        f"({dw*dh/dt/1e9:.2f} Gpx/s device)"
    )


if __name__ == "__main__":
    main()
