"""Segment-periodic conv apply: bit-parity MXU path for drifted geometries.

Pairs the segment-periodic planner (phase.plan_phases_seg) with the variant
fused kernel (kernels/pallas_fused_seg.py). This is the execution engine for
the parity default's most common real-world requests — non-integer rational
upscales (1.5x, 4/3, 2.5x ...) whose float32 position drift
(JincResize.cpp:524) breaks the exact periodicity the plain conv path
requires. r3 measured the cost of that gap at 1.5x 1080p tap8: 12.2 ms/frame
on the gather kernel vs 1.4 ms for the (non-parity f64) conv path; this
engine closes it AT parity.

Assembly mirrors the gather applier: the kernel computes the pattern-covered
interior rectangle; exception rows/columns (start-offset outliers + partial
trailing periods) are recomputed with the conv path's targeted subset
gathers; border strips use the shared per-pixel strip machinery; the canvas
is assembled with one concatenate when the strips frame the interior and no
exceptions exist, else paste + fixups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .apply_conv import (
    _cols_subset,
    _rows_subset,
    _strip_values_banded,
    strip_row_bands,
)
from .apply_xla import finalize, to_device
from .operator import PlaneOperator

f32 = jnp.float32


class SegConvApplier:
    """Drifted-geometry applier: segment-periodic fused interior.

    Interface-compatible with ConvApplier / GatherApplier: call with (H, W)
    or (F, H, W) sources and output dtype/peak/clamp. Raises ValueError when
    the geometry has no usable segment-periodic structure (caller falls back
    to the gather kernel).
    """

    def __init__(
        self, op: PlaneOperator, precision: str = "fp32", interpret: bool = False
    ):
        from .kernels import pallas_fused_seg
        from .phase import plan_phases_seg

        if precision not in ("fp32", "bf16", "fp32_u8src"):
            raise ValueError(f"SegConvApplier: unknown precision {precision!r}")
        plan = plan_phases_seg(op)
        if plan is None:
            raise ValueError("SegConvApplier: no segment-periodic structure")
        if not pallas_fused_seg.is_supported(op, plan):
            raise ValueError("SegConvApplier: geometry outside kernel envelope")
        self.op = op
        self.plan = plan
        self.interior = "fused-seg"
        # u8 sources use the IN-KERNEL weight 3-split (r5): exact for
        # bf16-exact sources at half the HIGHEST pass count. The r4 stacked
        # wsplit3 (3x weight tensor) lost to HIGHEST from DMA alone
        # (2.90 vs 2.63 ms/frame interior at 1.5x 1080p); splitting inside
        # the kernel keeps one resident tensor and only pays a small VPU
        # split per use — measured v5e 1440p->4K 1.5x tap8 full applier:
        # 3.37 (HIGHEST) -> 2.73 ms/frame at 1-LSB parity (3.4x the 9.22
        # ms gather baseline on the same geometry).
        import os

        kernel_prec = {
            "bf16": "default",
            "fp32_u8src": "wsplit3_vmem",
            "fp32": "highest",
        }[precision]
        if precision != "bf16" and os.environ.get("JINCRESIZE_SEG_DOT"):
            # Experimental override for the MXU dot pass count
            # ('high' = bf16_3x): measured on v5e at the 4K/1.5x parity
            # configs before any default change.
            kernel_prec = os.environ["JINCRESIZE_SEG_DOT"]
        self.precision = precision
        self.effective_precision = precision
        self._interior_fn = pallas_fused_seg.make_seg_interior(
            op, plan, precision=kernel_prec, interpret=interpret
        )
        self.tile_info = self._interior_fn.tile_info
        # Weight/select tensors are jit ARGUMENTS, not closure constants —
        # capture would embed ~0.5 GB into the compiled program (and the
        # remote-compile transport rejects such payloads with HTTP 413).
        self._params = self._interior_fn.params
        self._dop = to_device(op)
        self._strip_bands = strip_row_bands(op)
        self._exc_x = jnp.asarray(plan.x.exceptions.astype(np.int32))
        self._exc_y = jnp.asarray(plan.y.exceptions.astype(np.int32))
        # Single-concatenate assembly is valid when the strips exactly frame
        # the plan-covered interior and nothing needs a fixup overwrite.
        ylo, xlo, yhi, xhi = plan.y.lo, plan.x.lo, plan.y.hi, plan.x.hi
        H, W = op.dst_height, op.dst_width
        rects = {(s.y0, s.y1, s.x0, s.x1) for s in op.strips}
        expected = set()
        if ylo > 0:
            expected.add((0, ylo, 0, W))
        if yhi < H:
            expected.add((yhi, H, 0, W))
        if xlo > 0:
            expected.add((ylo, yhi, 0, xlo))
        if xhi < W:
            expected.add((ylo, yhi, xhi, W))
        self._concat = (
            rects == expected
            and len(rects) == len(op.strips)
            and len(plan.x.exceptions) == 0
            and len(plan.y.exceptions) == 0
        )
        self._jit = jax.jit(
            self._apply, static_argnames=("out_dtype", "peak", "float_clamp_min")
        )

    def _acc_frame(self, params, src_f):
        """(H, W) float32 -> (dst_h, dst_w) float32 accumulator."""
        op, dop, plan = self.op, self._dop, self.plan
        H, W = op.dst_height, op.dst_width
        ylo, xlo = plan.y.lo, plan.x.lo
        yhi, xhi = plan.y.hi, plan.x.hi
        interior = self._interior_fn(src_f, params)  # (yhi-ylo, xhi-xlo)
        strips = {
            (s.y0, s.y1, s.x0, s.x1): _strip_values_banded(
                dop, src_f, s, *self._strip_bands[(s.y0, s.y1, s.x0, s.x1)]
            )
            for s in dop.strips
        }
        if self._concat:
            # Strips frame the interior and there are no exceptions: one
            # concatenate, no canvas zeros + 5 full-plane update passes.
            mid = [
                strips.get((ylo, yhi, 0, xlo)),
                interior,
                strips.get((ylo, yhi, xhi, W)),
            ]
            mid = [m for m in mid if m is not None]
            mid = jnp.concatenate(mid, axis=1) if len(mid) > 1 else mid[0]
            rows = [
                strips.get((0, ylo, 0, W)),
                mid,
                strips.get((yhi, H, 0, W)),
            ]
            rows = [r for r in rows if r is not None]
            return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
        canvas = jnp.zeros((H, W), dtype=f32)
        canvas = jax.lax.dynamic_update_slice(canvas, interior, (ylo, xlo))
        # Exceptions: start-offset outliers + trailing partial periods. Same
        # precedence as apply_conv._assemble: columns then rows then strips.
        if self._exc_x.shape[0]:
            vals = _cols_subset(dop, src_f, self._exc_x)
            canvas = canvas.at[:, self._exc_x].set(vals)
        if self._exc_y.shape[0]:
            vals = _rows_subset(dop, src_f, self._exc_y)
            canvas = canvas.at[self._exc_y, :].set(vals)
        for s in dop.strips:
            vals = strips[(s.y0, s.y1, s.x0, s.x1)]
            canvas = jax.lax.dynamic_update_slice(canvas, vals, (s.y0, s.x0))
        return canvas

    def _apply(
        self, params, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        src_f = src.astype(f32)
        if float_clamp_min is not None:
            src_f = jnp.maximum(src_f, jnp.float32(float_clamp_min))
        if src_f.ndim == 2:
            return finalize(self._acc_frame(params, src_f), out_dtype, peak)
        return finalize(
            jax.vmap(lambda s: self._acc_frame(params, s))(src_f),
            out_dtype,
            peak,
        )

    def __call__(self, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return self._jit(
            self._params,
            src,
            out_dtype=out_dtype,
            peak=peak,
            float_clamp_min=float_clamp_min,
        )
