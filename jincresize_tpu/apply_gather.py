"""General-geometry apply: Pallas gather interior + border strips.

The execution engine for aperiodic geometries (no phase plan): the interior
rectangle runs on kernels/pallas_gather.py (per-row class planes, banded
source DMA, pure fp32 VPU MACs); border strips — per-pixel blocks outside the
quantized interior (JincResize.cpp:431-451 unquantized border windows) — are
applied with the same im2col einsum the conv path uses, and the canvas is
assembled with one concatenate when the strips exactly frame the interior.

This is the TPU answer to the reference's geometry-agnostic SIMD loops
(resize_plane_avx512.cpp:9-135): where the CPU walks a per-pixel pointer
table, the TPU design splits the operator into a device-friendly class-plane
stream plus a compact horizontal im2col, keeping HBM traffic near the
fs x src-bytes floor instead of the fs^2 x expansion of the XLA fallback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .apply_conv import _strip_values_banded, strip_row_bands
from .apply_xla import finalize, to_device
from .operator import PlaneOperator

f32 = jnp.float32


class GatherApplier:
    """Aperiodic-geometry applier: Pallas gather interior, strip borders.

    Interface-compatible with apply_conv.ConvApplier: call with (H, W) or
    (F, H, W) sources, get finalized planes back. Raises ValueError when the
    geometry is outside the kernel envelope (caller falls back to XLA).
    """

    def __init__(self, op: PlaneOperator, interpret: bool = False):
        from .kernels import pallas_gather

        if not pallas_gather.is_supported(op):
            raise ValueError("GatherApplier: geometry outside kernel envelope")
        self.op = op
        self.interior = "gather"
        self.effective_precision = "fp32"  # pure fp32 VPU math, no MXU modes
        self._interior_fn = pallas_gather.make_gather_interior(
            op, interpret=interpret
        )
        self.tile_info = self._interior_fn.tile_info
        # The expanded class-plane table reaches ~GB for many-class
        # dictionaries (true aperiodic ratios) — a jit ARGUMENT, never a
        # closure constant (remote-compile HTTP 413; same rule as the seg
        # applier's weight params).
        self._params = self._interior_fn.wx
        self._dop = to_device(op)
        self._strip_bands = strip_row_bands(op)
        ylo, yhi, xlo, xhi = op.y_lo, op.y_hi, op.x_lo, op.x_hi
        H, W = op.dst_height, op.dst_width
        # Strips frame the interior exactly (builder emits top/bottom full
        # width + left/right interior rows) => single-concatenate assembly.
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
        self._concat = rects == expected and len(rects) == len(op.strips)
        self._jit = jax.jit(
            self._apply, static_argnames=("out_dtype", "peak", "float_clamp_min")
        )

    def _acc(self, wx, src_f):
        """(F, H, W) float32 -> (F, dst_h, dst_w) float32 accumulator."""
        op, dop = self.op, self._dop
        ylo, yhi, xlo, xhi = op.y_lo, op.y_hi, op.x_lo, op.x_hi
        H, W = op.dst_height, op.dst_width
        interior = self._interior_fn(src_f, wx)  # (F, nyi, nxi)
        by_rect = {
            (s.y0, s.y1, s.x0, s.x1): jax.vmap(
                lambda sf, s=s, b=self._strip_bands[
                    (s.y0, s.y1, s.x0, s.x1)
                ]: _strip_values_banded(dop, sf, s, *b)
            )(src_f)
            for s in dop.strips
        }
        if self._concat:
            mid = [
                by_rect.get((ylo, yhi, 0, xlo)),
                interior,
                by_rect.get((ylo, yhi, xhi, W)),
            ]
            mid = [m for m in mid if m is not None]
            mid = jnp.concatenate(mid, axis=2) if len(mid) > 1 else mid[0]
            rows = [
                by_rect.get((0, ylo, 0, W)),
                mid,
                by_rect.get((yhi, H, 0, W)),
            ]
            rows = [r for r in rows if r is not None]
            return jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]
        canvas = jnp.zeros((src_f.shape[0], H, W), dtype=f32)
        canvas = jax.lax.dynamic_update_slice(canvas, interior, (0, ylo, xlo))
        for (y0, y1, x0, x1), vals in by_rect.items():
            canvas = jax.lax.dynamic_update_slice(canvas, vals, (0, y0, x0))
        return canvas

    def _apply(
        self, wx, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        src_f = src.astype(f32)
        if float_clamp_min is not None:
            src_f = jnp.maximum(src_f, jnp.float32(float_clamp_min))
        squeeze = src_f.ndim == 2
        if squeeze:
            src_f = src_f[None]
        out = finalize(self._acc(wx, src_f), out_dtype, peak)
        return out[0] if squeeze else out

    def __call__(self, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return self._jit(
            self._params,
            src,
            out_dtype=out_dtype,
            peak=peak,
            float_clamp_min=float_clamp_min,
        )
