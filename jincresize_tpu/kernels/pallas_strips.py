"""Pallas kernel for full-width border strips (top/bottom rows).

The reference builds border pixels from RAW (unquantized) positions with
clamped windows (JincResize.cpp:431-451), so the operator stores per-pixel
strip blocks — ~440 MB at 8K, and the einsum strip apply is HBM-bound on
reading them (~3.5 ms/frame measured, half the whole resample).

Structural fact this kernel exploits: ``start_x`` (and the x position stream)
is independent of the destination row, so a strip row's blocks repeat with
the interior's column phase pattern. The kernel verification is EXACT: at
build time every interior column's block is compared bitwise against its
phase anchor; columns that deviate (float-drift exceptions, partial trailing
periods) plus the clamped corner columns are excluded and patched by the
per-pixel path. When the check holds, the strip apply reads only the
``fs``-row source bands + ~17*px anchor blocks instead of 440 MB.

One pallas_call computes both strips: grid over column tiles; per tile the
top/bottom source bands are staged, horizontal taps are packed along K
(as in pallas_fused), and each strip is a (ny, K) x (K, TNb) banded matmul
per column phase.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..operator import BorderStrip, PlaneOperator
from ..phase import PhasePlan

f32 = jnp.float32
SUB = 8
LANE = 128
TNB = int(os.environ.get("JINCRESIZE_STRIPS_TNB", "128"))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _anchor_blocks(
    s: BorderStrip, plan_x, fs: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Per-(row, phase) anchor blocks + exact exception column set.

    Returns (anchors[ny, px, fs, fs], exc_cols absolute) or None when the
    pattern covers too little of the strip.
    """
    lo, hi, px = plan_x.lo, plan_x.hi, plan_x.p
    B = s.blocks  # (ny, nx, fs, fs)
    ny = B.shape[0]
    anchors = np.zeros((ny, px, fs, fs), dtype=np.float32)
    plan_exc = set(int(v) for v in plan_x.exceptions)
    exc = []
    # Pick anchors from the first non-exception occurrence of each phase.
    for r in range(px):
        col = None
        for k in range((hi - lo) // px):
            c = lo + k * px + r
            if c not in plan_exc:
                col = c
                break
        if col is None:
            return None
        anchors[:, r] = B[:, col - s.x0]
    # Exact bitwise verification over the pattern-covered interior columns.
    cols = np.arange(lo, hi)
    ph = (cols - lo) % px
    for r in range(px):
        sel = cols[ph == r]
        eq = (B[:, sel - s.x0] == anchors[:, r][:, None]).all(axis=(0, 2, 3))
        exc.extend(int(c) for c in sel[~eq])
    exc.extend(c for c in plan_exc if lo <= c < hi)
    if len(exc) > (hi - lo) // 4:
        return None  # pattern mostly broken: fall back entirely
    return anchors, np.asarray(sorted(set(exc)), dtype=np.int64)


def _strips_kernel(
    w_ref,  # (n_strips, px, n_d, ny_p, Kp)
    *refs,
    ry0s: tuple,
    col0: tuple,  # per-rx ABSOLUTE base column (base_x + offs_x[rx])
    packs: tuple,
    fs_p: int,
    px: int,
    qx: int,
    tnb: int,
    ny_p: int,
    precision,
):
    n_strips = len(ry0s)
    src_refs = refs[:n_strips]  # each (qx, hb, wq) residue planes
    out_ref = refs[n_strips]
    colp_ref = refs[n_strips + 1]

    tno = tnb * px
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 1)

    for si in range(n_strips):
        sref = src_refs[si]
        ry0 = ry0s[si]

        def seg(c0):
            # Column c0 + qx*tnb*j + qx*k, k<tnb: residue plane c0 % qx;
            # the per-tile shift tnb*j is in the window's Element offset, so
            # the in-window slice start c0//qx is static (dynamic lane-start
            # slices crash this Mosaic version).
            r, base = c0 % qx, c0 // qx
            return sref[r, ry0 : ry0 + fs_p, base : base + tnb]

        groups: dict[int, list[int]] = {}
        for rx in range(px):
            groups.setdefault(col0[rx], []).append(rx)
        accs = [jnp.zeros((ny_p, tnb), dtype=f32) for _ in range(px)]
        for c0, rxs in groups.items():
            for d, taps in enumerate(packs):
                if len(taps) == 1:
                    colp = seg(c0 + taps[0])
                else:
                    for t, lx in enumerate(taps):
                        colp_ref[d, t * fs_p : (t + 1) * fs_p, :] = seg(c0 + lx)
                    colp = colp_ref[d, : len(taps) * fs_p, :]
                for rx in rxs:
                    accs[rx] = accs[rx] + jax.lax.dot_general(
                        w_ref[si, rx, d][:, : len(taps) * fs_p],
                        colp,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=precision,
                        preferred_element_type=f32,
                    )
        if px == 1:
            out = accs[0]
        else:
            out = jnp.zeros((ny_p, tno), dtype=f32)
            for rx in range(px):
                e = (cols_i == px * rows_i + rx).astype(f32)
                out = out + jax.lax.dot_general(
                    accs[rx],
                    e,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f32,
                )
        out_ref[si * ny_p : (si + 1) * ny_p, :] = out


def make_strips_interior(
    op: PlaneOperator,
    plan: PhasePlan,
    precision: str = "highest",
    interpret: bool = False,
):
    """Build the top/bottom strip kernel.

    Returns None if no full-width strip qualifies, else
    ``(fn, patches)`` where ``fn(src_f) -> (n_strips*ny_p, px*nxb)`` computes
    the pattern-covered strip values in dst layout (paste at column
    ``plan.x.lo``; strip si rows at ``[si*ny_p, si*ny_p + ny_si)``), and
    ``patches`` is a list of (strip, exc_cols) whose columns (corners +
    verified exceptions) the caller must recompute per-pixel.
    """
    fs = op.filter_size
    px, qx = plan.x.p, plan.x.q
    # Wide-phase/-tap envelope (measured r3, real v5e): the kernel's per-step
    # output is px*TNB lanes and its unrolled per-phase temporaries scale
    # with px AND the padded tap height fs_p — px=8/fs=9 (fs_p=16, px*fs_p
    # = 128) scoped-VMEM-OOMs at compile (17.77M vs the 16M stack limit);
    # px=5/fs=17 (fs_p=24, px*fs_p = 120) compiles and is 1-LSB correct.
    # Gate on the product so tall-tap corners (e.g. px=5 with fs near the
    # fs*fs<=1200 bound) decline too, not just wide-phase ones; shrinking
    # TNB below LANE is not an option (lane alignment), so anything past the
    # measured-safe envelope falls back to the XLA strips path (None).
    if px * _round_up(fs, SUB) > 120:
        return None
    nxb = plan.x.nblocks
    offs_x = plan.x.offsets.astype(int)
    spread_x = int(offs_x.max())
    base_x = plan.x.base
    xlo = plan.x.lo
    src_h = op.src_height

    strips = [
        s
        for s in op.strips
        if s.x0 == 0 and s.x1 == op.dst_width and (s.y1 - s.y0) > 0
    ]
    if not strips:
        return None

    entries = []  # (strip, anchors, exc_cols, const_row)
    for s in strips:
        # Constant window row: verified via start_y over the strip rows.
        sy = op.start_y[s.y0 : s.y1]
        if not (sy == sy[0]).all():
            return None
        r = _anchor_blocks(s, plan.x, fs)
        if r is None:
            return None
        anchors, exc = r
        entries.append((s, anchors, exc, int(sy[0])))

    n_strips = len(entries)
    ny_p = _round_up(max(s.y1 - s.y0 for s, *_ in entries), SUB)
    fs_p = _round_up(fs, SUB)
    g = max(1, LANE // fs_p)
    packs = tuple(
        tuple(range(d * g, min((d + 1) * g, fs))) for d in range(-(-fs // g))
    )
    n_d = len(packs)
    kp = g * fs_p
    tnb = TNB
    tno = px * tnb
    nt = -(-nxb // tnb)

    # Sources arrive as qx residue planes (deinterleaved in XLA) so the
    # in-kernel strided column windows are lane-contiguous slices — Mosaic
    # cannot lower lane-strided slices (same fix as pallas_fused). Each tile
    # j reads window columns [tnb*j, tnb*j + wq_t) of the residue planes;
    # the per-tap offsets inside the window are static.
    off_max = (base_x + spread_x + fs - 1) // qx
    wq_t = _round_up(off_max + tnb, LANE)
    wq = tnb * (nt - 1) + wq_t

    # Weights: w[si, rx, d, m, t*fs_p + ly] = anchor[m, rx][ly, lx].
    w = np.zeros((n_strips, px, n_d, ny_p, kp), dtype=np.float32)
    for si, (s, anchors, _exc, _cy) in enumerate(entries):
        ny = s.y1 - s.y0
        for rx in range(px):
            for m in range(ny):
                for d, taps in enumerate(packs):
                    for t, lx in enumerate(taps):
                        w[si, rx, d, m, t * fs_p : t * fs_p + fs] = anchors[
                            m, rx
                        ][:, lx]
    w_dev = jnp.asarray(w)

    hb = fs_p + SUB
    ry0s = []
    src_specs = []
    ext_y = 0
    for s, _a, _e, cy in entries:
        ay = cy // SUB * SUB
        ry0s.append(cy - ay)
        ext_y = max(ext_y, ay + hb)
        src_specs.append(
            pl.BlockSpec(
                (pl.Element(qx), pl.Element(hb), pl.Element(wq_t)),
                functools.partial(lambda j, ay=ay: (0, ay, tnb * j)),
            )
        )

    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    col0 = tuple(base_x + int(offs_x[rx]) for rx in range(px))
    kern = functools.partial(
        _strips_kernel,
        ry0s=tuple(ry0s),
        col0=col0,
        packs=packs,
        fs_p=fs_p,
        px=px,
        qx=qx,
        tnb=tnb,
        ny_p=ny_p,
        precision=prec,
    )
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_strips * ny_p, nt * tno), f32),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((n_strips, px, n_d, ny_p, kp), lambda j: (0,) * 5)
        ]
        + src_specs,
        out_specs=pl.BlockSpec((n_strips * ny_p, tno), lambda j: (0, j)),
        scratch_shapes=[pltpu.VMEM((n_d, kp, tnb), f32)],
        interpret=interpret,
    )

    def fn(src_f, residue=None):
        # ``residue``: optional shared pre-built residue planes (qx, Hp, wqs)
        # with Hp >= ext_y, wqs >= wq (see pallas_fused.residue_planes).
        if residue is None:
            from .pallas_fused import residue_planes

            residue = residue_planes(src_f, qx, wq, ext_y)
        out = call(w_dev, *([residue] * n_strips))
        return out[:, : px * nxb]

    fn.residue_spec = (qx, wq, ext_y)

    patches = []
    for si, (s, _a, exc, _cy) in enumerate(entries):
        # Corner columns + verified exceptions -> per-pixel recompute.
        cols = sorted(
            set(range(0, xlo))
            | set(range(xlo + px * nxb, op.dst_width))
            | set(int(c) for c in exc)
        )
        patches.append((s, np.asarray(cols, dtype=np.int64)))
    meta = {
        "strips": [(s.y0, s.y1) for s, *_ in entries],
        "ny_p": ny_p,
        "xlo": xlo,
        "width": px * nxb,
    }
    return fn, patches, meta
