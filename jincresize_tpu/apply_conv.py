"""Phase-decomposed convolution apply: the MXU-native fast path.

For periodic geometry (phase.py), the interior resampling is exactly a
strided VALID cross-correlation: every (row-phase, column-phase) pair owns
one (fs, fs) coefficient block. The interior engine is selectable: the fused
Pallas banded-matmul kernel (kernels/pallas_fused.py — the TPU default), or
an XLA shift-sum of identical math (unrolled shifted strided slices x scalar
weights, used on non-TPU backends and for geometries outside the kernel's
envelope). Exception rows/columns (float32 position drift) and border strips
are patched with small targeted computations; when the strips exactly frame
the interior, the canvas is assembled with a single concatenate.

This is the TPU-native answer to the reference's SIMD gather loops
(resize_plane_avx512.cpp et al.): where the CPU design minimizes per-pixel
work via deduplicated table reads from L2, the TPU design reshapes the same
deduplicated operator into dense banded matmuls that the systolic array
consumes at full tilt (SURVEY.md §7 "hard parts": gather irregularity).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .apply_xla import DevicePlaneOperator, finalize, to_device
from .operator import PlaneOperator
from .phase import PhasePlan, build_conv_kernels, plan_phases

f32 = jnp.float32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kernels", "dop", "exc_x", "exc_y"],
    meta_fields=["meta", "phase_offsets"],
)
@dataclass(frozen=True)
class ConvOperator:
    """Device-resident phase-conv operator (kernels + fixup metadata)."""

    kernels: jax.Array  # (py*px, 1, Kh, Kw) float32
    dop: DevicePlaneOperator
    exc_x: jax.Array  # (mx,) int32 exception columns (may be empty)
    exc_y: jax.Array  # (my,) int32 exception rows
    meta: tuple  # static geometry tuple — see build_conv_operator
    phase_offsets: tuple = ()  # static ((oy, ox), ...) per phase channel


def build_conv_operator(
    op: PlaneOperator, plan: PhasePlan | None = None
) -> ConvOperator | None:
    """Compile a PlaneOperator into its phase-conv form; None if aperiodic."""
    if plan is None:
        plan = plan_phases(op)
    if plan is None:
        return None
    K = build_conv_kernels(op, plan)
    Kh, Kw = K.shape[2], K.shape[3]
    meta = (
        plan.y.lo,
        plan.x.lo,
        plan.y.p,
        plan.x.p,
        plan.y.q,
        plan.x.q,
        plan.y.base,
        plan.x.base,
        plan.y.nblocks,
        plan.x.nblocks,
        Kh,
        Kw,
    )
    offs_y = plan.y.offsets
    offs_x = plan.x.offsets
    phase_offsets = tuple(
        (int(offs_y[ry]), int(offs_x[rx]))
        for ry in range(plan.y.p)
        for rx in range(plan.x.p)
    )
    return ConvOperator(
        kernels=jnp.asarray(K),
        dop=to_device(op),
        exc_x=jnp.asarray(plan.x.exceptions.astype(np.int32)),
        exc_y=jnp.asarray(plan.y.exceptions.astype(np.int32)),
        meta=meta,
        phase_offsets=phase_offsets,
    )


# ---------------------------------------------------------------------------
# Fixup computations (exceptions + strips): small targeted gathers.
#
# Precision note (r4, measured): these einsums contract a tiny tap dimension
# with large batch/free dims, which XLA lowers to exact-f32 VPU
# multiply-reduce, NOT an MXU dot — fp32 parity holds at DEFAULT precision
# (tpu_smoke's fp32 cases measure ~5e-7 absolute). Forcing HIGHEST here cost
# 5% of the 4K headline for no parity gain. The one einsum that DOES need
# HIGHEST is the seg engine's weight expansion (pallas_fused_seg._expand_w):
# its large free dims make XLA pick a real MXU dot, whose DEFAULT mode
# rounds the f32 weight operands to bf16 (measured 2-LSB output corruption).
# ---------------------------------------------------------------------------


def _cols_subset(dop: DevicePlaneOperator, src_f, sel) -> jax.Array:
    """Recompute a subset of destination columns (all rows): (dst_h, m)."""
    fs = dop.filter_size
    H, W = src_f.shape
    taps = jnp.arange(fs, dtype=jnp.int32)
    cols = jnp.clip(dop.start_x[sel][:, None] + taps[None, :], 0, W - 1)
    P = src_f[:, cols]  # (H, m, fs)
    cxs = dop.cx_idx[sel]
    acc = jnp.zeros((dop.dst_height, sel.shape[0]), dtype=f32)
    for ly in range(fs):
        rows = jnp.clip(dop.start_y + ly, 0, H - 1)
        Prow = P[rows]  # (dst_h, m, fs)
        panex = dop.pair_blocks[:, cxs, ly, :]  # (n_uy, m, fs)
        Wrow = panex[dop.cy_idx]  # (dst_h, m, fs)
        acc = acc + jnp.einsum("ymk,ymk->ym", Prow, Wrow, preferred_element_type=f32)
    return acc


def _rows_subset(dop: DevicePlaneOperator, src_f, sel) -> jax.Array:
    """Recompute a subset of destination rows (all columns): (m, dst_w)."""
    fs = dop.filter_size
    H, W = src_f.shape
    m = sel.shape[0]
    taps = jnp.arange(fs, dtype=jnp.int32)
    rows_n = jnp.clip(dop.start_y[sel][:, None] + taps[None, :], 0, H - 1)
    S = src_f[rows_n.reshape(-1)]  # (m*fs, W)
    cols = jnp.clip(dop.start_x[:, None] + taps[None, :], 0, W - 1)
    P = S[:, cols].reshape(m, fs, dop.dst_width, fs)  # (m, k, w, l)
    pane_sel = dop.pair_blocks[dop.cy_idx[sel]]  # (m, n_ux, fs, fs)
    Wm = pane_sel[:, dop.cx_idx]  # (m, w, fs, fs)
    return jnp.einsum("mkwl,mwkl->mw", P, Wm, preferred_element_type=f32)


def _strip_values(dop: DevicePlaneOperator, src_f, s) -> jax.Array:
    """Per-pixel border strip apply: (ny, nx) via one im2col + einsum."""
    fs = dop.filter_size
    H, W = src_f.shape
    taps = jnp.arange(fs, dtype=jnp.int32)
    cols = jnp.clip(dop.start_x[s.x0 : s.x1][:, None] + taps[None, :], 0, W - 1)
    P = src_f[:, cols]  # (H, nx, fs)
    rows = jnp.clip(dop.start_y[s.y0 : s.y1][:, None] + taps[None, :], 0, H - 1)
    G = P[rows]  # (ny, k, nx, l)
    return jnp.einsum("ykxl,yxkl->yx", G, s.blocks, preferred_element_type=f32)


def _strip_values_banded(
    dop: DevicePlaneOperator,
    src_f,
    s,
    y_min: int,
    band_h: int,
    const_sy: bool = False,
) -> jax.Array:
    """_strip_values over a statically-sliced source row band.

    The plain form's horizontal im2col ``src_f[:, cols]`` materializes a
    (src_h, nx, fs) gather — ~200 MB per full-width strip at 1080p-class
    sizes — although a strip's windows touch only ~fs+span rows. Static
    (y_min, band_h) come from the HOST operator's start_y (appliers compute
    them at init); the gather shrinks by src_h/band_h (~50x), which took the
    seg applier's measured non-interior overhead from ~5.9 ms/frame to the
    noise floor at 1.5x 1080p tap8.
    """
    fs = dop.filter_size
    H, W = src_f.shape
    band_h = min(band_h, H - y_min)
    band = jax.lax.slice(src_f, (y_min, 0), (y_min + band_h, W))
    # Window-slice im2col instead of a per-element gather: builder-clamped
    # window begins satisfy 0 <= start <= size-fs, so each column window is
    # one in-bounds (band_h, fs) slice. vmap-of-dynamic_slice lowers to a
    # gather with (band_h, fs) slice sizes — bulk rows instead of the
    # per-element lane gather that measured 3.4 ms/frame across the four
    # strips at 1.5x 1080p tap8 (~1 element/cycle on the VPU).
    P = jax.vmap(
        lambda c0: jax.lax.dynamic_slice(band, (0, c0), (band_h, fs)),
        out_axes=1,
    )(dop.start_x[s.x0 : s.x1])  # (band_h, nx, fs)
    if const_sy:
        # Every strip row shares one window start (always true for the
        # clamped top/bottom border strips: begins pin at 0 / src_h-fs) —
        # the vertical tap pick is a static slice, not a gather.
        return jnp.einsum(
            "kxl,yxkl->yx",
            jax.lax.slice(P, (0, 0, 0), (fs,) + P.shape[1:]),
            s.blocks,
            preferred_element_type=f32,
        )
    nx = s.x1 - s.x0
    P2 = P.reshape(band_h, nx * fs)
    G = jax.vmap(
        lambda r0: jax.lax.dynamic_slice(P2, (r0, 0), (fs, nx * fs))
    )(dop.start_y[s.y0 : s.y1] - y_min)
    G = G.reshape(s.y1 - s.y0, fs, nx, fs)
    return jnp.einsum("ykxl,yxkl->yx", G, s.blocks, preferred_element_type=f32)


def strip_row_bands(op: PlaneOperator) -> dict:
    """Static (y_min, band_h, const_sy) per strip rect, from host start_y."""
    import numpy as np

    fs = op.filter_size
    # _strip_values_banded's static (band_h, fs) dynamic_slice windows assume
    # builder-clamped begins with 0 <= start <= size-fs, which requires
    # src >= filter_size per axis. Such geometries currently have no interior
    # (gather/seg appliers decline first), but enforce the precondition where
    # it is assumed rather than failing at trace time (ADVICE r4).
    if op.src_height < fs or op.src_width < fs:
        raise ValueError(
            f"strip_row_bands: source {op.src_width}x{op.src_height} smaller "
            f"than filter_size {fs} — window slices would be out of bounds"
        )
    out = {}
    for s in op.strips:
        sy = np.asarray(op.start_y[s.y0 : s.y1], dtype=np.int64)
        y_min = int(sy.min())
        out[(s.y0, s.y1, s.x0, s.x1)] = (
            y_min,
            int(sy.max()) - y_min + fs,
            bool((sy == sy[0]).all()),
        )
    return out


def apply_strips(dop: DevicePlaneOperator, src_f, canvas) -> jax.Array:
    for s in dop.strips:
        vals = _strip_values(dop, src_f, s)
        canvas = jax.lax.dynamic_update_slice(canvas, vals, (s.y0, s.x0))
    return canvas


def _strip_cols_patch(src_f, sy_const: int, fs: int, cols_sx, blocks_sel):
    """Per-pixel strip values for selected columns: (ny, m).

    ``cols_sx`` (m,) are the columns' window starts; ``blocks_sel``
    (ny, m, fs, fs) their per-pixel blocks (corners + verified exceptions of
    the Pallas strip kernel, kernels/pallas_strips.py).
    """
    W = src_f.shape[1]
    taps = jnp.arange(fs, dtype=jnp.int32)
    band = jax.lax.slice(src_f, (sy_const, 0), (sy_const + fs, W))
    cidx = jnp.clip(cols_sx[:, None] + taps[None, :], 0, W - 1)  # (m, fs)
    P = band[:, cidx]  # (fs, m, fs)
    return jnp.einsum("kml,ymkl->ym", P, blocks_sel, preferred_element_type=f32)


# ---------------------------------------------------------------------------
# Full conv apply.
# ---------------------------------------------------------------------------


def _assemble(
    cop: ConvOperator,
    conv: jax.Array,
    src_f: jax.Array,
    strips_fn=None,
    interior_layout: str = "phase",
) -> jax.Array:
    """Scatter phase-channel interior + exception fixups + strips -> canvas.

    ``interior_layout='phase'`` takes (py*px, nyb, nxb) phase planes and
    interleaves them (an XLA transpose — expensive at 8K); ``'dst'`` takes a
    (py*nyb, px*nxb) block already in destination layout (the fused kernel's
    output) and pastes it directly.
    """
    dop = cop.dop
    (ylo, xlo, py, px, qy, qx, base_y, base_x, nyb, nxb, Kh, Kw) = cop.meta
    if interior_layout == "dst":
        block = conv
    else:
        block = (
            conv.reshape(py, px, nyb, nxb)
            .transpose(2, 0, 3, 1)
            .reshape(py * nyb, px * nxb)
        )
    canvas = jnp.zeros((dop.dst_height, dop.dst_width), dtype=f32)
    canvas = jax.lax.dynamic_update_slice(canvas, block, (ylo, xlo))

    # Exception fixups (float32 drift deviations + partial trailing periods).
    if cop.exc_x.shape[0]:
        vals = _cols_subset(dop, src_f, cop.exc_x)
        canvas = canvas.at[:, cop.exc_x].set(vals)
    if cop.exc_y.shape[0]:
        vals = _rows_subset(dop, src_f, cop.exc_y)
        canvas = canvas.at[cop.exc_y, :].set(vals)

    # Border strips.
    if strips_fn is not None:
        canvas = strips_fn(dop, src_f, canvas)
    else:
        canvas = apply_strips(dop, src_f, canvas)
    return canvas


def _shift_sum_scan(lhs_g, Kg, qy, qx, nyb, nxb):
    """Scan-form shift-sum for large tap counts (r5, VERDICT r4 weak #5).

    The unrolled form emits Kh*Kw slice+FMA HLO ops — 4225 at tap16
    downscales (fs=65), which the TPU compiler cannot digest (the remote
    compile helper is SIGKILLed and an 8-frame vmap plans 62 GB of temps).
    Decompose taps by source residue instead: taps (a, b) with a = qy*ah+ar,
    b = qx*bh+br all read the SAME (ar, br) strided residue plane at integer
    offsets (ah, bh), so a ``lax.scan`` over ah with a bh-unrolled body
    keeps the program at O(qy*qx + fb) ops with identical f32 math (the
    accumulation order over taps is row-major per residue group — an
    accumulation-order difference of the same class as the reference's own
    C-vs-SIMD paths).

    ``lhs_g``: the offset-adjusted source window; ``Kg``: (nphase, fa, fb)
    tap weights.
    """
    nph, fa, fb = Kg.shape
    acc = jnp.zeros((nph, nyb, nxb), dtype=f32)
    for ar in range(qy):
        for br in range(qx):
            Kr = Kg[:, ar::qy, br::qx]  # (nph, na, nb)
            na, nb = Kr.shape[1], Kr.shape[2]
            if na == 0 or nb == 0:
                continue
            plane = lhs_g[ar::qy, br::qx]
            need_h = nyb + na - 1 - plane.shape[0]
            need_w = nxb + nb - 1 - plane.shape[1]
            if need_h > 0 or need_w > 0:
                plane = jnp.pad(
                    plane, ((0, max(0, need_h)), (0, max(0, need_w)))
                )
            Krt = jnp.moveaxis(Kr, 1, 0)  # (na, nph, nb)

            def body(acc_c, xs, _plane=plane, _nb=nb):
                k_row, ah = xs
                a = acc_c
                for bh in range(_nb):
                    win = jax.lax.dynamic_slice(
                        _plane, (ah, bh), (nyb, nxb)
                    )
                    a = a + k_row[:, bh][:, None, None] * win[None]
                return a, None

            acc, _ = jax.lax.scan(
                body, acc, (Krt, jnp.arange(na, dtype=jnp.int32))
            )
    return acc


def _shift_sum_mxu(lhs_g, Kg, qy, qx, nyb, nxb):
    """Channelized MXU form of the deep-tap interior (r5).

    The scan-form shift-sum streams Kh*Kw strided-slice+FMA passes over the
    destination plane on the VPU — correct at any tap count, but 67.9
    ms/frame at tap16 4K->1080p (fs=65, 4225 taps, 8-frame batch, v5e). This
    form routes the same math through the MXU: the fs^2 MACs factor as ONE
    matmul over the horizontal taps with the vertical taps as output
    channels, plus a diagonal row-shift sum:

      R[rx][h, u]    = lhs[h, qx*u + rx]               (qx residue planes,
                                                        built once/frame)
      S[h, x, (rx,qb)] = R[rx][h, x + qb]              (contiguous lane
                                                        slices per tile)
      C[p, a, h, x]  = sum_b Kb[p, a, b] * S[h, x, b]  (the matmul: M = h*x,
                                                        K = fb, N = nph*fa)
      conv[p, y, x]  = sum_a C[p, a, y*qy + a, x]      (fa strided-row adds)

    Destination tiles (both axes) ride a ``lax.map`` so the S/C temporaries
    stay bounded under the frame vmap (they are alive for every frame of the
    batch at once — ~24 MB/frame/tile keeps a 32-frame 4K batch under
    ~1.5 GB of transients). The contraction runs at HIGHEST precision
    (6-pass bf16, fp32-exact dots), keeping the result in the reference's
    own C-vs-SIMD accumulation-order tolerance class
    (/root/reference/src/JincResize.cpp:536-601 vs the SIMD kernels).

    Measured v5e, tap16 4K->1080p fp32, 8-frame batch (ms/batch):
      * scan-form shift-sum baseline:                 543.2  (67.9 ms/frame)
      * naive im2col (lane-STRIDED tile slices):      797.8  — strided lane
        slices lower to gather-class shuffle loops; the residue-plane
        deinterleave (two contiguous passes/frame) is what makes S cheap
      * THIS form (residue planes + strided diagonal): 161.2  (20.2 ms/frame)
      * + de-strided diagonal (C row residues/tile):   202.8  — negative:
        two extra strided passes over C per tile cost more than 65 small
        sublane-strided slices
      * full 2-D residue grouping (vertical taps split by residue, halving
        the channel matmul MACs):                      286.8  — negative:
        doubled slice count + halved matmul N utilization beat the MAC win
      * tx=256 column tiles:                           313.0  — negative
    3.4x over the scan form; the remaining gap to the ~6 ms HBM floor is
    the S/C im2col traffic (fb-fold expansion), inherent to the XLA-level
    formulation — a VMEM-staged Pallas variant is the next lever (see the
    fused-kernel compile-cost note in ROADMAP 22).
    """
    nph, fa, fb = Kg.shape
    budget = int(os.environ.get("JINCRESIZE_MXU_SHIFT_BYTES", 24 * 1024 * 1024))
    tx = int(os.environ.get("JINCRESIZE_MXU_SHIFT_TX", 128))  # lane-aligned
    per_row = 4 * tx * (fb + nph * fa)  # S + C bytes per staged source row
    eh_t = max(fa + qy, budget // per_row)
    ty = max(8, (eh_t - fa) // qy + 1)
    ty = min(ty, nyb)
    eh_t = (ty - 1) * qy + fa
    nty = -(-nyb // ty)
    ntx = -(-nxb // tx)
    eh_pad = (nty * ty - 1) * qy + fa
    ew_pad = (ntx * tx - 1) * qx + fb
    need_h = eh_pad - lhs_g.shape[0]
    need_w = ew_pad - lhs_g.shape[1]
    if need_h > 0 or need_w > 0:
        lhs_g = jnp.pad(lhs_g, ((0, max(0, need_h)), (0, max(0, need_w))))

    # Horizontal residue planes: tap b reads plane b % qx at column offset
    # b // qx, so Kg's tap columns are permuted to (rx, qb) order to match
    # the concatenated S layout.
    nb_r = [len(range(rx, fb, qx)) for rx in range(qx)]
    mb = max(nb_r)
    wr = ntx * tx + mb
    R = jnp.stack(
        [
            jnp.pad(p, ((0, 0), (0, wr - p.shape[1])))
            for rx in range(qx)
            for p in (lhs_g[:, rx::qx],)
        ]
    )  # (qx, eh_pad, wr)
    border = np.concatenate(
        [np.arange(rx, fb, qx) for rx in range(qx)]
    )  # tap order of the concatenated S (static permutation)
    Kb = Kg[:, :, jnp.asarray(border)]

    def tile(t):
        iy, ix = t // ntx, t % ntx
        R_t = jax.lax.dynamic_slice(
            R, (0, iy * ty * qy, ix * tx), (qx, eh_t, tx + mb)
        )
        S = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jax.lax.slice(R_t[rx], (0, qb), (eh_t, qb + tx))
                        for qb in range(nb_r[rx])
                    ],
                    axis=-1,
                )
                for rx in range(qx)
                if nb_r[rx]
            ],
            axis=-1,
        )  # (eh_t, tx, fb) in (rx, qb) tap order
        C = jnp.einsum(
            "pab,hxb->pahx", Kb, S, precision=jax.lax.Precision.HIGHEST
        )  # (nph, fa, eh_t, tx)
        acc = jnp.zeros((nph, ty, tx), dtype=f32)
        for a in range(fa):
            acc = acc + jax.lax.slice(
                C,
                (0, a, a, 0),
                (nph, a + 1, a + (ty - 1) * qy + 1, tx),
                (1, 1, qy, 1),
            )[:, 0]
        return acc

    tiles = jax.lax.map(tile, jnp.arange(nty * ntx, dtype=jnp.int32))
    # (nty*ntx, nph, ty, tx) -> (nph, nty*ty, ntx*tx) -> crop
    conv = (
        tiles.reshape(nty, ntx, nph, ty, tx)
        .transpose(2, 0, 3, 1, 4)
        .reshape(nph, nty * ty, ntx * tx)
    )
    return conv[:, :nyb, :nxb]


def _shift_sum_deep(lhs_g, Kg, qy, qx, nyb, nxb):
    """Deep-tap interior dispatch: MXU channelized form on TPU, scan on CPU.

    ``JINCRESIZE_DEEP_SHIFT={mxu,scan}`` forces either (tests compare both)."""
    import jax as _jax

    mode = os.environ.get("JINCRESIZE_DEEP_SHIFT")
    if mode is None:
        mode = "mxu" if _jax.default_backend() == "tpu" else "scan"
    if mode == "mxu":
        return _shift_sum_mxu(lhs_g, Kg, qy, qx, nyb, nxb)
    return _shift_sum_scan(lhs_g, Kg, qy, qx, nyb, nxb)


# Past this many taps the unrolled shift-sum is replaced by the
# channelized-MXU / scan forms. Originally 2048 (the unrolled HLO breaks the
# TPU compiler past ~4225 taps); lowered to 1200 in r5 on measurement: at
# fs=41 (tap10 2x downscale, 1681 taps) the unrolled form compiles in 202 s
# and runs 844 ms/frame at 4K on v5e, vs 8 s / 15.6 ms/frame for the MXU
# channelized form — aligned with the fused kernel's phase-conv boundary so
# the unrolled form only serves the small-support regime it is good at.
SHIFT_UNROLL_MAX = int(os.environ.get("JINCRESIZE_SHIFT_UNROLL_MAX", 1200))


def apply_plane_conv(
    cop: ConvOperator,
    src: jax.Array,
    float_clamp_min: float | None = None,
    strips_fn=None,
) -> jax.Array:
    """Resample one plane via the phase conv + fixups: float32 accumulator."""
    dop = cop.dop
    (ylo, xlo, py, px, qy, qx, base_y, base_x, nyb, nxb, Kh, Kw) = cop.meta
    H, W = src.shape
    src_f = src.astype(f32)
    if float_clamp_min is not None:
        src_f = jnp.maximum(src_f, jnp.float32(float_clamp_min))

    # Interior: phase-decomposed strided correlation. Implemented as an
    # unrolled shift-sum rather than lax.conv: XLA lowers a 1-channel few-phase
    # conv to a <5%-utilized MXU GEMM (measured 55ms for 668 MMAC at 1080p),
    # while Kh*Kw strided slices + scalar-weight FMAs fuse into pure VPU code
    # with zero gathers. Each tap (a, b) contributes K[:, a, b] times the same
    # strided window slice to every phase channel.
    eh = (nyb - 1) * qy + Kh
    ew = (nxb - 1) * qx + Kw
    pad_h = max(0, base_y + eh - H)
    pad_w = max(0, base_x + ew - W)
    lhs = src_f
    if pad_h or pad_w:
        lhs = jnp.pad(lhs, ((0, pad_h), (0, pad_w)))
    lhs = jax.lax.dynamic_slice(lhs, (base_y, base_x), (eh, ew))
    nphase = cop.kernels.shape[0]
    K = cop.kernels[:, 0]  # (nphase, Kh, Kw)
    fs = dop.filter_size
    offsets = cop.phase_offsets  # static tuple of (oy, ox) per phase

    def window(a, b):
        return jax.lax.slice(
            lhs,
            (a, b),
            (a + (nyb - 1) * qy + 1, b + (nxb - 1) * qx + 1),
            (qy, qx),
        )

    if Kh * Kw <= 1.3 * fs * fs or len(set(offsets)) == 1:
        # Shared-slice shift-sum: every tap window feeds all phase channels.
        if Kh * Kw > SHIFT_UNROLL_MAX:
            conv = _shift_sum_deep(lhs, K, qy, qx, nyb, nxb)
        else:
            conv = jnp.zeros((nphase, nyb, nxb), dtype=f32)
            for a in range(Kh):
                for b in range(Kw):
                    conv = conv + K[:, a, b][:, None, None] * window(a, b)[None]
    else:
        # Offset-grouped: phases sharing an embedding offset share slices,
        # skipping the embedding-margin zeros (wide-offset plans).
        groups: dict[tuple[int, int], list[int]] = {}
        for p, off in enumerate(offsets):
            groups.setdefault(off, []).append(p)
        parts = [None] * nphase
        for (oy, ox), ps in groups.items():
            Kg = K[jnp.asarray(ps)][:, oy : oy + fs, ox : ox + fs]
            if fs * fs > SHIFT_UNROLL_MAX:
                acc_g = _shift_sum_deep(lhs[oy:, ox:], Kg, qy, qx, nyb, nxb)
            else:
                acc_g = jnp.zeros((len(ps), nyb, nxb), dtype=f32)
                for a in range(fs):
                    for b in range(fs):
                        acc_g = acc_g + Kg[:, a, b][:, None, None] * window(
                            oy + a, ox + b
                        )[None]
            for i, p in enumerate(ps):
                parts[p] = acc_g[i]
        conv = jnp.stack(parts, axis=0)
    return _assemble(cop, conv, src_f, strips_fn=strips_fn)


@partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
def resize_plane_conv(
    cop: ConvOperator,
    src: jax.Array,
    out_dtype=jnp.float32,
    peak: float | None = None,
    float_clamp_min: float | None = None,
) -> jax.Array:
    return finalize(apply_plane_conv(cop, src, float_clamp_min), out_dtype, peak)


class ConvApplier:
    """Phase-conv applier with a selectable interior engine.

    ``interior='fused'`` uses the fused Pallas banded-matmul kernel
    (kernels/pallas_fused.py); ``'shift'`` uses the XLA shift-sum; ``'auto'``
    picks the fused kernel on TPU backends when the geometry fits its
    envelope. Fixups and strips are shared. Holds its own jit caches.
    """

    def __init__(
        self, op, plan=None, interior: str = "auto", precision: str = "fp32"
    ):
        from .phase import build_conv_kernels, plan_phases

        # 'fp32_u8src': exact-for-u8 fast mode — sources known bf16-exact
        # (u8 planes), weights host-split into 3 bf16 components, 3 DEFAULT
        # passes instead of HIGHEST's 6 (error ~2^-24 relative, well under
        # the 1-LSB parity bound).
        if precision not in ("fp32", "bf16", "fp32_u8src"):
            raise ValueError(f"ConvApplier: unknown precision {precision!r}")
        self.precision = precision

        if plan is None:
            plan = plan_phases(op)
        if plan is None:
            raise ValueError("ConvApplier: geometry is aperiodic")
        self.cop = build_conv_operator(op, plan)
        self.fs = op.filter_size
        from .apply_strips_fast import apply_strips_fast, plan_strips

        self._strip_plans = plan_strips(op, plan)
        if self._strip_plans is not None:
            plans = self._strip_plans
            self._strips_fn = lambda dop, s, c: apply_strips_fast(dop, plans, s, c)
        else:
            self._strips_fn = None
        backend = jax.default_backend()
        if interior == "auto":
            from .kernels import pallas_fused

            # auto = fused else shift. Deep-tap supports (fs^2 > 1200) pay a
            # minutes-scale Mosaic compile (n_dots = fs; ~184 s at fs=65 4K
            # through the remote tunnel), so auto admits them only for
            # large outputs where the 3-10x runtime win amortizes it —
            # same policy as the seg engine's MIN_PIXELS gate. Explicit
            # interior='fused' (or impl='pallas') always builds.
            deep_ok = op.filter_size**2 <= 1200 or (
                op.dst_width * op.dst_height
                >= int(
                    os.environ.get(
                        "JINCRESIZE_DEEP_FUSED_MIN_PIXELS", str(1 << 20)
                    )
                )
            )
            if (
                backend == "tpu"
                and deep_ok
                and pallas_fused.is_supported(op, plan)
            ):
                interior = "fused"
            else:
                interior = "shift"
        self.interior = interior
        # Requested vs effective: only the fused interior consumes the
        # precision mode; shift/pallas interiors run full-fp32 math.
        self.effective_precision = precision if interior == "fused" else "fp32"
        self._interior_fn = None
        self._interior_layout = "phase"
        if interior == "fused":
            from .kernels.pallas_fused import make_fused_interior

            # bf16: 1-pass MXU dots (~1.7x interior speedup on v5e),
            # documented non-parity mode (~1e-3 relative error on fp32
            # sources); fp32: 6-pass HIGHEST, bit-parity default;
            # fp32_u8src: 3-pass weight-split, exact for bf16-exact sources.
            kernel_prec = {
                "bf16": "default",
                "fp32_u8src": "wsplit3",
                "fp32": os.environ.get("JINCRESIZE_FUSED_PRECISION", "highest"),
            }[precision]
            self._interior_fn = make_fused_interior(
                op,
                plan,
                precision=kernel_prec,
                interpret=(backend != "tpu"),
            )
            self._interior_layout = "dst"
        # Default strip-block producer (value blocks, not canvas updates);
        # the Pallas strip kernel path overrides it below.
        if self._strip_plans is not None:
            from .apply_strips_fast import strip_values_fast

            plans = self._strip_plans
            self._strip_blocks_fn = lambda dop, s: [
                (rect, acc) for _, rect, acc in strip_values_fast(dop, plans, s)
            ]
        else:
            self._strip_blocks_fn = lambda dop, s: [
                ((st.y0, st.y1, st.x0, st.x1), _strip_values(dop, s, st))
                for st in dop.strips
            ]
        self._strips_kfn_spec = None
        if interior == "fused":
            self._setup_strip_kernel(op, plan, backend)
        # Shared residue deinterleave: only when BOTH Pallas kernels are
        # active (the strips closure accepts the residue kwarg then).
        self._shared_residue = None
        ispec = getattr(self._interior_fn, "residue_spec", None)
        if ispec is not None and self._strips_kfn_spec is not None:
            qx_i, wq_i, ey_i = ispec
            qx_s, wq_s, ey_s = self._strips_kfn_spec
            assert qx_i == qx_s  # same plan -> same column quantum
            self._shared_residue = (qx_i, max(wq_i, wq_s), max(ey_i, ey_s))
        # Border-frame classification: when the strips exactly frame the
        # interior block, the canvas is assembled with one concatenate
        # (single output write) instead of zeros + paste + per-strip
        # dynamic updates, which cost ~1.4 ms/frame in HBM traffic at 8K.
        self._concat = None
        if self._interior_layout == "dst":
            (ylo, xlo, py_, px_, qy, qx, by_, bx_, nyb, nxb, Kh, Kw) = (
                self.cop.meta
            )
            H, W = op.dst_height, op.dst_width
            yhi, xhi = ylo + py_ * nyb, xlo + px_ * nxb
            seen, ok = set(), True
            for s in op.strips:
                r = (s.y0, s.y1, s.x0, s.x1)
                if r in (
                    (0, ylo, 0, W),
                    (yhi, H, 0, W),
                    (ylo, yhi, 0, xlo),
                    (ylo, yhi, xhi, W),
                ) and r not in seen:
                    seen.add(r)
                else:
                    ok = False
            if (
                ok
                and (ylo == 0 or (0, ylo, 0, W) in seen)
                and (yhi == H or (yhi, H, 0, W) in seen)
                and (xlo == 0 or (ylo, yhi, 0, xlo) in seen)
                and (xhi == W or (ylo, yhi, xhi, W) in seen)
            ):
                self._concat = (ylo, xlo, yhi, xhi, H, W)
        # cop is a jit ARGUMENT (not a closure): closure capture would embed
        # the strip blocks as HLO constants — hundreds of MB at 8K.
        self._jit = jax.jit(
            self._apply, static_argnames=("out_dtype", "peak", "float_clamp_min")
        )
        self._jit_batch = jax.jit(
            self._apply_batch,
            static_argnames=("out_dtype", "peak", "float_clamp_min"),
        )

    def _setup_strip_kernel(self, op, plan, backend):
        """Swap the full-width strips onto the Pallas strip kernel.

        kernels/pallas_strips.py computes the pattern-covered top/bottom
        strip values from anchor blocks (bitwise-verified); corners and
        exception columns are patched per-pixel; left/right strips stay on
        the slicing path. Replaces ~440 MB/frame of per-pixel block reads.
        """
        from .apply_strips_fast import apply_strips_fast
        from .kernels.pallas_strips import make_strips_interior

        r = make_strips_interior(op, plan, interpret=(backend != "tpu"))
        if r is None:
            return
        kfn, patches, meta = r
        patch_data = []
        kernel_rects = set()
        for s, cols in patches:
            kernel_rects.add((s.y0, s.y1, s.x0, s.x1))
            if len(cols) == 0:
                continue
            patch_data.append(
                (
                    s.y0,
                    s.y1,
                    int(op.start_y[s.y0]),
                    jnp.asarray(cols.astype(np.int32)),
                    jnp.asarray(op.start_x[cols].astype(np.int32)),
                    jnp.asarray(s.blocks[:, cols - s.x0]),
                )
            )
        rem = tuple(
            i
            for i, s in enumerate(op.strips)
            if (s.y0, s.y1, s.x0, s.x1) not in kernel_rects
        )
        plans = self._strip_plans
        rows_meta = meta["strips"]
        ny_p, xlo_k, width_k = meta["ny_p"], meta["xlo"], meta["width"]
        fs = self.fs

        patch_by_rows = {(p[0], p[1]): p for p in patch_data}
        dst_w = op.dst_width

        self._strips_kfn_spec = getattr(kfn, "residue_spec", None)

        def strip_blocks(dop, src_f, residue=None):
            blocks = []
            out = kfn(src_f, residue=residue)
            for si, (y0, y1) in enumerate(rows_meta):
                vals = jax.lax.slice(
                    out, (si * ny_p, 0), (si * ny_p + (y1 - y0), width_k)
                )
                # Assemble the full-width strip block (kernel values +
                # per-pixel corner/exception columns) BEFORE touching the
                # canvas: scattering into the big (batched) canvas lowers to
                # a full-canvas scatter per op (measured ~40 ms at 8K x8).
                row_block = jnp.zeros((y1 - y0, dst_w), dtype=f32)
                row_block = jax.lax.dynamic_update_slice(row_block, vals, (0, xlo_k))
                p = patch_by_rows.get((y0, y1))
                if p is not None:
                    _, _, sy_c, cols, cols_sx, blocks_sel = p
                    pv = _strip_cols_patch(src_f, sy_c, fs, cols_sx, blocks_sel)
                    row_block = row_block.at[:, cols].set(pv)
                blocks.append(((y0, y1, 0, dst_w), row_block))
            if rem:
                if plans is not None:
                    from .apply_strips_fast import strip_values_fast

                    blocks.extend(
                        (rect, acc)
                        for _, rect, acc in strip_values_fast(
                            dop, plans, src_f, only=rem
                        )
                    )
                else:
                    blocks.extend(
                        (
                            (s.y0, s.y1, s.x0, s.x1),
                            _strip_values(dop, src_f, s),
                        )
                        for s in (dop.strips[i] for i in rem)
                    )
            return blocks

        self._strip_blocks_fn = strip_blocks

        def strips_fn(dop, src_f, canvas):
            for (y0, y1, x0, x1), blk in strip_blocks(dop, src_f):
                canvas = jax.lax.dynamic_update_slice(canvas, blk, (y0, x0))
            return canvas

        self._strips_fn = strips_fn

    def _acc_concat(self, cop, src_f):
        """Single-write canvas assembly: rows = [top; [left|interior|right];
        bottom], with exception fixups applied to the middle block only (the
        border strips own their pixels — same precedence as the legacy
        paste-then-overwrite order)."""
        dop = cop.dop
        ylo, xlo, yhi, xhi, H, W = self._concat
        if self._shared_residue is not None:
            # One deinterleave feeds both Pallas kernels (ROADMAP 6): built
            # at the max (wq, ext_y) of the interior and strips specs.
            from .kernels.pallas_fused import residue_planes

            qx_r, wq_r, ey_r = self._shared_residue
            residue = residue_planes(src_f, qx_r, wq_r, ey_r)
            block = self._interior_fn(src_f, residue=residue)
            by_rect = dict(self._strip_blocks_fn(dop, src_f, residue=residue))
        else:
            block = self._interior_fn(src_f)
            by_rect = dict(self._strip_blocks_fn(dop, src_f))
        mid = [
            by_rect.pop((ylo, yhi, 0, xlo), None),
            block,
            by_rect.pop((ylo, yhi, xhi, W), None),
        ]
        mid = [m for m in mid if m is not None]
        mid = jnp.concatenate(mid, axis=1) if len(mid) > 1 else mid[0]
        if cop.exc_x.shape[0]:
            vals = _cols_subset(dop, src_f, cop.exc_x)
            mid = mid.at[:, cop.exc_x].set(
                jax.lax.slice(vals, (ylo, 0), (yhi, vals.shape[1]))
            )
        if cop.exc_y.shape[0]:
            vals = _rows_subset(dop, src_f, cop.exc_y)
            mid = mid.at[cop.exc_y - ylo, xlo:xhi].set(vals[:, xlo:xhi])
        rows = [
            by_rect.pop((0, ylo, 0, W), None),
            mid,
            by_rect.pop((yhi, H, 0, W), None),
        ]
        rows = [r for r in rows if r is not None]
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def _acc(self, cop, src_f):
        if self._interior_fn is not None and self._concat is not None:
            return self._acc_concat(cop, src_f)
        if self._interior_fn is not None:
            conv = self._interior_fn(src_f)
            return _assemble(
                cop,
                conv,
                src_f,
                strips_fn=self._strips_fn,
                interior_layout=self._interior_layout,
            )
        return apply_plane_conv(cop, src_f, strips_fn=self._strips_fn)

    def _apply(
        self, cop, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        src_f = src.astype(f32)
        if float_clamp_min is not None:
            src_f = jnp.maximum(src_f, jnp.float32(float_clamp_min))
        return finalize(self._acc(cop, src_f), out_dtype, peak)

    def _apply_batch(
        self, cop, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        fn = lambda s: self._apply(cop, s, out_dtype, peak, float_clamp_min)
        return jax.vmap(fn)(src)

    def __call__(self, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        if src.ndim == 3:
            return self._jit_batch(
                self.cop,
                src,
                out_dtype=out_dtype,
                peak=peak,
                float_clamp_min=float_clamp_min,
            )
        return self._jit(
            self.cop,
            src,
            out_dtype=out_dtype,
            peak=peak,
            float_clamp_min=float_clamp_min,
        )


@partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
def resize_plane_conv_batch(
    cop: ConvOperator,
    src: jax.Array,  # (F, H, W)
    out_dtype=jnp.float32,
    peak: float | None = None,
    float_clamp_min: float | None = None,
) -> jax.Array:
    fn = lambda s: finalize(apply_plane_conv(cop, s, float_clamp_min), out_dtype, peak)
    return jax.vmap(fn)(src)
