"""Fused phase-interior kernel: dst-layout output, packed-K banded matmuls.

Single ``pallas_call`` computing the ENTIRE periodic interior in destination
layout (replacing pallas_phase.py's per-phase planes + the XLA phase
interleave, which cost ~4x the kernel itself in HBM-layout transposes at 8K):

  * the row-phase interleave is free — band matrices are built with
    interleaved rows, so tile row ``m`` IS destination row ``tile_base + m``
    (phase ``m % py``, block ``m // py``);
  * vertical taps are a banded matmul (as before), but ``g = 128 // Hbu``
    horizontal taps are packed along K per dot (sublane-concat of shifted
    strided column slices), cutting the K-padding waste by ``g``;
  * column phases sharing a base offset (offs_x equal — all integer
    upscales) share their packed operands; their accumulators are written
    with lane-strided stores (or an exact 0/1 scatter matmul fallback), so
    the output lands interleaved in dst layout with no XLA transpose;
  * precision is selectable: HIGHEST (6-pass, bit-parity default) or
    DEFAULT (1-pass bf16 fast mode, documented non-parity).

Replaces the reference's per-ISA gather loops (resize_plane_avx512.cpp) with
one shape-specialized MXU schedule; the quantized phase dictionary
(JincResize.cpp:423-435 factor_map) is what makes the weights per-tile
constants.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..operator import PlaneOperator
from ..phase import PhasePlan

f32 = jnp.float32

SUB = 8
LANE = 128
TNB = int(os.environ.get("JINCRESIZE_FUSED_TNB", "128"))  # block cols per tile
_TMB_ENV = os.environ.get("JINCRESIZE_FUSED_TMB")
# Matmul issue overhead (cycles) for the TMb heuristic; calibrated on v5e at
# 4K->8K tap8 (measured: TMb=24 4.44ms < 48 4.67 < 16 5.08 < 32 5.02).
_MXU_LATENCY = 40.0


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


VMEM_BUDGET = 12 * 1024 * 1024  # conservative of ~16MB/core


def _vmem_bytes(
    fs: int,
    py: int,
    px: int,
    qy: int,
    qx: int,
    spread_y: int,
    fs_x: int,
    base_x: int,
    nxb: int,
    tmb: int,
) -> int:
    """Estimated VMEM footprint of one pipelined band at blocks-per-tile tmb:
    double-buffered source residue planes + output band, plus weights (3x for
    the wsplit3 mode's pre-split components) and staging scratch."""
    hbu_p = _round_up(qy * (tmb - 1) + spread_y + fs, SUB)
    hb = _round_up(SUB + hbu_p, SUB)
    g = max(1, LANE // hbu_p) if hbu_p <= LANE else 1
    n_d = -(-fs_x // g)
    kp = g * hbu_p
    nt = -(-nxb // TNB)
    ext_x = _round_up(base_x + (fs_x - 1) + qx * (TNB * nt - 1) + 1, LANE)
    wq = _round_up(-(-ext_x // qx), LANE)
    band = qx * hb * wq * 4
    outb = py * tmb * (nt * px * TNB) * 4
    wb = 3 * n_d * px * py * tmb * kp * 4
    scratch = n_d * kp * TNB * 4
    return 2 * (band + outb) + wb + scratch


def residue_planes(src_f, qx: int, wq: int, ext_y: int):
    """Deinterleave a source plane into qx column-residue planes.

    Returns (qx, Hp, wq) with planes[c, h, w] = src[h, w*qx + c] (zero-padded
    to Hp >= ext_y rows and qx*wq columns). The content of plane c at column
    w is independent of wq, so one tensor built at the max (wq, ext_y) of
    several kernels serves them all (their BlockSpecs read inside their own
    (hb, wq) extents) — ROADMAP 6: on qx>1 downscales the fused interior and
    the strips kernel each cost a full-plane pass here if built separately
    (XLA cannot CSE the two different-wq reshapes).
    """
    H, W_ = src_f.shape
    pad_h = max(0, ext_y - H)
    pad_w = max(0, qx * wq - W_)
    if pad_h or pad_w:
        src_f = jnp.pad(src_f, ((0, pad_h), (0, pad_w)))
    if src_f.shape[1] > qx * wq:
        # qx*wq bounds every kernel read; crop for a shape-valid reshape.
        src_f = src_f[:, : qx * wq]
    return src_f.reshape(src_f.shape[0], wq, qx).transpose(2, 0, 1)


def _choose_tmb(
    fs: int,
    py: int,
    qy: int,
    spread_y: int,
    nyb: int,
    px: int,
    fs_x: int,
    qx: int = 1,
    base_x: int = 0,
    nxb: int = 1,
) -> int:
    """Pick blocks-per-tile: minimize MXU passes per output pixel.

    Each pack is one dot with M = px*py*tmb (phases M-concatenated); Mosaic
    splits M into ceil(M/128) chunks, each a full pass set, so the cost per
    output is n_d * mchunks / M, with a fixed per-dot issue latency amortized
    over the tile (calibrated on v5e at 4K->8K tap8). Candidates whose band
    would overflow VMEM are skipped (wide outputs get shorter tiles).
    """
    if _TMB_ENV:
        return int(_TMB_ENV)
    best, best_score = 8, float("inf")
    for tmb in range(8, 257, 8):
        if tmb > max(8, nyb):
            break
        hbu = qy * (tmb - 1) + spread_y + fs
        hbu_p = _round_up(hbu, SUB)
        if hbu_p > LANE:
            if best_score == float("inf"):
                best = tmb  # geometry too tall for K=128: take smallest
            break
        if (
            _vmem_bytes(fs, py, px, qy, qx, spread_y, fs_x, base_x, nxb, tmb)
            > VMEM_BUDGET
        ):
            continue
        g = max(1, LANE // hbu_p)
        n_d = -(-fs_x // g)
        m = px * py * tmb
        mchunks = -(-m // LANE)
        score = n_d * (mchunks * LANE + _MXU_LATENCY) / m
        if score < best_score:
            best, best_score = tmb, score
    return best


def _fused_kernel(
    w_ref,  # (n_d, px*TMo, Kp) — phases concatenated along M
    src_ref,  # (Hb, Wband) full-width source row band
    out_ref,  # (TMo, nt*TNo) full-width destination row band
    colp_ref,  # (n_d, Kp, TNb) VMEM scratch for packed column segments
    #            (one region per dot so consecutive stage->dot chains don't
    #            serialize on a single buffer)
    *,
    ry0: int,
    base_c0: int,  # shared base column offset (min over phases)
    packs: tuple,  # ((lx', ...), ...) extended-range taps per dot
    hbu_p: int,
    px: int,
    qx: int,
    tnb: int,
    nt: int,  # column tiles per band (unrolled inner loop)
    precision,
    interleave: str,
):
    """One grid step computes a full-width band of TMo destination rows.

    The grid is 1-D over row bands so the (overlapping, element-offset)
    source DMA happens once per band, not once per column tile: 2-D grids of
    element-offset windows defeat the Pallas pipeline (measured ~0.9us per
    window DMA vs 0.14us per aligned block step on v5e) and made the window
    fetch — not compute — the kernel bottleneck.
    """
    wparts = w_ref.shape[0] if w_ref.ndim == 4 else 1
    tmo = (w_ref.shape[2] if w_ref.ndim == 4 else w_ref.shape[1]) // px
    tno = tnb * px
    if px > 1 and interleave not in ("store", "xla"):
        rows = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 1)
        es = [(cols == px * rows + rx).astype(f32) for rx in range(px)]

    for j in range(nt):
        cj = base_c0 + qx * tnb * j

        if qx == 1:
            blk = src_ref[0, ry0 : ry0 + hbu_p, :]

            def seg(c0):
                return jax.lax.slice(blk, (0, c0), (hbu_p, c0 + tnb), (1, 1))

        else:
            # Lane-strided slices are not lowerable by Mosaic; the source
            # band arrives pre-deinterleaved into qx residue planes
            # (src_ref[r, y, k] = src[y, r + qx*k]), so the strided window
            # for column c is a contiguous slice of plane c % qx.
            def seg(c0):
                r, base = c0 % qx, c0 // qx
                return src_ref[r, ry0 : ry0 + hbu_p, base : base + tnb]

        # All column phases share one packed operand set: taps are enumerated
        # over the extended range [0, fs + spread_c) so each phase's window
        # is a shifted sub-range — its weights are zero outside (built that
        # way on host), and the staged segments are built exactly once. The
        # phases are additionally concatenated along M (w is (n_d, px*TMo,
        # Kp)) so each staged operand feeds ONE dot: MXU pass cost scales
        # with dot count, not MACs, and px*TMo <= 128 keeps it one M-chunk.
        acc_cat = jnp.zeros((px * tmo, tnb), dtype=f32)
        colps = []
        for d, taps in enumerate(packs):
            if len(taps) == 1:
                colps.append(seg(cj + taps[0]))
            else:
                # Sublane-concat via scratch: the shifted slices carry
                # different lane offsets, which tpu.concatenate rejects;
                # stores normalize the layout.
                for t, lx in enumerate(taps):
                    colp_ref[d, t * hbu_p : (t + 1) * hbu_p, :] = seg(cj + lx)
                colps.append(colp_ref[d, : len(taps) * hbu_p, :])
        for d, taps in enumerate(packs):
            if wparts == 1:
                acc_cat = acc_cat + jax.lax.dot_general(
                    w_ref[d][:, : len(taps) * hbu_p],
                    colps[d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=f32,
                )
            else:
                # wsplit3 (bf16-exact sources, e.g. u8 planes): weights are
                # pre-split on host into 3 bf16-exact components, each dot
                # DEFAULT (1-pass) — exact products, 3 passes vs HIGHEST's 6.
                for part in range(wparts):
                    acc_cat = acc_cat + jax.lax.dot_general(
                        w_ref[part, d][:, : len(taps) * hbu_p],
                        colps[d],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=f32,
                    )
        accs = [acc_cat[rx * tmo : (rx + 1) * tmo] for rx in range(px)]
        if px == 1:
            out_ref[:, j * tno : (j + 1) * tno] = accs[0]
        elif interleave == "xla":
            # Phase-PLANE stores; the wrapper interleaves with one XLA
            # minor-dim transpose (same trade as pallas_fused_seg: skips
            # the MXU scatter dots at the cost of an extra HBM pass).
            for rx in range(px):
                out_ref[
                    :, j * tno + rx * tnb : j * tno + (rx + 1) * tnb
                ] = accs[rx]
        elif interleave == "store":
            # Lane-strided stores: no extra FLOPs, but unsupported by current
            # Mosaic ("last dim size is not 128 in original base memref") —
            # experimental, enable via JINCRESIZE_FUSED_INTERLEAVE=store.
            for rx in range(px):
                out_ref[:, pl.Slice(j * tno + rx, tnb, px)] = accs[rx]
        else:
            # Column-phase interleave on the MXU: acc_rx @ E_rx with E_rx the
            # 0/1 scatter (TNb, TNo), E[j, px*j+rx] = 1. E selects exactly one
            # acc element per output lane, so there is no accumulation — each
            # product is exact as long as the acc operand is bf16-exact.
            out = jnp.zeros((tmo, tno), dtype=f32)
            for rx in range(px):
                if interleave == "split3":
                    # Exact 3-pass scatter: split acc into three bf16-exact
                    # components (hi+mid+lo == acc in f32, each summand
                    # exactly representable, sums exact by non-overlapping
                    # significands); each DEFAULT (1-pass) dot is exact
                    # against a 0/1 matrix. 3 passes total vs HIGHEST's 6.
                    a = accs[rx]
                    hi = a.astype(jnp.bfloat16).astype(f32)
                    r1 = a - hi
                    mid = r1.astype(jnp.bfloat16).astype(f32)
                    lo = r1 - mid
                    for part in (hi, mid, lo):
                        out = out + jax.lax.dot_general(
                            part,
                            es[rx],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=f32,
                        )
                else:
                    # HIGHEST keeps the interleave exact in one dot (6-pass).
                    out = out + jax.lax.dot_general(
                        accs[rx],
                        es[rx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=f32,
                    )
            out_ref[:, j * tno : (j + 1) * tno] = out


def make_fused_interior(
    op: PlaneOperator,
    plan: PhasePlan,
    precision: str = "highest",
    interleave: str | None = None,
    interpret: bool = False,
):
    """Build fn(src_f32) -> (py*nyb, px*nxb) interior in destination layout.

    The result block belongs at canvas[ylo:ylo+py*nyb, xlo:xlo+px*nxb].
    """
    fs = op.filter_size
    py, px = plan.y.p, plan.x.p
    qy, qx = plan.y.q, plan.x.q
    nyb, nxb = plan.y.nblocks, plan.x.nblocks
    offs_y = plan.y.offsets.astype(int)
    offs_x = plan.x.offsets.astype(int)
    spread_y = int(offs_y.max())
    spread_x = int(offs_x.max())
    base_y = plan.y.base
    base_x = plan.x.base

    tnb = TNB
    # Extended horizontal tap range: all column phases share one staged
    # operand set over [0, fs + spread_x); phase rx's taps occupy the
    # sub-range [offs_x[rx] - min, +fs) and its weights are zero elsewhere.
    fs_x = fs + spread_x
    tmb = _choose_tmb(
        fs, py, qy, spread_y, nyb, px, fs_x, qx=qx, base_x=base_x, nxb=nxb
    )
    tmo = py * tmb
    tno = px * tnb
    hbu = qy * (tmb - 1) + spread_y + fs
    hbu_p = _round_up(hbu, SUB)
    g = max(1, LANE // hbu_p) if hbu_p <= LANE else 1
    packs = tuple(
        tuple(range(d * g, min((d + 1) * g, fs_x))) for d in range(-(-fs_x // g))
    )
    n_d = len(packs)
    kp = g * hbu_p

    # Band placement: align the row start down to the register tile; the grid
    # step preserves the residual because qy*tmb % SUB == 0 (tmb multiple of
    # 8). Columns are not tiled in the grid — each band is full-width.
    ay = (base_y + 0) // SUB * SUB  # min offset is 0 by construction
    ry0 = base_y - ay
    hb = _round_up(ry0 + hbu_p, SUB)

    mt = -(-nyb // tmb)
    nt = -(-nxb // tnb)
    ext_y = ay + qy * tmb * (mt - 1) + hb
    ext_x = _round_up(
        base_x + spread_x + (fs - 1) + qx * (tnb * nt - 1) + 1, LANE
    )

    # Band weights: w[d, rx*tmo + m, t*hbu_p + (oy[ry] + qy*i + ly)] =
    # W[ry,rx][ly, lx] for tile row m = py*i + ry and pack slot t holding
    # extended tap lx' = packs[d][t] (phase tap lx = lx' - offs_x[rx]; zero
    # out of range). Phases concatenated along M feed one dot per pack.
    cy = plan.y.anchor_cls
    cx = plan.x.anchor_cls
    w = np.zeros((n_d, px * tmo, kp), dtype=np.float32)
    for rx in range(px):
        dcol = int(offs_x[rx])
        for m in range(tmo):
            i, ry = divmod(m, py)
            blk = op.pair_blocks[cy[ry], cx[rx]]  # (fs, fs) [ly, lx]
            row0 = offs_y[ry] + qy * i
            for d, taps in enumerate(packs):
                for t, lxp in enumerate(taps):
                    lx = lxp - dcol
                    if 0 <= lx < fs:
                        w[
                            d,
                            rx * tmo + m,
                            t * hbu_p + row0 : t * hbu_p + row0 + fs,
                        ] = blk[:, lx]
    # Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass) dots.
    # 'wsplit3' pre-splits the weights into 3 bf16-exact components on host
    # (w == w0+w1+w2 exactly: 3x8 significand bits cover f32's 24) and runs
    # 3 DEFAULT dots per pack — exact whenever the SOURCE values are
    # bf16-representable (u8 planes widened to f32), at half HIGHEST's cost.
    if precision == "wsplit3":
        import ml_dtypes

        c0 = w.astype(ml_dtypes.bfloat16).astype(np.float32)
        r1 = w - c0
        c1 = r1.astype(ml_dtypes.bfloat16).astype(np.float32)
        c2 = r1 - c1
        w = np.stack([c0, c1, c2], axis=0)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = {
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
    w_dev = jnp.asarray(w)
    kern = functools.partial(
        _fused_kernel,
        ry0=ry0,
        base_c0=base_x,
        packs=packs,
        hbu_p=hbu_p,
        px=px,
        qx=qx,
        tnb=tnb,
        nt=nt,
        precision=prec,
        interleave=(
            interleave
            or os.environ.get("JINCRESIZE_FUSED_INTERLEAVE", "split3")
        ),
    )
    # Source is shipped as qx residue planes (deinterleaved by XLA outside
    # the kernel) so in-kernel window slices are always lane-contiguous.
    wq = _round_up(-(-ext_x // qx), LANE)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((mt * tmo, nt * tno), f32),
        grid=(mt,),
        in_specs=[
            pl.BlockSpec(
                (3, n_d, px * tmo, kp), lambda i: (0, 0, 0, 0)
            )
            if precision == "wsplit3"
            else pl.BlockSpec((n_d, px * tmo, kp), lambda i: (0, 0, 0)),
            pl.BlockSpec(
                (pl.Element(qx), pl.Element(hb), pl.Element(wq)),
                lambda i: (0, ay + qy * tmb * i, 0),
            ),
        ],
        out_specs=pl.BlockSpec((tmo, nt * tno), lambda i: (i, 0)),
        scratch_shapes=[pltpu.VMEM((n_d, kp, tnb), f32)],
        interpret=interpret,
    )

    ileave = interleave or os.environ.get("JINCRESIZE_FUSED_INTERLEAVE", "split3")

    def fn(src_f, residue=None):
        # ``residue``: optional pre-built residue planes (qx, Hp, wqs) with
        # Hp >= ext_y and wqs >= wq (ROADMAP 6 shared deinterleave — the
        # strips kernel needs the same planes at a different width; block
        # reads stay inside (hb, wq) so a wider shared array is drop-in).
        if residue is None:
            residue = residue_planes(src_f, qx, wq, ext_y)
        out = call(w_dev, residue)
        if px > 1 and ileave == "xla":
            R = out.shape[0]
            out = (
                out.reshape(R, nt, px, tnb)
                .transpose(0, 1, 3, 2)
                .reshape(R, nt * tno)
            )
        return out[: py * nyb, : px * nxb]

    fn.residue_spec = (qx, wq, ext_y)

    fn.tile_info = {  # introspection for tests/bench
        "tmb": tmb,
        "tnb": tnb,
        "hbu_p": hbu_p,
        "g": g,
        "n_dots": n_d,
        "grid": (mt, nt),
    }
    return fn


def is_supported(op: PlaneOperator, plan: PhasePlan) -> bool:
    """Geometry limits: weights stay small, window fits alignment scheme."""
    fs = op.filter_size
    py, px = plan.y.p, plan.x.p
    if px > 8 or py > 64:
        return False
    # Large phase products crash the Mosaic compiler (observed at
    # py*px=168, v5e) and unroll the kernel body excessively; the XLA
    # shift-sum handles such geometries.
    if py * px > 32:
        return False
    # Deep-tap supports (fs^2 > 1200, e.g. tap16 downscales at fs >= 35)
    # are admitted for plans up to py*px = 4 — the shapes measured on
    # hardware (r5, v5e, 8..32-frame batches, 1-LSB parity):
    #   * p=(1,1) 4K->1080p tap16 fs=65:  4.89 ms/frame (vs 20.2 XLA
    #     channelized, 67.9 scan shift-sum)
    #   * p=(2,2) 4K->1440p tap16 fs=49:  7.13 ms/frame (vs 33.3 XLA
    #     channelized) — 4.7x
    # Compile cost grows with fs (n_dots ~ fs): ~184 s at fs=65 4K / ~97 s
    # at fs=49 through the remote-compile tunnel, so the AUTO dispatcher
    # additionally gates deep-tap fused on output size (ConvApplier);
    # explicit interior='fused' / impl='pallas' always builds. Wider-phase
    # deep plans (py*px > 4, unmeasured Mosaic regime) and
    # fs^2 > JINCRESIZE_FUSED_FS2_MAX stay on the XLA forms.
    fs2_max = int(os.environ.get("JINCRESIZE_FUSED_FS2_MAX", 4500))
    if fs * fs > 1200 and (py * px > 4 or fs * fs > fs2_max):
        return False
    qy = plan.y.q
    spread_y = int(plan.y.offsets.max())
    spread_x = int(plan.x.offsets.max())
    # smallest tile must fit a K window
    hbu_min = _round_up(qy * 7 + spread_y + fs, SUB)
    if hbu_min > 4 * LANE:
        return False
    # Full-width row bands must fit VMEM (~16MB/core, double-buffered):
    # src residue planes + dst band + weights + staging scratch. The source
    # block is (qx, hb, wq) where qx*wq covers ext_x (interior reads plus
    # column-tile and per-plane LANE round-ups). _choose_tmb already skips
    # VMEM-overflowing tiles, so check the footprint of its pick.
    qx = plan.x.q
    fs_x = fs + spread_x
    nxb = plan.x.nblocks
    base_x = plan.x.base
    tmb = _choose_tmb(
        fs, py, qy, spread_y, plan.y.nblocks, px, fs_x,
        qx=qx, base_x=base_x, nxb=nxb,
    )
    return (
        _vmem_bytes(fs, py, px, qy, qx, spread_y, fs_x, base_x, nxb, tmb)
        <= VMEM_BUDGET
    )
