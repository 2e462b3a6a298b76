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


def _choose_tmb(fs: int, py: int, qy: int, spread_y: int, nyb: int) -> int:
    """Pick blocks-per-tile: minimize dots x (1 + latency/M) per output."""
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
        g = max(1, LANE // hbu_p)
        n_d = -(-fs // g)
        tmo = py * tmb
        score = n_d * (tmo + _MXU_LATENCY) / tmo
        if score < best_score:
            best, best_score = tmb, score
    return best


def _fused_kernel(
    w_ref,  # (px, n_d, TMo, Kp)
    src_ref,  # (Hb, Wb) window
    out_ref,  # (TMo, TNo) dst-layout tile
    colp_ref,  # (n_d, Kp, TNb) VMEM scratch for packed column segments
    #            (one region per dot so consecutive stage->dot chains don't
    #            serialize on a single buffer)
    *,
    ry0: int,
    col0: tuple,  # per-rx static base column offset (rx0 + ox[rx]-min_ox)
    packs: tuple,  # ((lx, ...), ...) taps per dot
    hbu_p: int,
    px: int,
    qx: int,
    tnb: int,
    precision,
    interleave: str,
):
    blk = src_ref[ry0 : ry0 + hbu_p, :]

    def seg(c0):
        return jax.lax.slice(
            blk, (0, c0), (hbu_p, c0 + qx * (tnb - 1) + 1), (1, qx)
        )

    # Column phases sharing a base offset (offs_x equal — always true for
    # integer upscales) share their packed operands: build each colp once.
    groups: dict[int, list[int]] = {}
    for rx in range(px):
        groups.setdefault(col0[rx], []).append(rx)

    tmo = w_ref.shape[2]
    accs = [jnp.zeros((tmo, tnb), dtype=f32) for _ in range(px)]
    for c0, rxs in groups.items():
        colps = []
        for d, taps in enumerate(packs):
            if len(taps) == 1:
                colps.append(seg(c0 + taps[0]))
            else:
                # Sublane-concat via scratch: the shifted slices carry
                # different lane offsets, which tpu.concatenate rejects;
                # stores normalize the layout.
                for t, lx in enumerate(taps):
                    colp_ref[d, t * hbu_p : (t + 1) * hbu_p, :] = seg(c0 + lx)
                colps.append(colp_ref[d, : len(taps) * hbu_p, :])
        for d, taps in enumerate(packs):
            colp = colps[d]
            for rx in rxs:
                accs[rx] = accs[rx] + jax.lax.dot_general(
                    w_ref[rx, d][:, : len(taps) * hbu_p],
                    colp,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=f32,
                )
    if px == 1:
        out_ref[:] = accs[0]
    elif interleave == "store":
        # Lane-strided stores: no extra FLOPs, but unsupported by current
        # Mosaic ("last dim size is not 128 in original base memref") —
        # experimental, enable via JINCRESIZE_FUSED_INTERLEAVE=store.
        for rx in range(px):
            out_ref[:, pl.Slice(rx, tnb, px)] = accs[rx]
    else:
        # Column-phase interleave on the MXU: acc_rx @ E_rx with E_rx the 0/1
        # scatter (TNb, TNo), E[j, px*j+rx] = 1 — a fallback for Mosaic
        # versions without lane-strided stores.
        tno = tnb * px
        rows = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 1)
        out = jnp.zeros((accs[0].shape[0], tno), dtype=f32)
        for rx in range(px):
            e = (cols == px * rows + rx).astype(f32)
            # HIGHEST keeps the interleave exact (Mosaic lowers only
            # DEFAULT/HIGHEST; DEFAULT would truncate acc to bf16).
            out = out + jax.lax.dot_general(
                accs[rx],
                e,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32,
            )
        out_ref[:] = out


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
    tmb = _choose_tmb(fs, py, qy, spread_y, nyb)
    tmo = py * tmb
    tno = px * tnb
    hbu = qy * (tmb - 1) + spread_y + fs
    hbu_p = _round_up(hbu, SUB)
    g = max(1, LANE // hbu_p) if hbu_p <= LANE else 1
    packs = tuple(
        tuple(range(d * g, min((d + 1) * g, fs))) for d in range(-(-fs // g))
    )
    n_d = len(packs)
    kp = g * hbu_p

    # Window placement: align starts down to the register tile; the grid step
    # preserves the residual because qy*tmb % SUB == 0 and qx*tnb % LANE == 0
    # (tmb multiple of 8, tnb multiple of 128).
    ay = (base_y + 0) // SUB * SUB  # min offset is 0 by construction
    ax = base_x // LANE * LANE
    ry0 = base_y - ay
    rx0 = base_x - ax
    hb = _round_up(ry0 + hbu_p, SUB)
    wb = _round_up(rx0 + spread_x + (fs - 1) + qx * (tnb - 1) + 1, LANE)

    mt = -(-nyb // tmb)
    nt = -(-nxb // tnb)
    ext_y = ay + qy * tmb * (mt - 1) + hb
    ext_x = ax + qx * tnb * (nt - 1) + wb

    # Band weights: w[rx, d, m, t*hbu_p + (oy[ry] + qy*i + ly)] = W[ry,rx][ly, lx]
    # for tile row m = py*i + ry and pack slot t (tap lx = packs[d][t]).
    cy = plan.y.anchor_cls
    cx = plan.x.anchor_cls
    w = np.zeros((px, n_d, tmo, kp), dtype=np.float32)
    for rx in range(px):
        for m in range(tmo):
            i, ry = divmod(m, py)
            blk = op.pair_blocks[cy[ry], cx[rx]]  # (fs, fs) [ly, lx]
            row0 = offs_y[ry] + qy * i
            for d, taps in enumerate(packs):
                for t, lx in enumerate(taps):
                    w[rx, d, m, t * hbu_p + row0 : t * hbu_p + row0 + fs] = blk[
                        :, lx
                    ]
    w_dev = jnp.asarray(w)

    # Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass) dots.
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    col0 = tuple(rx0 + int(offs_x[rx]) for rx in range(px))
    kern = functools.partial(
        _fused_kernel,
        ry0=ry0,
        col0=col0,
        packs=packs,
        hbu_p=hbu_p,
        px=px,
        qx=qx,
        tnb=tnb,
        precision=prec,
        interleave=interleave
        or os.environ.get("JINCRESIZE_FUSED_INTERLEAVE", "dot"),
    )
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((mt * tmo, nt * tno), f32),
        grid=(mt, nt),
        in_specs=[
            pl.BlockSpec((px, n_d, tmo, kp), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec(
                (pl.Element(hb), pl.Element(wb)),
                lambda i, j: (ay + qy * tmb * i, ax + qx * tnb * j),
            ),
        ],
        out_specs=pl.BlockSpec((tmo, tno), lambda i, j: (i, j)),
        scratch_shapes=[pltpu.VMEM((n_d, kp, tnb), f32)],
        interpret=interpret,
    )

    def fn(src_f):
        H, W_ = src_f.shape
        pad_h = max(0, ext_y - H)
        pad_w = max(0, ext_x - W_)
        if pad_h or pad_w:
            src_f = jnp.pad(src_f, ((0, pad_h), (0, pad_w)))
        out = call(w_dev, src_f)
        return out[: py * nyb, : px * nxb]

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
    if fs * fs > 1200:
        return False
    qy = plan.y.q
    spread_y = int(plan.y.offsets.max())
    # smallest tile must fit a K window
    hbu_min = _round_up(qy * 7 + spread_y + fs, SUB)
    return hbu_min <= 4 * LANE
