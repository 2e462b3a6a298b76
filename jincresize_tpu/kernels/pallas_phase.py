"""Pallas phase-interior kernel: register-resident accumulation, zero gathers.

Computes the periodic-interior phase outputs out[p, yb, xb] (the same
quantity as apply_conv's shift-sum) with an explicit VMEM/register schedule.
One specialized pallas_call per phase channel (phase count is small for real
scale factors — 4 at 2x, 9 at 1.5x):

  * grid (row-tile, col-tile); each program owns a (TM, 128) output tile;
  * the tile's source window — overlapping, phase-offset, stride (qy, qx) —
    is DMA'd by the Pallas pipeline via ``pl.Element`` block dims. Mosaic
    needs (8, 128)-aligned window starts, so the static phase offset is
    aligned down and the kernel consumes the static residual with one cheap
    in-register shift per tile;
  * the tap loop runs lx-outer / ly-inner: the lane shift (the only per-tap
    relayout) is hoisted and reused across all fs sublane slices;
  * phase weights are baked into the kernel as immediate scalars; each FMA is
    scalar*vector on the VPU with the (TM, 128) accumulator in registers.

This replaces the XLA shift-sum's per-step accumulator materialization
(~85 GB of HBM traffic at 4K->8K) with ~0.5 GB of streamed window reads —
the TPU analog of the reference's "coefficients hot in L2" property
(SURVEY.md §6: the workload is memory-bound gather-MAC).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

f32 = jnp.float32

import os

TM = int(os.environ.get("JINCRESIZE_PALLAS_TM", "32"))  # output rows per tile
TN = int(os.environ.get("JINCRESIZE_PALLAS_TN", "256"))  # output cols per tile
SUB = 8  # sublane alignment quantum
LANE = 128  # lane alignment quantum
MAX_PHASES = 16  # beyond this, per-phase kernel compiles are not worth it


def _phase_kernel(
    wband_ref,
    src_ref,
    out_ref,
    *,
    ry: int,
    rx: int,
    fs: int,
    qy: int,
    qx: int,
):
    """One (TM, TN) output tile of one phase channel (static specialization).

    The ly-accumulation is a banded matmul on the MXU: ``wband[lx]`` is the
    (TM, Hb) matrix with the phase's column-lx weights on its stride-qy
    diagonals, so ``wband[lx] @ col`` sums all vertical taps at once. This
    removes the fs^2 sublane-unaligned vector shifts of the scalar-FMA
    formulation (measured 2.5x the whole kernel's roofline cost) — only the
    fs lane shifts remain on the VPU.
    """
    Hb = qy * (TM - 1) + fs
    Wb = qx * (TN - 1) + fs
    blk = src_ref[ry : ry + Hb, rx : rx + Wb]
    acc = jnp.zeros((TM, TN), dtype=f32)
    for lx in range(fs):
        if qx == 1:
            col = jax.lax.slice(blk, (0, lx), (Hb, lx + TN))
        else:
            col = jax.lax.slice(blk, (0, lx), (Hb, lx + qx * (TN - 1) + 1), (1, qx))
        acc = acc + jax.lax.dot_general(
            wband_ref[lx],
            col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
    out_ref[:] = acc


def make_phase_interior(
    kernels: np.ndarray,  # (P, 1, Kh, Kw) embedded kernels
    phase_offsets: tuple,  # ((oy, ox), ...) per phase
    fs: int,
    qy: int,
    qx: int,
    nyb: int,
    nxb: int,
    base_y: int,
    base_x: int,
    interpret: bool = False,
):
    """Build fn(src_f32) -> (P, nyb, nxb) computing all phase channels."""
    P = kernels.shape[0]
    Mt = -(-nyb // TM)
    Nt = -(-nxb // TN)

    def _round_up(v, m):
        return -(-v // m) * m

    # DMA window incl. residual slack, rounded to the (8, 128) register tile
    # (Mosaic requires tile-divisible block shapes).
    Hb = _round_up(qy * (TM - 1) + fs + SUB, SUB)
    Wb = _round_up(qx * (TN - 1) + fs + LANE, LANE)

    Hbu = qy * (TM - 1) + fs  # used (pre-slack) window height

    calls = []
    ext_y = 0
    ext_x = 0
    for p, (oy, ox) in enumerate(phase_offsets):
        W = kernels[p, 0, oy : oy + fs, ox : ox + fs]
        # Banded vertical-tap matrices: wband[lx, m, s] = W[s - qy*m, lx].
        wband = np.zeros((fs, TM, Hbu), dtype=np.float32)
        for m in range(TM):
            for ly in range(fs):
                wband[:, m, qy * m + ly] = W[ly, :]
        wband_dev = jnp.asarray(wband)
        ay = (base_y + oy) // SUB * SUB
        ax = (base_x + ox) // LANE * LANE
        ry = (base_y + oy) - ay
        rx = (base_x + ox) - ax
        ext_y = max(ext_y, ay + qy * TM * (Mt - 1) + Hb)
        ext_x = max(ext_x, ax + qx * TN * (Nt - 1) + Wb)
        kern = functools.partial(
            _phase_kernel, ry=ry, rx=rx, fs=fs, qy=qy, qx=qx
        )
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Mt * TM, Nt * TN), f32),
            grid=(Mt, Nt),
            in_specs=[
                pl.BlockSpec(
                    (fs, TM, Hbu), lambda i, j: (0, 0, 0)
                ),
                pl.BlockSpec(
                    (pl.Element(Hb), pl.Element(Wb)),
                    functools.partial(
                        lambda i, j, ay=ay, ax=ax: (
                            ay + qy * TM * i,
                            ax + qx * TN * j,
                        )
                    ),
                ),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            interpret=interpret,
        )
        calls.append((call, wband_dev))

    def fn(src_f):
        H, W_ = src_f.shape
        pad_h = max(0, ext_y - H)
        pad_w = max(0, ext_x - W_)
        if pad_h or pad_w:
            src_f = jnp.pad(src_f, ((0, pad_h), (0, pad_w)))
        outs = [call(wb, src_f)[:nyb, :nxb] for call, wb in calls]
        return jnp.stack(outs, axis=0)

    return fn


def is_supported(fs: int, n_phases: int | None = None) -> bool:
    """Keep trace sizes and compile counts sane."""
    ok = fs * fs <= 1200
    if n_phases is not None:
        ok = ok and n_phases <= MAX_PHASES
    return ok
