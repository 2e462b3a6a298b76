"""Multi-chip spatial partitioning: row-sharded apply with halo exchange.

New capability relative to the reference (SURVEY.md §2 parallelism table: the
plugin never tiles a plane across memory domains). Destination rows are
partitioned across a device mesh axis; each device owns a contiguous source
row band and receives the ``filter_size``-adjacent halo rows from its
neighbors via ``lax.ppermute`` over ICI, overlapped with compute by XLA's
scheduler. Frames batch over a separate data axis (SpMM).

For the sharded path the operator is flattened to the *uniform* form: one
block table ``blocks_all[NB, fs, fs]`` (interior dictionary + border strips
concatenated) plus a per-pixel block-id map, so the kernel has no
border special cases and every array shards cleanly by destination rows.

Halo sizes are computed on the host from ``start_y``; geometries whose support
exceeds one neighbor band (deep downscales on small meshes) fall back to a
fully replicated source (correct, less scalable) — multi-hop halo collection
is a roadmap item (ROADMAP.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .operator import PlaneOperator


def build_uniform(op: PlaneOperator) -> tuple[np.ndarray, np.ndarray]:
    """Flatten the operator to (blocks_all[NB, fs, fs], bid[dst_h, dst_w]).

    Interior pixels index the pair dictionary; border pixels index their
    per-pixel strip blocks appended after it.
    """
    fs = op.filter_size
    n_uy, n_ux = op.pair_blocks.shape[:2]
    parts = [op.pair_blocks.reshape(-1, fs, fs)]
    bid = np.zeros((op.dst_height, op.dst_width), dtype=np.int32)
    if n_uy and n_ux:
        inter = (
            op.cy_idx[op.y_lo : op.y_hi][:, None] * n_ux
            + op.cx_idx[op.x_lo : op.x_hi][None, :]
        )
        bid[op.y_lo : op.y_hi, op.x_lo : op.x_hi] = inter
    offset = n_uy * n_ux
    for s in op.strips:
        ny, nx = s.blocks.shape[:2]
        bid[s.y0 : s.y1, s.x0 : s.x1] = offset + np.arange(ny * nx).reshape(ny, nx)
        parts.append(s.blocks.reshape(-1, fs, fs))
        offset += ny * nx
    blocks_all = (
        np.concatenate(parts, axis=0)
        if parts
        else np.zeros((1, fs, fs), dtype=np.float32)
    )
    if blocks_all.shape[0] == 0:
        blocks_all = np.zeros((1, fs, fs), dtype=np.float32)
    return blocks_all.astype(np.float32), bid


@dataclass(frozen=True)
class ShardPlan:
    """Host-computed static partitioning of one plane geometry over N devices."""

    n_devices: int
    dst_rows_per: int  # padded destination rows per device
    src_rows_per: int  # padded source rows per device
    halo_up: int  # rows received from the previous device
    halo_dn: int  # rows received from the next device
    replicate_src: bool  # fallback: support exceeds a neighbor band
    dst_pad: int
    src_pad: int


def plan_row_shard(op: PlaneOperator, n_devices: int) -> ShardPlan:
    """Compute halo sizes for an even row partition of dst and src."""
    dst_h, src_h = op.dst_height, op.src_height
    fs = op.filter_size
    td = -(-dst_h // n_devices)
    ts = -(-src_h // n_devices)
    dst_pad = td * n_devices - dst_h
    src_pad = ts * n_devices - src_h
    halo_up = 0
    halo_dn = 0
    start_y = op.start_y
    for d in range(n_devices):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        if r0 >= r1:
            continue
        lo = int(start_y[r0:r1].min())
        hi = int(start_y[r0:r1].max()) + fs
        halo_up = max(halo_up, d * ts - lo)
        halo_dn = max(halo_dn, hi - (d + 1) * ts)
    halo_up = max(halo_up, 0)
    halo_dn = max(halo_dn, 0)
    replicate = halo_up > ts or halo_dn > ts
    return ShardPlan(
        n_devices=n_devices,
        dst_rows_per=td,
        src_rows_per=ts,
        halo_up=halo_up,
        halo_dn=halo_dn,
        replicate_src=replicate,
        dst_pad=dst_pad,
        src_pad=src_pad,
    )


def _local_apply(
    band: jax.Array,  # (band_h, W) local source band (with halos)
    rows_local: jax.Array,  # (td,) local window start rows into band
    start_x: jax.Array,  # (dst_w,)
    bid_local: jax.Array,  # (td, dst_w)
    blocks_all: jax.Array,  # (NB, fs, fs)
    fs: int,
    vary_axes: tuple[str, ...] = (),
) -> jax.Array:
    band_h, W = band.shape
    NB = blocks_all.shape[0]

    def body(acc, k):
        ly = k // fs
        lx = k % fs
        rows = jnp.clip(rows_local + ly, 0, band_h - 1)
        cols = jnp.clip(start_x + lx, 0, W - 1)
        sv = band[rows[:, None], cols[None, :]]
        pane = jax.lax.dynamic_slice(blocks_all, (0, ly, lx), (NB, 1, 1))[:, 0, 0]
        wv = pane[bid_local]
        return (acc + sv * wv).astype(jnp.float32), None

    acc0 = jnp.zeros(bid_local.shape, dtype=jnp.float32)
    if vary_axes:
        # shard_map's varying-axes type system: the carry must match the
        # device-varying type of the accumulated value.
        acc0 = jax.lax.pcast(acc0, vary_axes, to="varying")
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(fs * fs, dtype=jnp.int32))
    return acc


def make_sharded_apply(
    op: PlaneOperator,
    mesh: Mesh,
    row_axis: str = "rows",
    data_axis: str | None = None,
):
    """Build a jitted sharded apply: (src [F?, src_h, src_w]) -> [F?, dst_h, dst_w].

    Returns (apply_fn, plan). ``apply_fn`` expects float32 sources; output is
    the float32 accumulator (finalize separately). With ``data_axis`` given,
    a leading frame axis is sharded over it (SpMM over the data dimension).
    """
    n = mesh.shape[row_axis]
    plan = plan_row_shard(op, n)
    fs = op.filter_size
    blocks_all, bid = build_uniform(op)

    td, ts = plan.dst_rows_per, plan.src_rows_per
    dst_h, src_h = op.dst_height, op.src_height

    bid_p = np.zeros((td * n, op.dst_width), dtype=np.int32)
    bid_p[:dst_h] = bid
    start_y_p = np.zeros(td * n, dtype=np.int32)
    start_y_p[:dst_h] = op.start_y

    blocks_d = jnp.asarray(blocks_all)
    bid_d = jnp.asarray(bid_p)
    start_y_d = jnp.asarray(start_y_p)
    start_x_d = jnp.asarray(op.start_x)

    hu, hd = plan.halo_up, plan.halo_dn
    axis = row_axis

    def shard_fn(src_local, start_y_local, bid_local, start_x, blocks):
        # src_local: (1?, ts, W); metadata rows local to this device.
        d = jax.lax.axis_index(axis)
        if plan.replicate_src:
            band = jax.lax.all_gather(src_local, axis, axis=0, tiled=True)
            base = jnp.int32(0)
        else:
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            parts = []
            if hu > 0:
                upper = jax.lax.ppermute(src_local[-hu:], axis, fwd)
                parts.append(upper)
            parts.append(src_local)
            if hd > 0:
                lower = jax.lax.ppermute(src_local[:hd], axis, bwd)
                parts.append(lower)
            band = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
            base = d * ts - hu
        rows_local = start_y_local - base
        vary = (axis,) if data_axis is None else (data_axis, axis)
        return _local_apply(
            band, rows_local, start_x, bid_local, blocks, fs, vary_axes=vary
        )

    in_specs = (P(axis, None), P(axis), P(axis, None), P(None), P(None))
    out_specs = P(axis, None)

    if data_axis is not None:
        # Frames over the data axis: vmap the per-frame shard function.
        def shard_fn_b(src_local, start_y_local, bid_local, start_x, blocks):
            f = partial(
                shard_fn,
                start_y_local=start_y_local,
                bid_local=bid_local,
                start_x=start_x,
                blocks=blocks,
            )
            return jax.vmap(f)(src_local)

        fn = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(data_axis, axis, None), P(axis), P(axis, None), P(None), P(None)),
            out_specs=P(data_axis, axis, None),
        )
    else:
        fn = jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )

    @jax.jit
    def apply_fn(src):
        src = src.astype(jnp.float32)
        batched = src.ndim == 3
        pad_rows = ts * n - src_h
        pad_cfg = [(0, pad_rows), (0, 0)]
        if batched:
            pad_cfg = [(0, 0)] + pad_cfg
        src_p = jnp.pad(src, pad_cfg)
        out = fn(src_p, start_y_d, bid_d, start_x_d, blocks_d)
        return out[..., :dst_h, :]

    return apply_fn, plan


def make_mesh(
    n_rows: int | None = None, n_data: int = 1, devices=None
) -> Mesh:
    """Create a ('data', 'rows') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_rows is None:
        n_rows = len(devices) // n_data
    devs = np.asarray(devices[: n_data * n_rows]).reshape(n_data, n_rows)
    return Mesh(devs, ("data", "rows"))
