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

Halo sizes are computed on the host from ``start_y``. Geometries whose support
exceeds one neighbor band (deep downscales) collect the halo with multi-hop
``ppermute`` chains (hop *i* ships a band *i* devices over); the source is
fully replicated via ``all_gather`` only when ``hops_up + hops_dn + 1 >=
n_devices``, where the hop chain would touch the whole mesh anyway and a
single collective is cheaper.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .operator import PlaneOperator

f32 = jnp.float32


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
    replicate_src: bool  # fallback: halo hops would cover the whole mesh
    dst_pad: int
    src_pad: int
    # ppermute hops needed to collect each halo; must stay consistent with
    # halo_up/halo_dn (0 when the halo is 0), so no defaults are provided.
    hops_up: int
    hops_dn: int


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
    # Deep downscales need halos spanning several neighbor bands: collect
    # them with hops_{up,dn} ppermute hops (ROADMAP item 7 — multi-hop halo).
    # Replicate on a BYTE break-even, not a hop count: ppermute ships
    # halo_up+halo_dn rows per device while all_gather ships the other
    # devices' (n-1)*ts rows, so replication only wins when the halos would
    # collect at least that much anyway. The former hop-count heuristic
    # (hops_up + hops_dn + 1 >= n) overfired at n=2 — any upscale has both
    # halos nonzero, so 2-device meshes ALWAYS replicated and could never
    # reach the conv interior (r4 VERDICT missing #2; measured cliff:
    # n_rows=2 landed on the scan-gather at 1092.7 ms/batch while
    # n_rows=4/8 rode conv-fused at 62-70 ms). Reference analog: adding a
    # thread never changes kernel choice (JincResize.cpp:596-598).
    hops_up = -(-halo_up // ts) if halo_up else 0
    hops_dn = -(-halo_dn // ts) if halo_dn else 0
    replicate = halo_up + halo_dn >= (n_devices - 1) * ts
    return ShardPlan(
        n_devices=n_devices,
        dst_rows_per=td,
        src_rows_per=ts,
        halo_up=halo_up,
        halo_dn=halo_dn,
        replicate_src=replicate,
        dst_pad=dst_pad,
        src_pad=src_pad,
        hops_up=hops_up,
        hops_dn=hops_dn,
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


def _patch_rows_sliced(band, sy_rows, start_x, bid_rows, blocks_all, fs):
    """Patch-row values (k, dst_w) via sliced windows.

    The r4 TPU ablation measured the fs^2-step scan-gather patches
    (_local_apply) at 1527 ms/frame on a 1-row mesh at 1080p->4K tap8 —
    200x the band kernel they accompany. This form replaces the per-element
    gathers with bulk window slices: one (fs, W) dynamic_slice per patch
    row, one (k*fs, fs) column-window slice per destination column
    (vmap-of-dynamic_slice lowers to wide-slice gathers), and one
    contiguous 289-float block gather per pixel. ~1 ms at the same config.
    """
    band_h, W = band.shape
    k = sy_rows.shape[0]
    slab = jax.vmap(
        lambda r0: jax.lax.dynamic_slice(band, (r0, 0), (fs, W))
    )(sy_rows)  # (k, fs, W)
    slab2 = slab.reshape(k * fs, W)
    G = jax.vmap(
        lambda c0: jax.lax.dynamic_slice(slab2, (0, c0), (k * fs, fs)),
        out_axes=1,
    )(start_x)  # (k*fs, dst_w, fs)
    G = G.reshape(k, fs, start_x.shape[0], fs)
    Wb = blocks_all[bid_rows]  # (k, dst_w, fs, fs)
    return jnp.einsum("kaxl,kxal->kx", G, Wb, preferred_element_type=f32)


def _patch_cols_sliced(band, sy_all, cols_sx, bid_cols, blocks_all, fs):
    """Patch-column values (rows, ncols); ``cols_sx`` are HOST-static window
    start columns, so the horizontal windows are static slices."""
    band_h, W = band.shape
    C = len(cols_sx)
    N = jnp.stack(
        [
            jax.lax.slice(band, (0, int(sx)), (band_h, int(sx) + fs))
            for sx in cols_sx
        ],
        axis=1,
    )  # (band_h, C, fs)
    N2 = N.reshape(band_h, C * fs)
    G = jax.vmap(
        lambda r0: jax.lax.dynamic_slice(N2, (r0, 0), (fs, C * fs))
    )(sy_all)  # (rows, fs, C*fs)
    G = G.reshape(sy_all.shape[0], fs, C, fs)
    Wb = blocks_all[bid_cols]  # (rows, C, fs, fs)
    return jnp.einsum("yacl,ycal->yc", G, Wb, preferred_element_type=f32)


def make_sharded_apply(
    op: PlaneOperator,
    mesh: Mesh,
    row_axis: str = "rows",
    data_axis: str | None = None,
    impl: str = "auto",
    precision: str = "fp32",
):
    """Build a jitted sharded apply: (src [F?, src_h, src_w]) -> [F?, dst_h, dst_w].

    Returns (apply_fn, plan). ``apply_fn(src, out_dtype=..., peak=...,
    float_clamp_min=...)`` runs source clamp, resample and output conversion
    (u8/u16 round/clamp — apply_xla.finalize) INSIDE the sharded jit; the
    defaults return the raw float32 accumulator. With ``data_axis`` given, a
    leading frame axis is sharded over it (SpMM over the data dimension).

    ``impl='auto'`` uses the phase-conv interior (make_sharded_apply_conv —
    zero gathers, MXU-friendly) when the geometry qualifies, else the uniform
    gather; 'conv'/'gather' force a path. ``precision`` selects the fused
    interior's MXU mode ('fp32' parity, 'bf16' documented non-parity,
    'fp32_u8src' exact for bf16-exact sources); the gather interior is pure
    fp32 regardless. ``apply_fn.info`` records which interior was compiled
    ({'interior': 'conv-fused' | 'conv-shift' | 'gather', ...}) — the sharded
    analog of JincResizer.engines.
    """
    if impl in ("auto", "conv"):
        r = make_sharded_apply_conv(op, mesh, row_axis, data_axis, precision)
        if r is not None:
            return r
        if impl == "conv":
            raise ValueError("sharded conv path: geometry not eligible")
    if impl in ("auto", "seg"):
        # Drifted rational scales: the segment-periodic MXU interior per
        # device (r4 VERDICT missing #3) — tried before the gather kernel so
        # attaching a mesh never downgrades the seg engine's parity path.
        r = make_sharded_apply_seg(op, mesh, row_axis, data_axis, precision)
        if r is not None:
            return r
        if impl == "seg":
            raise ValueError("sharded seg path: geometry not eligible")
    if impl in ("auto", "gather"):
        # Per-device Pallas gather interior (r3 VERDICT missing #3): reuses
        # kernels/pallas_gather.py the way the conv path embeds the fused
        # kernel; the fs^2-step scan-gather below remains only as the
        # fallback for geometries outside the kernel envelope.
        r = make_sharded_apply_gather(op, mesh, row_axis, data_axis)
        if r is not None:
            return r
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
            # Multi-hop halo collection: hop i ships a band i devices over;
            # the farthest hop ships only the remainder rows it contributes.
            # Wrap-around garbage at the mesh edges is never read: edge
            # devices' window starts stay inside the real source rows.
            parts = []
            for i in range(plan.hops_up, 0, -1):
                perm = [(s, (s + i) % n) for s in range(n)]
                rows = hu - (i - 1) * ts if i == plan.hops_up else ts
                parts.append(jax.lax.ppermute(src_local[-rows:], axis, perm))
            parts.append(src_local)
            for i in range(1, plan.hops_dn + 1):
                perm = [(s, (s - i) % n) for s in range(n)]
                rows = hd - (i - 1) * ts if i == plan.hops_dn else ts
                parts.append(jax.lax.ppermute(src_local[:rows], axis, perm))
            band = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
            base = d * ts - hu
        rows_local = start_y_local - base
        vary = (axis,) if data_axis is None else (data_axis, axis)
        return _local_apply(
            band, rows_local, start_x, bid_local, blocks, fs, vary_axes=vary
        )

    in_specs = (P(axis, None), P(axis), P(axis, None), P(None), P(None))
    out_specs = P(axis, None)

    # Frames vmapped INSIDE the shard: used for the data axis AND for frame
    # batches on row-only meshes — the patch/im2col gathers are INDEX-count
    # bound (a gather's cost tracks its index count, not its element count),
    # so batching frames into one call amortizes them ~F-fold (r5; the
    # per-frame-call form measured 11.3 ms/frame for the sharded seg at 1.5x
    # 1080p where the batched form approaches the single-chip applier).
    def shard_fn_b(src_local, start_y_local, bid_local, start_x, blocks):
        f = partial(
            shard_fn,
            start_y_local=start_y_local,
            bid_local=bid_local,
            start_x=start_x,
            blocks=blocks,
        )
        return jax.vmap(f)(src_local)

    if data_axis is not None:
        fn = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(data_axis, axis, None), P(axis), P(axis, None), P(None), P(None)),
            out_specs=P(data_axis, axis, None),
        )
        fn_frames = None
    else:
        fn = jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs
        )
        fn_frames = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(None, axis, None),) + in_specs[1:],
            out_specs=P(None, axis, None),
        )

    @partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
    def _jitted(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        from .apply_xla import finalize

        src = src.astype(jnp.float32)
        if float_clamp_min is not None:
            src = jnp.maximum(src, jnp.float32(float_clamp_min))
        batched = src.ndim == 3
        pad_rows = ts * n - src_h
        pad_cfg = [(0, pad_rows), (0, 0)]
        if batched:
            pad_cfg = [(0, 0)] + pad_cfg
        src_p = jnp.pad(src, pad_cfg)
        use = fn_frames if (batched and fn_frames is not None) else fn
        out = use(src_p, start_y_d, bid_d, start_x_d, blocks_d)
        return finalize(out[..., :dst_h, :], out_dtype, peak)

    def apply_fn(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return _jitted(
            src, out_dtype=out_dtype, peak=peak, float_clamp_min=float_clamp_min
        )

    apply_fn.info = {
        # Scan-gather fallback: only reached when the Pallas band kernel's
        # envelope declines (make_sharded_apply_gather) — its fs^2-step
        # element-gather scan is pathological on real TPUs and retained for
        # correctness coverage, not speed.
        "interior": "gather-scan",
        "replicate_src": plan.replicate_src,
        "hops": (plan.hops_up, plan.hops_dn),
    }
    return apply_fn, plan


# ---------------------------------------------------------------------------
# Pallas-gather sharded apply: the general-geometry kernel per device.
# ---------------------------------------------------------------------------


def make_sharded_apply_gather(
    op: PlaneOperator,
    mesh: Mesh,
    row_axis: str = "rows",
    data_axis: str | None = None,
):
    """Row-sharded apply with the Pallas gather kernel per device.

    The general-geometry analog of make_sharded_apply_conv: each device runs
    kernels/pallas_gather's band kernel on its local source band (own rows +
    collected halos); border rows/columns are patched with the uniform
    scan-gather on O(fs) rows/cols. Device-varying metadata (band-local
    window starts, row classes, kernel-band origins) rides through scalar
    prefetch; the kernel SHAPE is uniform across the mesh. Returns None when
    the kernel envelope declines (caller falls back to the scan-gather).
    """
    from .kernels import pallas_gather

    if op.pair_blocks.size == 0 or op.filter_size**2 > 1200:
        return None
    if op.x_hi <= op.x_lo or op.y_hi <= op.y_lo:
        return None
    n = mesh.shape[row_axis]
    plan = plan_row_shard(op, n)
    fs = op.filter_size
    td, ts = plan.dst_rows_per, plan.src_rows_per
    dst_h, dst_w, src_h = op.dst_height, op.dst_width, op.src_height
    hu, hd = plan.halo_up, plan.halo_dn

    rows_glob = np.minimum(np.arange(n * td), dst_h - 1)
    sy_glob = op.start_y.astype(np.int64)[rows_glob]
    cy_glob = np.clip(
        op.cy_idx[rows_glob].astype(np.int64), 0, op.pair_blocks.shape[0] - 1
    )
    if plan.replicate_src:
        band_h = ts * n
        base = np.zeros(n, dtype=np.int64)
    else:
        band_h = ts + hu + hd
        base = np.arange(n, dtype=np.int64) * ts - hu
    sy_loc = sy_glob.reshape(n, td) - base[:, None]
    if sy_loc.min() < 0 or int((sy_loc + fs).max()) > band_h:
        return None  # plan_row_shard guarantees this; defensive
    backend_tpu = all(d.platform == "tpu" for d in np.asarray(mesh.devices).flat)
    try:
        kfn, kmeta = pallas_gather.make_gather_band(
            op, sy_loc, band_h, interpret=not backend_tpu
        )
    except ValueError:
        return None
    tm, nb, td_pad = kmeta["tm"], kmeta["nb"], kmeta["n_rows_pad"]
    nxi, nxi_pad = kmeta["nxi"], kmeta["nxi_pad"]

    if td_pad > td:
        pad = np.repeat(sy_loc[:, -1:], td_pad - td, axis=1)
        sy_loc = np.concatenate([sy_loc, pad], axis=1)
        cy_loc = np.concatenate(
            [cy_glob.reshape(n, td)]
            + [np.repeat(cy_glob.reshape(n, td)[:, -1:], td_pad - td, axis=1)],
            axis=1,
        )
    else:
        cy_loc = cy_glob.reshape(n, td)
    y0 = np.zeros((n, nb), dtype=np.int64)
    for b in range(nb):
        y0[:, b] = sy_loc[:, b * tm : (b + 1) * tm].min(axis=1)
    syloc_rel = sy_loc - np.repeat(y0, tm, axis=1)
    assert int((syloc_rel + fs).max()) <= kmeta["bh"]

    # Expanded class planes: computed on device once, passed as an argument
    # (P(None)) so the sharded jit never embeds the n_ux-fold table.
    expand, wt, nxi_pad_w, _fs2p = pallas_gather.expand_weight_planes(op)
    assert nxi_pad_w == nxi_pad
    wx = expand(wt)

    # Patch metadata (border rows per device, border columns everywhere) —
    # same mechanism as the conv path's strip patches.
    blocks_all, bid = build_uniform(op)
    patch_rows_per_dev = []
    for d in range(n):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        rows = [r for r in range(r0, r1) if r < op.y_lo or r >= op.y_hi]
        patch_rows_per_dev.append(rows)
    k_max = max(1, max(len(r) for r in patch_rows_per_dev))
    idx_rows = np.zeros((n, k_max), dtype=np.int32)
    for d, rows in enumerate(patch_rows_per_dev):
        fill = rows if rows else [min(d * td, dst_h - 1)]
        for k in range(k_max):
            idx_rows[d, k] = fill[k] if k < len(fill) else fill[-1]
    cols = sorted(set(range(0, op.x_lo)) | set(range(op.x_hi, dst_w)))
    cols_np = np.asarray(cols if cols else [0], dtype=np.int32)
    cols_sx = [int(v) for v in op.start_x[cols_np]]  # host-static col starts

    start_y_p = np.zeros(td * n, dtype=np.int32)
    start_y_p[: dst_h] = op.start_y
    start_y_p[dst_h:] = op.start_y[dst_h - 1]
    bid_p = np.zeros((td * n, dst_w), dtype=np.int32)
    bid_p[:dst_h] = bid

    blocks_d = jnp.asarray(blocks_all)
    start_x_d = jnp.asarray(op.start_x)
    start_x_cols = jnp.asarray(op.start_x[cols_np])
    bid_cols_d = jnp.asarray(bid_p[:, cols_np])
    start_y_d = jnp.asarray(start_y_p)
    idx_rows_d = jnp.asarray(idx_rows.reshape(n * k_max))
    sy_rows_d = jnp.asarray(op.start_y[np.minimum(idx_rows.reshape(-1), dst_h - 1)])
    bid_rows_d = jnp.asarray(bid[np.minimum(idx_rows.reshape(-1), dst_h - 1)])
    syloc_d = jnp.asarray(syloc_rel.reshape(-1).astype(np.int32))
    cy_d = jnp.asarray(cy_loc.reshape(-1).astype(np.int32))
    y0_d = jnp.asarray(y0.reshape(-1).astype(np.int32))
    cols_j = jnp.asarray(cols_np)
    axis = row_axis
    xlo = op.x_lo

    def shard_fn(
        src_local,  # (ts, W)
        syloc_l,  # (td_pad,)
        cy_l,  # (td_pad,)
        y0_l,  # (nb,)
        start_y_local,  # (td,)
        bid_cols_local,  # (td, ncols)
        idx_rows_local,  # (k_max,)
        sy_rows_local,  # (k_max,)
        bid_rows_local,  # (k_max, dst_w)
        start_x,
        start_x_c,
        blocks,
        wxp,
    ):
        d = jax.lax.axis_index(axis)
        if plan.replicate_src:
            band = jax.lax.all_gather(src_local, axis, axis=0, tiled=True)
            base_l = jnp.int32(0)
        else:
            parts = []
            for i in range(plan.hops_up, 0, -1):
                perm = [(s, (s + i) % n) for s in range(n)]
                rows = hu - (i - 1) * ts if i == plan.hops_up else ts
                parts.append(jax.lax.ppermute(src_local[-rows:], axis, perm))
            parts.append(src_local)
            for i in range(1, plan.hops_dn + 1):
                perm = [(s, (s - i) % n) for s in range(n)]
                rows = hd - (i - 1) * ts if i == plan.hops_dn else ts
                parts.append(jax.lax.ppermute(src_local[:rows], axis, perm))
            band = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
            base_l = d * ts - hu

        interior = kfn(band, syloc_l, cy_l, y0_l, wxp)  # (td_pad, nxi_pad)
        canvas = jnp.zeros((td, dst_w), dtype=f32)
        canvas = jax.lax.dynamic_update_slice(
            canvas, interior[:td, :nxi], (0, xlo)
        )
        del start_x_c  # window starts of the patch columns are host-static
        vals_r = _patch_rows_sliced(
            band, sy_rows_local - base_l, start_x, bid_rows_local, blocks, fs
        )
        canvas = canvas.at[idx_rows_local - d * td].set(vals_r)
        vals_c = _patch_cols_sliced(
            band, start_y_local - base_l, cols_sx, bid_cols_local, blocks, fs
        )
        canvas = canvas.at[:, cols_j].set(vals_c)
        return canvas

    in_specs = (
        P(axis, None),
        P(axis),
        P(axis),
        P(axis),
        P(axis),
        P(axis, None),
        P(axis),
        P(axis),
        P(axis, None),
        P(None),
        P(None),
        P(None),
        P(None),
    )
    def shard_fn_b(src_local, *rest):
        return jax.vmap(lambda s: shard_fn(s, *rest))(src_local)

    if data_axis is not None:
        fn = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(data_axis, axis, None),) + in_specs[1:],
            out_specs=P(data_axis, axis, None),
            check_vma=False,
        )
        fn_frames = None
    else:
        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis, None),
            check_vma=False,
        )
        # Frame batches on a row-only mesh: vmap INSIDE the shard so the
        # index-bound patch/im2col gathers amortize over the batch (r5).
        fn_frames = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(None, axis, None),) + in_specs[1:],
            out_specs=P(None, axis, None),
            check_vma=False,
        )

    @partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
    def _jitted(src, wxp, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        from .apply_xla import finalize

        src = src.astype(f32)
        if float_clamp_min is not None:
            src = jnp.maximum(src, jnp.float32(float_clamp_min))
        batched = src.ndim == 3
        pad_rows = ts * n - src_h
        pad_cfg = [(0, pad_rows), (0, 0)]
        if batched:
            pad_cfg = [(0, 0)] + pad_cfg
        src_p = jnp.pad(src, pad_cfg)
        use = fn_frames if (batched and fn_frames is not None) else fn
        out = use(
            src_p,
            syloc_d,
            cy_d,
            y0_d,
            start_y_d,
            bid_cols_d,
            idx_rows_d,
            sy_rows_d,
            bid_rows_d,
            start_x_d,
            start_x_cols,
            blocks_d,
            wxp,
        )
        return finalize(out[..., :dst_h, :], out_dtype, peak)

    def apply_fn(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return _jitted(
            src, wx, out_dtype=out_dtype, peak=peak, float_clamp_min=float_clamp_min
        )

    apply_fn.info = {
        "interior": "gather",
        "tiles": kfn.tile_info,
        "replicate_src": plan.replicate_src,
        "hops": (plan.hops_up, plan.hops_dn),
    }
    return apply_fn, plan


# ---------------------------------------------------------------------------
# Segment-periodic sharded apply: the drifted-parity MXU interior per device.
# ---------------------------------------------------------------------------


def make_sharded_apply_seg(
    op: PlaneOperator,
    mesh: Mesh,
    row_axis: str = "rows",
    data_axis: str | None = None,
    precision: str = "fp32",
):
    """Row-sharded apply with the segment-periodic fused interior per device.

    r4 VERDICT missing #3: drifted rational scales on a mesh previously took
    the per-device gather kernel, silently downgrading the seg engine's MXU
    parity path the moment a mesh was attached (reference analog: the same
    per-geometry speed regardless of threading, resize_plane_avx512.cpp:
    97-114). The r5 banded seg interior makes the embedding cheap: every
    band's (weight slab, source row offset) rides the scalar-prefetched
    ``rowmeta`` operand, so per-DEVICE variation is a sharded rowmeta array
    while the deduplicated weight slabs stay replicated (device-invariant) —
    one uniform kernel shape across the mesh.

    Returns None when the geometry has no seg structure or falls outside the
    kernel envelope / halo constraints (caller falls through to gather).
    """
    from .kernels import pallas_fused_seg as pfs
    from .phase import plan_phases_seg

    plan = plan_phases_seg(op)
    if plan is None:
        return None
    L = pfs._layout(op, plan)
    if L is None:
        return None

    n = mesh.shape[row_axis]
    fs = op.filter_size
    py, qy = plan.y.p, plan.y.q
    px = plan.x.p
    nyb, nxb = plan.y.nblocks, plan.x.nblocks
    ylo, xlo = plan.y.lo, plan.x.lo
    yhi, xhi = ylo + py * nyb, xlo + px * nxb
    dst_h, dst_w, src_h = op.dst_height, op.dst_width, op.src_height
    tmo, tmb, mt = L["tmo"], L["tmb"], L["mt"]
    hbu_p = L["hbu_p"]
    slab_of_band = L["slab_of_band"]
    base_y = plan.y.base
    ay = base_y // 8 * 8
    ry0 = base_y - ay
    hb = -(-(ry0 + hbu_p) // 8) * 8

    td = -(-dst_h // n)
    # Source rows per device rounded to the sublane so every device's band
    # start is 8-aligned — the kernel's in-band row offset (ry0) is static,
    # so all scalar-prefetched source offsets must share ay's alignment.
    ts8 = -(-(-(-src_h // n)) // 8) * 8
    if td < tmo or ylo > tmo or nyb < 3:
        return None

    # Band range per device + uniform band count.
    b0 = np.zeros(n, dtype=np.int64)
    b1 = np.zeros(n, dtype=np.int64)
    for d in range(n):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        if r0 >= r1:
            b0[d], b1[d] = mt - 1, mt
            continue
        b0[d] = min(max((r0 - ylo) // tmo, 0), mt - 1)
        b1[d] = min(max(-(-(r1 - ylo) // tmo), b0[d] + 1), mt)
    nb_l = int((b1 - b0).max())

    # Halos: seg band reads + the generic patch-row reads, both covered.
    halo_up = halo_dn = 0
    start_y = op.start_y
    for d in range(n):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        if r0 < r1:
            lo = int(start_y[r0:r1].min())
            hi = int(start_y[r0:r1].max()) + fs
            halo_up = max(halo_up, d * ts8 - lo)
            halo_dn = max(halo_dn, hi - (d + 1) * ts8)
        blast = min(b0[d] + nb_l - 1, mt - 1)
        halo_up = max(halo_up, d * ts8 - (ay + qy * tmb * int(b0[d])))
        halo_dn = max(
            halo_dn, ay + qy * tmb * int(blast) + hb - (d + 1) * ts8
        )
    hu = -(-max(halo_up, 0) // 8) * 8
    hd = max(halo_dn, 0)
    if hu > ts8 or hd > ts8:
        return None  # deep halos: fall through to the gather/scan paths

    band_rows = hu + ts8 + hd
    ext_local = 0
    for d in range(n):
        blast = min(b0[d] + nb_l - 1, mt - 1)
        ext_local = max(
            ext_local, ay + qy * tmb * int(blast) + hb - (d * ts8 - hu)
        )
    ext_local = max(ext_local, band_rows)

    backend_tpu = all(d.platform == "tpu" for d in np.asarray(mesh.devices).flat)
    kernel_prec = {
        "bf16": "default",
        "fp32_u8src": "wsplit3_vmem",
        "fp32": "highest",
    }[precision]
    try:
        ifn = pfs.make_seg_interior(
            op,
            plan,
            precision=kernel_prec,
            interpret=not backend_tpu,
            grid_len=nb_l,
            rows_out=nb_l * tmo,
            ext_rows=ext_local,
        )
    except ValueError:
        return None
    w_ch, sel_ch, _default_rowmeta = ifn.params

    # Per-device rowmeta: [slab id, band-local source row offset, paste row].
    dst0 = np.zeros(n, dtype=np.int64)
    rowmeta = np.zeros((n, nb_l, 3), dtype=np.int32)
    for d in range(n):
        dst0[d] = ylo + tmo * int(b0[d]) - d * td
        for i in range(nb_l):
            b = min(int(b0[d]) + i, mt - 1)
            loff = ay + qy * tmb * b - (d * ts8 - hu)
            if loff < 0 or loff % 8:
                return None  # defensive; halo/alignment math guarantees this
            rowmeta[d, i, 0] = slab_of_band[b]
            # Sublane units: the kernel's src index map multiplies by 8 so
            # Mosaic can prove the row offset divides the (8, 128) tiling.
            rowmeta[d, i, 1] = loff // 8
    P0 = int(max(0, -dst0.min()))
    ext_h = int(max(P0 + td, (dst0 + P0).max() + nb_l * tmo))
    rowmeta[:, :, 2] = (dst0 + P0)[:, None]

    # Patch metadata: border/exception rows per device, border/exception
    # columns everywhere — same machinery as the conv path.
    blocks_all, bid = build_uniform(op)
    exc_y = set(int(v) for v in plan.y.exceptions)
    patch_rows_per_dev = []
    for d in range(n):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        rows = [r for r in range(r0, r1) if r < ylo or r >= yhi or r in exc_y]
        patch_rows_per_dev.append(rows)
    k_max = max(1, max(len(r) for r in patch_rows_per_dev))
    idx_rows = np.zeros((n, k_max), dtype=np.int32)
    for d, rows in enumerate(patch_rows_per_dev):
        fill = rows if rows else [min(d * td, dst_h - 1)]
        for k in range(k_max):
            idx_rows[d, k] = fill[k] if k < len(fill) else fill[-1]
    cols = sorted(
        set(range(0, xlo))
        | set(range(xhi, dst_w))
        | set(int(v) for v in plan.x.exceptions)
    )
    cols_np = np.asarray(cols if cols else [0], dtype=np.int32)
    cols_sx = [int(v) for v in op.start_x[cols_np]]

    start_y_p = np.zeros(td * n, dtype=np.int32)
    start_y_p[:dst_h] = op.start_y
    bid_p = np.zeros((td * n, dst_w), dtype=np.int32)
    bid_p[:dst_h] = bid

    blocks_d = jnp.asarray(blocks_all)
    start_x_d = jnp.asarray(op.start_x)
    bid_cols_d = jnp.asarray(bid_p[:, cols_np])
    start_y_d = jnp.asarray(start_y_p)
    idx_rows_d = jnp.asarray(idx_rows.reshape(n * k_max))
    sy_rows_d = jnp.asarray(op.start_y[np.minimum(idx_rows.reshape(-1), dst_h - 1)])
    bid_rows_d = jnp.asarray(bid[np.minimum(idx_rows.reshape(-1), dst_h - 1)])
    rowmeta_d = jnp.asarray(rowmeta.reshape(n * nb_l, 3))
    cols_j = jnp.asarray(cols_np)
    axis = row_axis

    def shard_fn(
        src_local,  # (ts8, W)
        rowmeta_l,  # (nb_l, 3)
        start_y_local,  # (td,)
        bid_cols_local,  # (td, ncols)
        idx_rows_local,  # (k_max,)
        sy_rows_local,  # (k_max,)
        bid_rows_local,  # (k_max, dst_w)
        start_x,
        blocks,
        wparams,  # (w_chunks, sel_chunks) — replicated
    ):
        d = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        parts = []
        if hu > 0:
            parts.append(jax.lax.ppermute(src_local[-hu:], axis, fwd))
        parts.append(src_local)
        if hd > 0:
            parts.append(jax.lax.ppermute(src_local[:hd], axis, bwd))
        band = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
        band_start = d * ts8 - hu

        wc, sc = wparams
        interior = ifn(band, (wc, sc, rowmeta_l[:, :2]))  # (nb_l*tmo, xw)
        paste_o = rowmeta_l[0, 2]
        canvas = jnp.zeros((ext_h, dst_w), dtype=f32)
        canvas = jax.lax.dynamic_update_slice(canvas, interior, (paste_o, xlo))
        canvas = jax.lax.slice(canvas, (P0, 0), (P0 + td, dst_w))

        vals_r = _patch_rows_sliced(
            band, sy_rows_local - band_start, start_x, bid_rows_local, blocks, fs
        )
        canvas = canvas.at[idx_rows_local - d * td].set(vals_r)
        vals_c = _patch_cols_sliced(
            band, start_y_local - band_start, cols_sx, bid_cols_local, blocks, fs
        )
        canvas = canvas.at[:, cols_j].set(vals_c)
        return canvas

    in_specs = (
        P(axis, None),
        P(axis, None),
        P(axis),
        P(axis, None),
        P(axis),
        P(axis),
        P(axis, None),
        P(None),
        P(None),
        P(None),  # pytree-prefix spec for (w_chunks, sel_chunks)
    )

    def shard_fn_b(src_local, *rest):
        return jax.vmap(lambda s: shard_fn(s, *rest))(src_local)

    if data_axis is not None:
        fn = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(data_axis, axis, None),) + in_specs[1:],
            out_specs=P(data_axis, axis, None),
            check_vma=False,
        )
        fn_frames = None
    else:
        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis, None),
            check_vma=False,
        )
        # Frame batches on a row-only mesh: vmap INSIDE the shard so the
        # index-bound patch/im2col gathers amortize over the batch (r5).
        fn_frames = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(None, axis, None),) + in_specs[1:],
            out_specs=P(None, axis, None),
            check_vma=False,
        )

    @partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
    def _jitted(
        src, wparams, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        from .apply_xla import finalize

        src = src.astype(f32)
        if float_clamp_min is not None:
            src = jnp.maximum(src, jnp.float32(float_clamp_min))
        batched = src.ndim == 3
        pad_rows = ts8 * n - src_h
        pad_cfg = [(0, pad_rows), (0, 0)]
        if batched:
            pad_cfg = [(0, 0)] + pad_cfg
        src_p = jnp.pad(src, pad_cfg)
        use = fn_frames if (batched and fn_frames is not None) else fn
        out = use(
            src_p,
            rowmeta_d,
            start_y_d,
            bid_cols_d,
            idx_rows_d,
            sy_rows_d,
            bid_rows_d,
            start_x_d,
            blocks_d,
            wparams,
        )
        return finalize(out[..., :dst_h, :], out_dtype, peak)

    def apply_fn(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return _jitted(
            src,
            (w_ch, sel_ch),
            out_dtype=out_dtype,
            peak=peak,
            float_clamp_min=float_clamp_min,
        )

    apply_fn.info = {
        "interior": "seg",
        "precision": precision,
        "tiles": ifn.tile_info,
        "replicate_src": False,
        "hops": (1 if hu > 0 else 0, 1 if hd > 0 else 0),
        "nb_l": nb_l,
    }
    # Benchers must pass the weight chunks as jit arguments (tunnel
    # compile-payload limit); expose them like the single-chip appliers do.
    apply_fn.params = (w_ch, sel_ch)
    apply_fn._apply = _jitted
    # ShardPlan-compatible summary for callers that inspect halos.
    splan = plan_row_shard(op, n)
    return apply_fn, splan


# ---------------------------------------------------------------------------
# Phase-conv sharded apply: MXU-native interior per device + thin patches.
# ---------------------------------------------------------------------------


def _shift_interior(seg, K_np, py, px, qy, qx, nyb_l, nxb, base_x, fs, offs_y, offs_x):
    """Shift-sum phase interior on a local (seg_h, W_pad) segment.

    Identical math to apply_conv.apply_plane_conv's interior, but row-local:
    the caller has already dynamic-sliced ``seg`` so block 0's window starts
    at row 0. Returns (py*nyb_l, px*nxb) in destination layout.
    """
    Kh, Kw = K_np.shape[2], K_np.shape[3]
    nphase = py * px
    K = jnp.asarray(K_np[:, 0])  # (nphase, Kh, Kw)
    eh = (nyb_l - 1) * qy + Kh
    ew = (nxb - 1) * qx + Kw
    lhs = jax.lax.dynamic_slice(seg, (0, base_x), (eh, ew))

    def window(a, b):
        return jax.lax.slice(
            lhs,
            (a, b),
            (a + (nyb_l - 1) * qy + 1, b + (nxb - 1) * qx + 1),
            (qy, qx),
        )

    groups: dict[tuple[int, int], list[int]] = {}
    for p in range(nphase):
        ry, rx = divmod(p, px)
        groups.setdefault((int(offs_y[ry]), int(offs_x[rx])), []).append(p)
    parts = [None] * nphase
    for (oy, ox), ps in groups.items():
        Kg = K[jnp.asarray(ps)][:, oy : oy + fs, ox : ox + fs]
        acc_g = jnp.zeros((len(ps), nyb_l, nxb), dtype=f32)
        for a in range(fs):
            for b in range(fs):
                acc_g = acc_g + Kg[:, a, b][:, None, None] * window(oy + a, ox + b)[
                    None
                ]
        for i, p in enumerate(ps):
            parts[p] = acc_g[i]
    conv = jnp.stack(parts, axis=0)
    return (
        conv.reshape(py, px, nyb_l, nxb)
        .transpose(2, 0, 3, 1)
        .reshape(py * nyb_l, px * nxb)
    )


def make_sharded_apply_conv(
    op: PlaneOperator,
    mesh: Mesh,
    row_axis: str = "rows",
    data_axis: str | None = None,
    precision: str = "fp32",
):
    """Phase-conv sharded apply; None if the geometry doesn't qualify.

    Per device: ppermute halo exchange -> dynamic-slice the local band at the
    first (possibly straddling) phase-block boundary -> static shift-sum
    interior in dst layout -> paste at a traced offset -> patch border strips,
    exception rows and exception/border columns with the uniform gather.
    The interior does zero gathers; patches touch O(fs) rows/cols.

    This is the multi-chip analog of apply_conv (SURVEY.md §2 parallelism
    table: row partitioning with tap-width halo over ICI); the reference has
    no distributed mode at all.
    """
    from .phase import build_conv_kernels, plan_phases

    pplan = plan_phases(op)
    if pplan is None:
        return None
    n = mesh.shape[row_axis]
    splan = plan_row_shard(op, n)
    if splan.replicate_src:
        return None

    fs = op.filter_size
    py, px = pplan.y.p, pplan.x.p
    qy, qx = pplan.y.q, pplan.x.q
    nyb, nxb = pplan.y.nblocks, pplan.x.nblocks
    offs_y = pplan.y.offsets.astype(int)
    offs_x = pplan.x.offsets.astype(int)
    spread_y = int(offs_y.max())
    base_y, base_x = pplan.y.base, pplan.x.base
    ylo, xlo = pplan.y.lo, pplan.x.lo
    yhi = ylo + py * nyb
    xhi = xlo + px * nxb
    dst_h, dst_w, src_h = op.dst_height, op.dst_width, op.src_height
    td, ts = splan.dst_rows_per, splan.src_rows_per

    # Guards: device 0 must own the whole top border, the interior must be
    # tall enough for the straddling-block slack.
    if td < max(ylo, py, fs) or nyb < 3:
        return None

    # Halo with extra margin so the straddler block's window start is >= 0.
    hu = splan.halo_up + spread_y + qy
    hd = splan.halo_dn + spread_y + qy
    if hu > ts or hd > ts:
        return None

    K_np = build_conv_kernels(op, pplan)
    Kw = K_np.shape[3]
    nyb_l = td // py + 2  # blocks computed per device (covers straddlers)
    seg_h = qy * (nyb_l - 1) + spread_y + fs
    ew_req = base_x + (nxb - 1) * qx + Kw  # columns the interior reads

    # Local interior engine: the fused Pallas kernel (kernels/pallas_fused)
    # on a shifted local plan — seg is dynamic-sliced so block 0's window
    # starts at row 0, making the kernel's placement static. Falls back to
    # the XLA shift-sum for unsupported geometries / non-TPU meshes run
    # the kernel in interpret mode.
    ifn_local = None
    try:
        from .kernels import pallas_fused
        from .phase import AxisPhasePlan, PhasePlan

        y = pplan.y
        y_local = AxisPhasePlan(
            lo=0,
            hi=py * nyb_l,
            p=y.p,
            q=y.q,
            anchor_start=y.anchor_start - y.base,
            anchor_cls=y.anchor_cls,
            exceptions=np.zeros(0, dtype=np.int64),
            nblocks=nyb_l,
        )
        plan_local = PhasePlan(x=pplan.x, y=y_local)
        if pallas_fused.is_supported(op, plan_local):
            backend_tpu = all(
                d.platform == "tpu" for d in np.asarray(mesh.devices).flat
            )
            import os as _os

            # Same precision->kernel mapping as apply_conv.ConvApplier:
            # fp32 = HIGHEST 6-pass parity dots, bf16 = 1-pass fast mode,
            # fp32_u8src = 3-pass weight-split (exact for bf16-exact sources).
            kernel_prec = {
                "bf16": "default",
                "fp32_u8src": "wsplit3",
                "fp32": _os.environ.get("JINCRESIZE_FUSED_PRECISION", "highest"),
            }[precision]
            ifn_local = pallas_fused.make_fused_interior(
                op,
                plan_local,
                precision=kernel_prec,
                interpret=not backend_tpu,
            )
    except Exception as e:  # defensive: the shift-sum interior still works
        import warnings

        warnings.warn(
            f"sharded fused interior unavailable, using shift-sum: {e!r}",
            RuntimeWarning,
            stacklevel=2,
        )
        ifn_local = None

    blocks_all, bid = build_uniform(op)

    # Patch rows per device: strips + y-exceptions owned by each device.
    exc_y = set(int(v) for v in pplan.y.exceptions)
    patch_rows_per_dev = []
    for d in range(n):
        r0, r1 = d * td, min((d + 1) * td, dst_h)
        rows = [r for r in range(r0, r1) if r < ylo or r >= yhi or r in exc_y]
        patch_rows_per_dev.append(rows)
    k_max = max(1, max(len(r) for r in patch_rows_per_dev))
    idx_rows = np.zeros((n, k_max), dtype=np.int32)
    for d, rows in enumerate(patch_rows_per_dev):
        fill = rows if rows else [min(d * td, dst_h - 1)]
        for k in range(k_max):
            idx_rows[d, k] = fill[k] if k < len(fill) else fill[-1]

    # Patch columns (same set on every device): border + x-exceptions.
    cols = sorted(
        set(range(0, xlo))
        | set(range(xhi, dst_w))
        | set(int(v) for v in pplan.x.exceptions)
    )
    cols_np = np.asarray(cols if cols else [0], dtype=np.int32)
    cols_sx = [int(v) for v in op.start_x[cols_np]]  # host-static col starts

    start_y_p = np.zeros(td * n, dtype=np.int32)
    start_y_p[:dst_h] = op.start_y
    bid_p = np.zeros((td * n, dst_w), dtype=np.int32)
    bid_p[:dst_h] = bid

    blocks_d = jnp.asarray(blocks_all)
    start_x_d = jnp.asarray(op.start_x)
    start_x_cols = jnp.asarray(op.start_x[cols_np])
    bid_cols_d = jnp.asarray(bid_p[:, cols_np])  # (td*n, ncols)
    start_y_d = jnp.asarray(start_y_p)  # (td*n,)
    idx_rows_d = jnp.asarray(idx_rows.reshape(n * k_max))  # shard by rows
    sy_rows_d = jnp.asarray(op.start_y[idx_rows.reshape(-1)])
    bid_rows_d = jnp.asarray(bid[idx_rows.reshape(-1)])  # (n*k_max, dst_w)

    ext_h = td + ylo + py * (nyb_l + 2)
    cols_j = jnp.asarray(cols_np)
    axis = row_axis

    def shard_fn(
        src_local,  # (ts, W)
        start_y_local,  # (td,)
        bid_cols_local,  # (td, ncols)
        idx_rows_local,  # (k_max,)
        sy_rows_local,  # (k_max,)
        bid_rows_local,  # (k_max, dst_w)
        start_x,
        start_x_c,
        blocks,
    ):
        d = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        parts = []
        if hu > 0:
            parts.append(jax.lax.ppermute(src_local[-hu:], axis, fwd))
        parts.append(src_local)
        if hd > 0:
            parts.append(jax.lax.ppermute(src_local[:hd], axis, bwd))
        band = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src_local
        band_start = d * ts - hu

        # Interior: dynamic-slice the segment at the straddler block, then
        # everything below is static.
        bi0 = jnp.maximum(0, (d * td - ylo) // py)
        pad_w = max(0, ew_req - band.shape[1])
        band_p = jnp.pad(band, ((0, seg_h), (0, pad_w)))
        seg_off = base_y + qy * bi0 - band_start
        seg = jax.lax.dynamic_slice(
            band_p, (seg_off, 0), (seg_h, band.shape[1] + pad_w)
        )
        if ifn_local is not None:
            block = ifn_local(seg)
        else:
            block = _shift_interior(
                seg, K_np, py, px, qy, qx, nyb_l, nxb, base_x, fs, offs_y, offs_x
            )

        canvas = jnp.zeros((ext_h, dst_w), dtype=f32)
        paste_o = ylo + py * bi0 - d * td + py
        canvas = jax.lax.dynamic_update_slice(
            canvas,
            block[: ext_h - py, :],
            (paste_o, xlo),
        )
        canvas = jax.lax.slice(canvas, (py, 0), (py + td, dst_w))

        del start_x_c  # window starts of the patch columns are host-static
        # Patch rows (strips + y-exceptions) and columns (strips +
        # x-exceptions): sliced-window forms — the fs^2-step scan-gather
        # previously here measured 1527 ms/frame on real TPUs (r4 ablation).
        vals_r = _patch_rows_sliced(
            band, sy_rows_local - band_start, start_x, bid_rows_local, blocks, fs
        )
        canvas = canvas.at[idx_rows_local - d * td].set(vals_r)
        vals_c = _patch_cols_sliced(
            band, start_y_local - band_start, cols_sx, bid_cols_local, blocks, fs
        )
        canvas = canvas.at[:, cols_j].set(vals_c)
        return canvas

    in_specs = (
        P(axis, None),
        P(axis),
        P(axis, None),
        P(axis),
        P(axis),
        P(axis, None),
        P(None),
        P(None),
        P(None),
    )

    def shard_fn_b(src_local, *rest):
        return jax.vmap(lambda s: shard_fn(s, *rest))(src_local)

    # check_vma=False: the fused interior's pallas_call out_shape carries
    # no varying-mesh-axes annotation (it's built outside the shard_map).
    if data_axis is not None:
        fn = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(data_axis, axis, None),) + in_specs[1:],
            out_specs=P(data_axis, axis, None),
            check_vma=False,
        )
        fn_frames = None
    else:
        fn = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis, None),
            check_vma=False,
        )
        # Frame batches on a row-only mesh: vmap INSIDE the shard so the
        # index-bound patch/im2col gathers amortize over the batch (r5).
        fn_frames = jax.shard_map(
            shard_fn_b,
            mesh=mesh,
            in_specs=(P(None, axis, None),) + in_specs[1:],
            out_specs=P(None, axis, None),
            check_vma=False,
        )

    @partial(jax.jit, static_argnames=("out_dtype", "peak", "float_clamp_min"))
    def _jitted(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        from .apply_xla import finalize

        src = src.astype(f32)
        if float_clamp_min is not None:
            src = jnp.maximum(src, jnp.float32(float_clamp_min))
        batched = src.ndim == 3
        pad_rows = ts * n - src_h
        pad_cfg = [(0, pad_rows), (0, 0)]
        if batched:
            pad_cfg = [(0, 0)] + pad_cfg
        src_p = jnp.pad(src, pad_cfg)
        use = fn_frames if (batched and fn_frames is not None) else fn
        out = use(
            src_p,
            start_y_d,
            bid_cols_d,
            idx_rows_d,
            sy_rows_d,
            bid_rows_d,
            start_x_d,
            start_x_cols,
            blocks_d,
        )
        return finalize(out[..., :dst_h, :], out_dtype, peak)

    def apply_fn(src, out_dtype=jnp.float32, peak=None, float_clamp_min=None):
        return _jitted(
            src, out_dtype=out_dtype, peak=peak, float_clamp_min=float_clamp_min
        )

    apply_fn.info = {
        "interior": "conv-fused" if ifn_local is not None else "conv-shift",
        "precision": precision if ifn_local is not None else "fp32",
        "replicate_src": False,
        "hops": (1 if hu > 0 else 0, 1 if hd > 0 else 0),
    }
    return apply_fn, splan


class ShardedApplier:
    """Multi-chip applier: row-sharded resample with in-jit output conversion.

    Interface-compatible with apply_conv.ConvApplier / apply_gather.
    GatherApplier so ``JincResizer`` can route planes through a device mesh
    (``impl='sharded'`` / ``mesh=...``): call with (H, W) or (F, H, W)
    sources and output dtype/peak/clamp; everything — source clamp, halo
    exchange, interior, border patches, u8/u16 round/clamp — runs inside one
    sharded jit. Frame batches shard over the mesh's ``data`` axis when
    present (padded up to a multiple of its size), rows always shard over
    ``rows``.

    ``self.interior`` reports which interior was compiled ('conv-fused',
    'conv-shift' or 'gather') — mesh-run observability (VERDICT r2 weak #3).
    """

    def __init__(
        self,
        op: PlaneOperator,
        mesh: Mesh,
        precision: str = "fp32",
        impl: str = "auto",
    ):
        if "rows" not in mesh.axis_names:
            raise ValueError("ShardedApplier: mesh needs a 'rows' axis")
        self.op = op
        self.mesh = mesh
        self._fn_single, self.plan = make_sharded_apply(
            op, mesh, impl=impl, precision=precision
        )
        self._fn_batch = None
        self._n_data = 1
        if "data" in mesh.axis_names:
            self._fn_batch, _ = make_sharded_apply(
                op, mesh, data_axis="data", impl=impl, precision=precision
            )
            self._n_data = mesh.shape["data"]
        self.info = dict(self._fn_single.info)
        self.interior = self.info["interior"]
        self.effective_precision = self.info.get("precision", "fp32")

    def __call__(
        self, src, out_dtype=jnp.float32, peak=None, float_clamp_min=None
    ):
        kw = dict(out_dtype=out_dtype, peak=peak, float_clamp_min=float_clamp_min)
        if src.ndim == 2:
            return self._fn_single(src, **kw)
        if self._fn_batch is None:
            # Row-only mesh: the makers vmap frames INSIDE the shard (r5) —
            # one call for the whole batch amortizes the index-bound patch
            # gathers, where per-frame calls paid them F times.
            return self._fn_single(src, **kw)
        F = src.shape[0]
        pad = -F % self._n_data
        if pad:
            src = jnp.concatenate([src, jnp.repeat(src[-1:], pad, axis=0)])
        out = self._fn_batch(src, **kw)
        return out[:F] if pad else out


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
