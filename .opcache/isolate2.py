"""On-device-loop isolation round 2: E hoisting, no-staging dots."""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jincresize_tpu.cache import cached_build
from jincresize_tpu.operator import build_plane_operator, radius_for_tap
from jincresize_tpu.phase import plan_phases
from jincresize_tpu.kernels import pallas_fused as PF

f32 = jnp.float32
F = 8
R = 10
sw, sh, dw, dh = 3840, 2160, 7680, 4320
src = jnp.asarray(np.random.default_rng(0).random((F, sh, sw), dtype=np.float32))
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
ref_sum = None

def timeit_loop(name, body):
    @jax.jit
    def looped(s):
        def it(i, acc):
            return acc + body(s + i * 1e-9)
        return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
    try:
        float(looped(src))
    except Exception as e:
        print(f"{name:44s} FAIL: {str(e)[:110]}")
        return
    t0 = time.time()
    v = float(looped(src))
    dt = (time.time() - t0) / R
    print(f"{name:44s} {dt*1e3/F:7.3f} ms/frame  sum={v:.6e}")

orig_kernel = PF._fused_kernel

def variant_kernel(mode):
    # mode flags: 'E' = hoisted E input; 'S' = no staging (direct slices)
    def kern(w_ref, *rest, ry0, base_c0, packs, live, hbu_p, px, qx, tnb,
             precision, interleave):
        if 'E' in mode:
            e_ref, src_ref, out_ref, colp_ref = rest
        else:
            src_ref, out_ref, colp_ref = rest
        blk = src_ref[ry0:ry0 + hbu_p, :]
        def seg(c0):
            return jax.lax.slice(blk, (0, c0), (hbu_p, c0 + qx*(tnb-1)+1), (1, qx))
        tmo = w_ref.shape[2]
        accs = [jnp.zeros((tmo, tnb), f32) for _ in range(px)]
        if 'S' in mode:
            # no staging: one dot per tap with K=hbu_p
            for d, taps in enumerate(packs):
                for t, lx in enumerate(taps):
                    s = seg(base_c0 + lx)
                    for rx in live[d]:
                        wslice = w_ref[rx, d][:, t*hbu_p:(t+1)*hbu_p]
                        accs[rx] = accs[rx] + jax.lax.dot_general(
                            wslice, s, dimension_numbers=(((1,), (0,)), ((), ())),
                            precision=precision, preferred_element_type=f32)
        else:
            colps = []
            for d, taps in enumerate(packs):
                if len(taps) == 1:
                    colps.append(seg(base_c0 + taps[0]))
                else:
                    for t, lx in enumerate(taps):
                        colp_ref[d, t*hbu_p:(t+1)*hbu_p, :] = seg(base_c0 + lx)
                    colps.append(colp_ref[d, :len(taps)*hbu_p, :])
            for d, taps in enumerate(packs):
                for rx in live[d]:
                    accs[rx] = accs[rx] + jax.lax.dot_general(
                        w_ref[rx, d][:, :len(taps)*hbu_p], colps[d],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=f32)
        tno = tnb * px
        if 'E' in mode:
            out = jnp.zeros((tmo, tno), f32)
            for rx in range(px):
                e = e_ref[rx]
                a = accs[rx]
                hi = a.astype(jnp.bfloat16).astype(f32); r1 = a - hi
                mid = r1.astype(jnp.bfloat16).astype(f32); lo = r1 - mid
                for part in (hi, mid, lo):
                    out = out + jax.lax.dot_general(
                        part, e, dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT, preferred_element_type=f32)
            out_ref[:] = out
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (tnb, tno), 1)
            out = jnp.zeros((tmo, tno), f32)
            for rx in range(px):
                e = (cols == px*rows + rx).astype(f32)
                a = accs[rx]
                hi = a.astype(jnp.bfloat16).astype(f32); r1 = a - hi
                mid = r1.astype(jnp.bfloat16).astype(f32); lo = r1 - mid
                for part in (hi, mid, lo):
                    out = out + jax.lax.dot_general(
                        part, e, dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.DEFAULT, preferred_element_type=f32)
            out_ref[:] = out
    return kern

def build_variant(mode, precision="highest"):
    """Rebuild make_fused_interior plumbing with variant kernel + optional E input."""
    fs = op.filter_size
    py, px = plan.y.p, plan.x.p
    qy, qx = plan.y.q, plan.x.q
    nyb, nxb = plan.y.nblocks, plan.x.nblocks
    offs_y = plan.y.offsets.astype(int); offs_x = plan.x.offsets.astype(int)
    spread_y = int(offs_y.max()); spread_x = int(offs_x.max())
    base_y = plan.y.base; base_x = plan.x.base
    tnb = 128
    tmb = 24
    tmo = py * tmb; tno = px * tnb
    hbu = qy*(tmb-1) + spread_y + fs
    hbu_p = PF._round_up(hbu, PF.SUB)
    g = max(1, PF.LANE // hbu_p)
    fs_x = fs + spread_x
    packs = tuple(tuple(range(d*g, min((d+1)*g, fs_x))) for d in range(-(-fs_x//g)))
    n_d = len(packs); kp = g * hbu_p
    ay = base_y // PF.SUB * PF.SUB; ax = base_x // PF.LANE * PF.LANE
    ry0 = base_y - ay; rx0 = base_x - ax
    hb = PF._round_up(ry0 + hbu_p, PF.SUB)
    wb = PF._round_up(rx0 + spread_x + (fs-1) + qx*(tnb-1) + 1, PF.LANE)
    mt = -(-nyb // tmb); nt = -(-nxb // tnb)
    ext_y = ay + qy*tmb*(mt-1) + hb; ext_x = ax + qx*tnb*(nt-1) + wb
    cy = plan.y.anchor_cls; cx = plan.x.anchor_cls
    w = np.zeros((px, n_d, tmo, kp), dtype=np.float32)
    live_sets = [set() for _ in range(n_d)]
    for rx in range(px):
        dcol = int(offs_x[rx])
        for m in range(tmo):
            i, ry = divmod(m, py)
            blk = op.pair_blocks[cy[ry], cx[rx]]
            row0 = offs_y[ry] + qy*i
            for d, taps in enumerate(packs):
                for t, lxp in enumerate(taps):
                    lx = lxp - dcol
                    if 0 <= lx < fs:
                        w[rx, d, m, t*hbu_p+row0:t*hbu_p+row0+fs] = blk[:, lx]
                        live_sets[d].add(rx)
    live = tuple(tuple(sorted(s)) for s in live_sets)
    w_dev = jnp.asarray(w)
    E = np.zeros((px, tnb, tno), dtype=np.float32)
    for rx in range(px):
        for j in range(tnb):
            E[rx, j, px*j+rx] = 1.0
    e_dev = jnp.asarray(E)
    prec = {"default": jax.lax.Precision.DEFAULT, "highest": jax.lax.Precision.HIGHEST}[precision]
    kern = functools.partial(variant_kernel(mode), ry0=ry0, base_c0=rx0, packs=packs,
                             live=live, hbu_p=hbu_p, px=px, qx=qx, tnb=tnb,
                             precision=prec, interleave="split3")
    in_specs = [pl.BlockSpec((px, n_d, tmo, kp), lambda i, j: (0, 0, 0, 0))]
    inputs = [w_dev]
    if 'E' in mode:
        in_specs.append(pl.BlockSpec((px, tnb, tno), lambda i, j: (0, 0, 0)))
        inputs.append(e_dev)
    in_specs.append(pl.BlockSpec((pl.Element(hb), pl.Element(wb)),
                                 lambda i, j: (ay + qy*tmb*i, ax + qx*tnb*j)))
    call = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((mt*tmo, nt*tno), f32),
                          grid=(mt, nt), in_specs=in_specs,
                          out_specs=pl.BlockSpec((tmo, tno), lambda i, j: (i, j)),
                          scratch_shapes=[pltpu.VMEM((n_d, kp, tnb), f32)])
    def fn(src_f):
        H, W_ = src_f.shape
        pad_h = max(0, ext_y - H); pad_w = max(0, ext_x - W_)
        if pad_h or pad_w:
            src_f = jnp.pad(src_f, ((0, pad_h), (0, pad_w)))
        return call(*inputs, src_f)[: py*nyb, : px*nxb]
    return fn

ifn0 = PF.make_fused_interior(op, plan, interleave="split3")
timeit_loop("control split3", lambda s: jnp.sum(jax.vmap(ifn0)(s)))
for mode in ["E", "S", "ES"]:
    fn = build_variant(mode)
    timeit_loop(f"variant {mode}", lambda s, fn=fn: jnp.sum(jax.vmap(fn)(s)))
fn = build_variant("ES", precision="default")
timeit_loop("variant ES default-prec", lambda s, fn=fn: jnp.sum(jax.vmap(fn)(s)))
