"""Isolate fused-kernel cost: staging-only vs dots-only vs full."""
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

sw, sh, dw, dh = 3840, 2160, 7680, 4320
F = 8
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((F, sh, sw), dtype=np.float32))
f32 = jnp.float32

orig_kernel = PF._fused_kernel

def make_variant(mode):
    def kern(w_ref, src_ref, out_ref, colp_ref, *, ry0, base_c0, packs, live,
             hbu_p, px, qx, tnb, precision, interleave):
        blk = src_ref[ry0:ry0 + hbu_p, :]
        def seg(c0):
            return jax.lax.slice(blk, (0, c0), (hbu_p, c0 + qx*(tnb-1)+1), (1, qx))
        tmo = w_ref.shape[2]
        if mode == "dma_only":
            out_ref[:] = jnp.zeros((tmo, tnb*px), f32) + blk[0, 0]
            return
        colps = []
        for d, taps in enumerate(packs):
            if len(taps) == 1:
                colps.append(seg(base_c0 + taps[0]))
            else:
                for t, lx in enumerate(taps):
                    colp_ref[d, t*hbu_p:(t+1)*hbu_p, :] = seg(base_c0 + lx)
                colps.append(colp_ref[d, :len(taps)*hbu_p, :])
        if mode == "stage_only":
            acc = jnp.zeros((8, tnb), f32)
            for d in range(len(packs)):
                acc = acc + colps[d][:8, :]
            out_ref[:] = jnp.zeros((tmo, tnb*px), f32) + jnp.pad(acc, ((0, tmo-8), (0, tnb*(px-1))))
            return
        accs = [jnp.zeros((tmo, tnb), f32) for _ in range(px)]
        for d, taps in enumerate(packs):
            colp = colps[d]
            for rx in live[d]:
                accs[rx] = accs[rx] + jax.lax.dot_general(
                    w_ref[rx, d][:, :len(taps)*hbu_p], colp,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=f32)
        if mode == "no_interleave":
            out_ref[:, :tnb] = accs[0]
            out_ref[:, tnb:] = accs[1]
            return
        # split3 interleave
        tno = tnb * px
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

def trial(name, mode, precision="highest"):
    PF._fused_kernel = make_variant(mode) if mode else orig_kernel
    ifn = PF.make_fused_interior(op, plan, precision=precision, interleave="split3")
    jfn = jax.jit(lambda s: jax.vmap(ifn)(s))
    try:
        float(jnp.sum(jfn(src)))
    except Exception as e:
        print(f"{name:30s} FAIL: {str(e)[:150]}")
        return
    t0 = time.time()
    outs = [jnp.sum(jfn(src)) for _ in range(3)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"{name:30s} {dt*1e3/F:7.3f} ms/frame")

trial("full split3 (control)", None)
trial("dma_only", "dma_only")
trial("stage_only", "stage_only")
trial("no_interleave HIGHEST", "no_interleave")
trial("no_interleave DEFAULT", "no_interleave", "default")
