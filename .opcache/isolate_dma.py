"""Measure the pallas pipeline floor: input-window DMA vs output write vs grid."""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

f32 = jnp.float32
F = 8
H, W = 2168, 3968   # padded src
DH, DW = 4320, 7680
src = jnp.asarray(np.random.default_rng(0).random((F, H, W), dtype=np.float32))

def timeit(name, jfn, x):
    try:
        float(jnp.sum(jfn(x)))
    except Exception as e:
        print(f"{name:42s} FAIL: {str(e)[:110]}")
        return
    t0 = time.time()
    outs = [jnp.sum(jfn(x)) for _ in range(3)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"{name:42s} {dt*1e3/F:7.3f} ms/frame")

def out_only(tmo, tno):
    mt, nt = DH // tmo, DW // tno
    def kern(o_ref):
        o_ref[:] = jnp.zeros((tmo, tno), f32)
    call = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((DH, DW), f32),
                          grid=(mt, nt), out_specs=pl.BlockSpec((tmo, tno), lambda i, j: (i, j)))
    timeit(f"out_only {tmo}x{tno} grid={mt*nt}", jax.jit(lambda s: jax.vmap(lambda _: call())(s)), src)

def win_dma(tmo, tno, hb, wb, sy, sx, elem=True):
    mt, nt = DH // tmo, DW // tno
    def kern(s_ref, o_ref):
        o_ref[:] = jnp.zeros((tmo, tno), f32) + s_ref[0, 0]
    if elem:
        spec = pl.BlockSpec((pl.Element(hb), pl.Element(wb)), lambda i, j: (sy * i, sx * j))
    else:
        spec = pl.BlockSpec((hb, wb), lambda i, j: (i * sy // hb, j * sx // wb))
    call = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((DH, DW), f32),
                          grid=(mt, nt), in_specs=[spec],
                          out_specs=pl.BlockSpec((tmo, tno), lambda i, j: (i, j)))
    timeit(f"win {hb}x{wb}@({sy},{sx}) out {tmo}x{tno} g={mt*nt} e={elem}", jax.jit(lambda s: jax.vmap(call)(s)), src)

out_only(48, 256)       # grid 2700, write only
out_only(96, 512)
win_dma(48, 256, 48, 256, 24, 128)          # fused kernel's window pattern
win_dma(48, 256, 48, 256, 48, 256, elem=False)  # block-aligned non-overlap
win_dma(96, 512, 64, 512, 48, 256)          # bigger window fewer steps
win_dma(48, 256, 48, 3968, 24, 0)           # full-width row band
