"""Sweep fused-kernel variants on TPU: interleave mode x tile sizes."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from jincresize_tpu.cache import cached_build
from jincresize_tpu.operator import build_plane_operator, radius_for_tap
from jincresize_tpu.phase import plan_phases
from jincresize_tpu.kernels import pallas_fused

sw, sh, dw, dh = 3840, 2160, 7680, 4320
F = 8
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((F, sh, sw), dtype=np.float32))

ref_out = None

def trial(name, interleave, tmb=None, tnb=None):
    global ref_out
    if tmb is not None:
        os.environ["JINCRESIZE_FUSED_TMB"] = str(tmb)
        pallas_fused._TMB_ENV = str(tmb)
    else:
        os.environ.pop("JINCRESIZE_FUSED_TMB", None)
        pallas_fused._TMB_ENV = None
    if tnb is not None:
        pallas_fused.TNB = tnb
    try:
        ifn = pallas_fused.make_fused_interior(op, plan, interleave=interleave)
    except Exception as e:
        print(f"{name:34s} BUILD FAIL: {e}")
        return
    jfn = jax.jit(lambda s: jax.vmap(ifn)(s))
    try:
        out = jfn(src)
        out.block_until_ready()
        float(jnp.sum(out))
    except Exception as e:
        print(f"{name:34s} RUN FAIL: {str(e)[:120]}")
        return
    if ref_out is None:
        ref_out = out
        err = 0.0
    else:
        err = float(jnp.max(jnp.abs(out - ref_out)))
    t0 = time.time()
    outs = [jnp.sum(jfn(src)) for _ in range(3)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"{name:34s} {dt*1e3/F:7.3f} ms/frame  maxerr={err:.3e}  tiles={ifn.tile_info}")

trial("dot HIGHEST (r1 baseline+shared)", "dot")
trial("split3", "split3")
trial("store", "store")
trial("split3 tnb=256", "split3", tnb=256)
trial("split3 tmb=16", "split3", tmb=16, tnb=128)
trial("split3 tmb=32", "split3", tmb=32)
trial("split3 tmb=48", "split3", tmb=48)
trial("split3 tmb=8", "split3", tmb=8)

print("--- isolation runs ---")
pallas_fused.TNB = 128
def trial_prec(name, precision, interleave):
    os.environ.pop("JINCRESIZE_FUSED_TMB", None)
    pallas_fused._TMB_ENV = None
    ifn = pallas_fused.make_fused_interior(op, plan, precision=precision, interleave=interleave)
    jfn = jax.jit(lambda s: jax.vmap(ifn)(s))
    float(jnp.sum(jfn(src)))
    t0 = time.time()
    outs = [jnp.sum(jfn(src)) for _ in range(3)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"{name:34s} {dt*1e3/F:7.3f} ms/frame")

trial_prec("DEFAULT main dots (not parity)", "default", "split3")
