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
from jincresize_tpu.kernels import pallas_fused as PF

F, R = 8, 10
sw, sh, dw, dh = 3840, 2160, 7680, 4320
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
src = jnp.asarray(np.random.default_rng(0).random((F, sh, sw), dtype=np.float32))
ref = None

def trial(name, tmb=None, tnb=128, interleave="split3"):
    global ref
    PF._TMB_ENV = str(tmb) if tmb else None
    PF.TNB = tnb
    try:
        ifn = PF.make_fused_interior(op, plan, interleave=interleave)
    except Exception as e:
        print(f"{name:30s} BUILD FAIL: {str(e)[:100]}"); return
    @jax.jit
    def looped(s):
        def it(i, acc):
            return acc + jnp.sum(jax.vmap(ifn)(s + i * 1e-9))
        return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
    jone = jax.jit(lambda s: jax.vmap(ifn)(s))
    try:
        out = jone(src); out.block_until_ready()
    except Exception as e:
        print(f"{name:30s} RUN FAIL: {str(e)[:100]}"); return
    err = 0.0 if ref is None else float(jnp.max(jnp.abs(out - ref)))
    if ref is None: ref = out
    float(looped(src))
    t0 = time.time(); float(looped(src)); dt = (time.time() - t0) / R
    print(f"{name:30s} {dt*1e3/F:7.3f} ms/frame  err={err:.1e}  {ifn.tile_info}")

trial("concat auto")
trial("concat tmb=16", tmb=16)
trial("concat tmb=24", tmb=24)
trial("concat tmb=32", tmb=32)
trial("concat tmb=24 dot-ilv", tmb=24, interleave="dot")
