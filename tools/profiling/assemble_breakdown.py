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
from jincresize_tpu.apply_conv import ConvApplier
import jincresize_tpu.apply_conv as AC

F, R = 8, 10
sw, sh, dw, dh = 3840, 2160, 7680, 4320
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
applier = ConvApplier(op, plan)
cop = applier.cop
print("exc_x:", cop.exc_x.shape, "exc_y:", cop.exc_y.shape, file=sys.stderr)
print("strips:", [(s.y0, s.y1, s.x0, s.x1) for s in op.strips], file=sys.stderr)
src = jnp.asarray(np.random.default_rng(0).random((F, sh, sw), dtype=np.float32))
f32 = jnp.float32

def timeit_loop(name, body):
    @jax.jit
    def looped(s):
        def it(i, acc):
            return acc + body(s + i * 1e-9)
        return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
    try:
        float(looped(src))
    except Exception as e:
        print(f"{name:40s} FAIL: {str(e)[:110]}"); return
    t0 = time.time(); float(looped(src)); dt = (time.time() - t0) / R
    print(f"{name:40s} {dt*1e3/F:7.3f} ms/frame")

ifn = applier._interior_fn
meta = cop.meta
(ylo, xlo, py, px, qy, qx, base_y, base_x, nyb, nxb, Kh, Kw) = meta

def interior_only(s):
    return jnp.sum(jax.vmap(ifn)(s))

def interior_paste(s):
    def one(x):
        block = ifn(x)
        canvas = jnp.zeros((cop.dop.dst_height, cop.dop.dst_width), f32)
        return jax.lax.dynamic_update_slice(canvas, block, (ylo, xlo))
    return jnp.sum(jax.vmap(one)(s))

def interior_paste_strips(s):
    def one(x):
        block = ifn(x)
        canvas = jnp.zeros((cop.dop.dst_height, cop.dop.dst_width), f32)
        canvas = jax.lax.dynamic_update_slice(canvas, block, (ylo, xlo))
        return applier._strips_fn(cop.dop, x, canvas)
    return jnp.sum(jax.vmap(one)(s))

def full(s):
    return jnp.sum(applier._apply_batch(cop, s))

timeit_loop("interior only", interior_only)
timeit_loop("interior+paste", interior_paste)
timeit_loop("interior+paste+strips", interior_paste_strips)
timeit_loop("full (=+exceptions+finalize)", full)
