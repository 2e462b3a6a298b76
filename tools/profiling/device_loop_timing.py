"""Separate per-dispatch overhead from device compute: loop on device."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jincresize_tpu.cache import cached_build
from jincresize_tpu.operator import build_plane_operator, radius_for_tap
from jincresize_tpu.phase import plan_phases
from jincresize_tpu.kernels import pallas_fused as PF

f32 = jnp.float32
F = 8
sw, sh, dw, dh = 3840, 2160, 7680, 4320
src = jnp.asarray(np.random.default_rng(0).random((F, sh, sw), dtype=np.float32))

R = 10  # on-device repeats

def timeit_loop(name, body):
    # body: src_batch -> scalar; run R times inside one dispatch via fori_loop
    @jax.jit
    def looped(s):
        def it(i, acc):
            return acc + body(s + i * 1e-9)
        return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
    try:
        float(looped(src))
    except Exception as e:
        print(f"{name:40s} FAIL: {str(e)[:120]}")
        return
    t0 = time.time()
    v = float(looped(src))
    dt = (time.time() - t0) / R
    print(f"{name:40s} {dt*1e3/F:7.3f} ms/frame (on-device loop, {dt*1e3:.1f} ms/iter)")

# 1. pure zeros materialization (XLA)
timeit_loop("xla zeros 8x4320x7680", lambda s: jnp.sum(jnp.zeros((F, dh, dw), f32)) + jnp.sum(s[:, 0, 0]))

# 2. out_only pallas grid 2700
def out_only_call(tmo, tno):
    mt, nt = dh // tmo, dw // tno
    def kern(o_ref):
        o_ref[:] = jnp.zeros((tmo, tno), f32)
    return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((dh, dw), f32),
                          grid=(mt, nt), out_specs=pl.BlockSpec((tmo, tno), lambda i, j: (i, j)))
oc = out_only_call(48, 256)
timeit_loop("pallas out_only 48x256 g=2700", lambda s: jnp.sum(jax.vmap(lambda _: oc())(s)))

# 3. the real fused interior
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
ifn = PF.make_fused_interior(op, plan, interleave="split3")
timeit_loop("fused interior split3", lambda s: jnp.sum(jax.vmap(ifn)(s)))

# 4. full apply
from jincresize_tpu.apply_conv import ConvApplier
applier = ConvApplier(op, plan)
def full(s):
    return jnp.sum(applier._apply_batch(applier.cop, s))
timeit_loop("full conv apply", full)
