"""Profile the 4K->8K tap8 fp32 pipeline piece by piece (8-frame batch)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from jincresize_tpu import apply_xla
from jincresize_tpu.cache import cached_build
from jincresize_tpu.operator import build_plane_operator, radius_for_tap
from jincresize_tpu.phase import plan_phases
from jincresize_tpu.apply_conv import ConvApplier, _assemble

sw, sh, dw, dh = 3840, 2160, 7680, 4320
F = 8
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
applier = ConvApplier(op, plan)
print("interior:", applier.interior, applier._interior_fn.tile_info, file=sys.stderr)
cop = applier.cop

rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((F, sh, sw), dtype=np.float32))

def timeit(name, fn, iters=3):
    r = fn(src); jax.block_until_ready(r); s0 = float(jnp.sum(r[0] if isinstance(r, (tuple, list)) else r).block_until_ready()) if False else None
    # force full execution via scalar fetch
    float(jnp.sum(fn(src)))
    t0 = time.time()
    outs = [jnp.sum(fn(src)) for _ in range(iters)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt*1e3/F:7.3f} ms/frame  ({dt*1e3:.1f} ms/batch)")
    return dt

ifn = applier._interior_fn

@jax.jit
def interior_only(s):
    return jax.vmap(ifn)(s)

@jax.jit
def interior_assemble(s):
    def one(x):
        return _assemble(cop, ifn(x), x, strips_fn=None, interior_layout="dst")
    return jax.vmap(one)(s)

@jax.jit
def interior_assemble_faststrips(s):
    def one(x):
        return _assemble(cop, ifn(x), x, strips_fn=applier._strips_fn, interior_layout="dst")
    return jax.vmap(one)(s)

def full(s):
    return applier(s)

timeit("interior only", interior_only)
timeit("interior+exc+slowstrips", interior_assemble)
timeit("interior+exc+faststrips", interior_assemble_faststrips)
timeit("full apply", full)
