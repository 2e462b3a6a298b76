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
rng = np.random.default_rng(0)
src = jnp.asarray(rng.integers(0, 256, (F, sh, sw)).astype(np.float32))

ih = PF.make_fused_interior(op, plan, precision="highest")
iw = PF.make_fused_interior(op, plan, precision="wsplit3")
jh = jax.jit(lambda s: jax.vmap(ih)(s))
jw = jax.jit(lambda s: jax.vmap(iw)(s))
oh = jh(src); ow = jw(src)
d = float(jnp.max(jnp.abs(oh - ow)))
rel = float(jnp.max(jnp.abs(oh - ow) / (jnp.abs(oh) + 1.0)))
print(f"u8-valued src: max abs diff wsplit3 vs HIGHEST = {d:.3e} (rel {rel:.2e})")

for name, ifn in (("highest", ih), ("wsplit3", iw)):
    @jax.jit
    def looped(s, ifn=ifn):
        def it(i, acc):
            return acc + jnp.sum(jax.vmap(ifn)(s + i * 1e-9))
        return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))
    float(looped(src))
    t0 = time.time(); float(looped(src)); dt = (time.time() - t0) / R
    print(f"{name:10s} {dt*1e3/F:7.3f} ms/frame")
