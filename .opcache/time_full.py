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
from jincresize_tpu.apply_conv import ConvApplier

F, R = 8, 10
sw, sh, dw, dh = 3840, 2160, 7680, 4320
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
applier = ConvApplier(op)
print("concat plan:", applier._concat, file=sys.stderr)
src = jnp.asarray(np.random.default_rng(0).random((F, sh, sw), dtype=np.float32))

@jax.jit
def looped(s):
    def it(i, acc):
        return acc + jnp.sum(applier._apply_batch(applier.cop, s + i * 1e-9))
    return jax.lax.fori_loop(0, R, it, jnp.float32(0.0))

float(looped(src))
t0 = time.time(); float(looped(src)); dt = (time.time() - t0) / R
print(f"full apply {dt*1e3/F:7.3f} ms/frame")
