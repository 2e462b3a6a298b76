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

sw, sh, dw, dh = 3840, 2160, 7680, 4320
F = 8
op = cached_build(build_plane_operator, src_width=sw, src_height=sh,
                  dst_width=dw, dst_height=dh, radius=radius_for_tap(8))
plan = plan_phases(op)
rng = np.random.default_rng(0)
src = jnp.asarray(rng.random((F, sh, sw), dtype=np.float32))
ref = None

def trial(tmb, tnb):
    global ref
    PF._TMB_ENV = str(tmb)
    PF.TNB = tnb
    try:
        ifn = PF.make_fused_interior(op, plan, interleave="split3")
        jfn = jax.jit(lambda s: jax.vmap(ifn)(s))
        out = jfn(src); out.block_until_ready(); float(jnp.sum(out))
    except Exception as e:
        print(f"tmb={tmb:3d} tnb={tnb:5d}  FAIL: {str(e)[:130]}")
        return
    if ref is None:
        ref = out; err = 0.0
    else:
        err = float(jnp.max(jnp.abs(out - ref)))
    t0 = time.time()
    outs = [jnp.sum(jfn(src)) for _ in range(3)]
    _ = [float(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"tmb={tmb:3d} tnb={tnb:5d}  {dt*1e3/F:7.3f} ms/frame  err={err:.1e}  grid={ifn.tile_info['grid']}")

trial(24, 128)
trial(24, 512)
trial(24, 1280)
trial(24, 3840)
trial(48, 1280)
trial(48, 3840)
trial(96, 1280)
