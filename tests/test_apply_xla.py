"""XLA device path vs host golden: cross-impl equivalence (SURVEY.md §4)."""

import numpy as np
import pytest

from jincresize_tpu.golden import apply_plane_numpy
from jincresize_tpu.operator import build_plane_operator, radius_for_tap


@pytest.fixture(scope="module")
def pair():
    from jincresize_tpu import apply_xla

    op = build_plane_operator(48, 32, 72, 50, radius_for_tap(3))
    return op, apply_xla.to_device(op)


def test_u8_parity(pair):
    import jax.numpy as jnp

    from jincresize_tpu import apply_xla

    op, dop = pair
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, size=(32, 48)).astype(np.uint8)
    a = np.asarray(
        apply_xla.resize_plane(dop, jnp.asarray(src), out_dtype=np.uint8, peak=255.0)
    )
    b = apply_plane_numpy(op, src, out_dtype=np.uint8, peak=255)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1  # <= 1 LSB


def test_f32_parity(pair):
    import jax.numpy as jnp

    from jincresize_tpu import apply_xla

    op, dop = pair
    rng = np.random.default_rng(3)
    src = rng.random((32, 48), dtype=np.float32)
    a = np.asarray(apply_xla.resize_plane(dop, jnp.asarray(src)))
    b = apply_plane_numpy(op, src)
    assert np.abs(a - b).max() <= 1e-6


def test_float_clamp_min(pair):
    import jax.numpy as jnp

    from jincresize_tpu import apply_xla

    op, dop = pair
    rng = np.random.default_rng(4)
    src = (rng.random((32, 48), dtype=np.float32) - 0.5) * 3.0
    a = np.asarray(
        apply_xla.resize_plane(dop, jnp.asarray(src), float_clamp_min=-0.5)
    )
    b = apply_plane_numpy(op, src, float_clamp_min=-0.5)
    assert np.abs(a - b).max() <= 1e-6
    # and it must differ from the unclamped path for out-of-range sources
    c = apply_plane_numpy(op, src)
    assert np.abs(b - c).max() > 0


def test_batch_matches_loop(pair):
    import jax.numpy as jnp

    from jincresize_tpu import apply_xla

    op, dop = pair
    rng = np.random.default_rng(5)
    srcb = rng.random((4, 32, 48), dtype=np.float32)
    ab = np.asarray(apply_xla.resize_plane_batch(dop, jnp.asarray(srcb)))
    bb = np.stack([apply_plane_numpy(op, s) for s in srcb])
    assert np.abs(ab - bb).max() <= 1e-6
