"""Randomized-geometry fuzz: vectorized builder vs the scalar oracle.

The two implementations share no code (golden.reference_resize_plane
re-derives /root/reference/src/JincResize.cpp:336-601 with Python scalars;
operator.build_plane_operator is the vectorized production builder), so
bitwise agreement across randomized geometry — scale ratios up and down,
sub-pixel crops, quantization grids, blur, taps — is a strong end-to-end
check of the coefficient semantics (ROADMAP item 12; the reference's own
bug history concentrates exactly here: CHANGELOG.md 1.2.0/2.0.2/2.1.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from jincresize_tpu.golden import apply_plane_numpy, reference_resize_plane
from jincresize_tpu.operator import build_plane_operator, radius_for_tap


def _random_geometry(rng: np.random.Generator) -> dict:
    sw = int(rng.integers(10, 49))
    sh = int(rng.integers(10, 41))
    dw = int(rng.integers(8, 73))
    dh = int(rng.integers(8, 65))
    tap = int(rng.choice([1, 2, 3, 4]))
    g = dict(
        src_width=sw,
        src_height=sh,
        dst_width=dw,
        dst_height=dh,
        radius=radius_for_tap(tap),
        quantize_x=int(rng.choice([1, 2, 3, 16, 256])),
        quantize_y=int(rng.choice([1, 2, 3, 16, 256])),
        blur=float(rng.choice([1.0, 0.98, 1.05])),
    )
    if rng.random() < 0.5:
        # Sub-pixel crop, kept safely inside the plane.
        cl = float(np.float32(rng.uniform(0.0, 2.0)))
        ct = float(np.float32(rng.uniform(0.0, 2.0)))
        g.update(
            crop_left=cl,
            crop_top=ct,
            crop_width=sw - cl - float(np.float32(rng.uniform(0.0, 2.0))),
            crop_height=sh - ct - float(np.float32(rng.uniform(0.0, 2.0))),
        )
    return g


@pytest.mark.parametrize("seed", range(24))
def test_builder_matches_scalar_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    g = _random_geometry(rng)
    dtype = rng.choice([np.uint8, np.uint16, np.float32])
    if dtype is np.float32:
        src = rng.random((g["src_height"], g["src_width"]), dtype=np.float32)
        peak = None
    elif dtype is np.uint16:
        src = rng.integers(0, 65536, (g["src_height"], g["src_width"])).astype(
            np.uint16
        )
        peak = 65535.0
    else:
        src = rng.integers(0, 256, (g["src_height"], g["src_width"])).astype(
            np.uint8
        )
        peak = 255.0

    op = build_plane_operator(**g)
    got = apply_plane_numpy(op, src, out_dtype=src.dtype, peak=peak)
    want = reference_resize_plane(
        src,
        g["dst_width"],
        g["dst_height"],
        g["radius"],
        crop_left=g.get("crop_left", 0.0),
        crop_top=g.get("crop_top", 0.0),
        crop_width=g.get("crop_width"),
        crop_height=g.get("crop_height"),
        quantize_x=g["quantize_x"],
        quantize_y=g["quantize_y"],
        blur=g["blur"],
        out_dtype=src.dtype,
        peak=peak,
    )
    if src.dtype == np.float32:
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)
    else:
        # Accumulation order matches, so int stores agree exactly.
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_conv_path_matches_golden_random_geometry(seed):
    """Randomized geometry through the full device conv path (phase
    compiler + interior + strips + exception fixups) vs the host golden."""
    import jax.numpy as jnp

    from jincresize_tpu.apply_conv import ConvApplier

    rng = np.random.default_rng(2000 + seed)
    # Rational scales (the conv path's domain); tiny irrational-ish sizes
    # are aperiodic at this scale and take the gather path instead.
    num, den = [(2, 1), (3, 2), (1, 2), (4, 3), (3, 1), (2, 3), (5, 4), (4, 1)][
        seed
    ]
    sw = int(rng.integers(4, 10)) * den * 2
    sh = int(rng.integers(4, 10)) * den * 2
    g = dict(
        src_width=sw,
        src_height=sh,
        dst_width=sw * num // den,
        dst_height=sh * num // den,
        radius=radius_for_tap(int(rng.choice([2, 3, 4]))),
        quantize_x=int(rng.choice([16, 256])),
        quantize_y=int(rng.choice([16, 256])),
        blur=float(rng.choice([1.0, 0.98])),
    )
    op = build_plane_operator(**g)
    try:
        applier = ConvApplier(op)
    except ValueError:
        pytest.skip("aperiodic geometry (gather path covers it)")
    src = rng.random((g["src_height"], g["src_width"]), dtype=np.float32)
    out = np.asarray(applier(jnp.asarray(src)))
    ref = apply_plane_numpy(op, src)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6)
