"""Numerics-core tests: jinc math and LUT vs scipy (SURVEY.md §7 step 1)."""

import numpy as np
import pytest
from scipy.special import j1

from jincresize_tpu import filters


def jinc_exact(x: float) -> float:
    if x == 0.0:
        return 1.0
    return 2.0 * j1(np.pi * x) / (np.pi * x)


def test_taylor_matches_bessel_near_origin():
    for x2 in np.linspace(1e-6, 1.48, 50):
        assert filters.jinc_sqr(x2) == pytest.approx(
            jinc_exact(np.sqrt(x2)), abs=1e-12
        )


def test_all_branches_match_bessel():
    # Cover every piecewise branch boundary (JincResize.cpp:200-245). The
    # Taylor branches carry the reference's own truncation error (~1e-12 abs
    # near their upper thresholds), far below float32 coefficient resolution.
    for x2 in [0.5, 1.50, 4.9, 5.0, 10.4, 10.6, 17.9, 18.1, 52.0, 53.0, 67.9, 68.2, 200.0]:
        assert filters.jinc_sqr(x2) == pytest.approx(
            jinc_exact(np.sqrt(x2)), rel=1e-7, abs=1e-11
        )


def test_boost_branch_accuracy():
    for x2 in np.linspace(52.6, 68.0, 30):
        assert filters.jinc_sqr_boost_l(x2) == pytest.approx(
            jinc_exact(np.sqrt(x2)), rel=1e-10, abs=1e-14
        )


def test_jinc_zeros_are_zeros():
    for z in filters.JINC_ZEROS:
        assert abs(jinc_exact(float(z))) < 1e-12


def test_lut_semantics():
    lut = filters.build_lut(radius=3.2383154841662362, blur=1.0)
    assert lut.shape == (1024,)
    assert lut[0] == pytest.approx(1.0)  # jinc(0)*jinc(0)
    # Window term kills the tail: t2 -> 1 approaches the first jinc zero.
    assert abs(lut[-1]) < 1e-10
    # GetFactor: float32 cast in range, zero beyond (JincResize.cpp:277-282).
    idx = np.array([0, 1023, 1024, 5000])
    out = filters.lut_get_factor(lut, idx)
    assert out.dtype == np.float32
    assert out[0] == np.float32(lut[0])
    assert out[2] == 0.0 and out[3] == 0.0


def test_sample_sqr_radius_cutoff():
    r2 = 4.0
    assert filters.sample_sqr(filters.jinc_sqr, 4.1, 1.0, r2) == 0.0
    assert filters.sample_sqr(filters.jinc_sqr, 3.9, 1.0, r2) != 0.0
    # blur divides the squared distance (cutoff applies post-division).
    a = filters.sample_sqr(filters.jinc_sqr, 0.9, 0.25, r2)
    b = filters.jinc_sqr(3.6)
    assert a == pytest.approx(b)
    assert filters.sample_sqr(filters.jinc_sqr, 1.0, 0.25, r2) == 0.0
