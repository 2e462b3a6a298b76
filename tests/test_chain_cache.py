"""Operator-cache integration in the API + the composed chain surface."""

import numpy as np
import pytest

from jincresize_tpu import api
from jincresize_tpu.api import ChainResizer, JincConfig, jinc_resize, jinc_resize_chain
from jincresize_tpu.clip import Clip, gray, random_frame, yuv420p


def test_operator_cache_warm_start(monkeypatch, tmp_path):
    """Second construction of the same geometry loads from disk: the host
    builder is not called at all (VERDICT r2 item 5: construction-latency
    parity via cache.py)."""
    monkeypatch.setenv("JINCRESIZE_CACHE_DIR", str(tmp_path))
    clip = Clip.from_frames([random_frame(gray(8), 64, 48, seed=1)])
    cfg = JincConfig(target_width=96, target_height=72, impl="numpy")
    r1 = api.JincResizer(clip.format, 64, 48, cfg, frame0=clip.frames[0])
    assert list(tmp_path.glob("op_*.npz")), "cache entry not written"

    def boom(**kw):
        raise AssertionError("builder called despite warm cache")

    monkeypatch.setattr(api, "build_plane_operator", boom)
    r2 = api.JincResizer(clip.format, 64, 48, cfg, frame0=clip.frames[0])
    assert np.array_equal(r1.op_luma.pair_blocks, r2.op_luma.pair_blocks)
    assert np.array_equal(r1.op_luma.start_x, r2.op_luma.start_x)


def test_operator_cache_opt_out(monkeypatch, tmp_path):
    monkeypatch.setenv("JINCRESIZE_CACHE_DIR", str(tmp_path))
    clip = Clip.from_frames([random_frame(gray(8), 64, 48, seed=1)])
    cfg = JincConfig(
        target_width=96, target_height=72, impl="numpy", operator_cache=False
    )
    api.JincResizer(clip.format, 64, 48, cfg, frame0=clip.frames[0])
    assert not list(tmp_path.glob("op_*.npz"))


def test_chain_matches_sequential_float():
    """A composed 2-stage chain matches running the stages separately on a
    float clip (no intermediate rounding in either case)."""
    clip = Clip.from_frames([random_frame(gray(32), 48, 40, seed=2)])
    # float_clamp off: the sequential path would clamp ringing negatives in
    # the INTERMEDIATE clip, which the composed single pass (by design)
    # never materializes — that clamp difference is not an error.
    stages = [
        dict(target_width=72, target_height=60, tap=2, float_clamp=False),
        dict(target_width=96, target_height=80, tap=2, float_clamp=False),
    ]
    out = jinc_resize_chain(clip, stages)
    mid = jinc_resize(clip, 72, 60, tap=2, float_clamp=False)
    ref = jinc_resize(mid, 96, 80, tap=2, float_clamp=False)
    a = out.frames[0].planes["Y"]
    b = ref.frames[0].planes["Y"]
    scale = max(1.0, float(np.abs(b).max()))
    assert np.abs(a - b).max() <= 3e-5 * scale


def test_chain_yuv_end_to_end_engine():
    """Chain on a subsampled format: chroma composes too; the composed
    operator re-enters the normal engine selector."""
    clip = Clip.from_frames([random_frame(yuv420p(8), 64, 48, seed=3)])
    stages = [
        dict(target_width=128, target_height=96),
        dict(target_width=256, target_height=192),
    ]
    r = ChainResizer(
        clip.format,
        64,
        48,
        [JincConfig(**s) for s in stages],
        frame0=clip.frames[0],
    )
    assert set(r.engines) == {"luma", "chroma"}
    out = r(clip)
    f = out.frames[0].validate()
    assert f.planes["Y"].shape == (192, 256)
    assert f.planes["U"].shape == (96, 128)
    assert f.props["_ChromaLocation"] == 0
    # Engine parity on the composed operators: the selected engine must match
    # the scalar golden of the composed operator within 1 LSB. (A comparison
    # against the sequential integer pipeline is NOT expected to match —
    # compose skips the intermediate round/clamp by design, a documented
    # quality-improving deviation; measured up to ~13 LSB on noise edges.)
    from jincresize_tpu.golden import apply_plane_numpy

    for n, op in (("Y", r.op_luma), ("U", r.op_chroma), ("V", r.op_chroma)):
        ref = apply_plane_numpy(
            op, clip.frames[0].planes[n], out_dtype=np.uint8, peak=255
        )
        d = np.abs(f.planes[n].astype(int) - ref.astype(int)).max()
        assert d <= 1, (n, d)


def test_chain_composed_cache(monkeypatch, tmp_path):
    monkeypatch.setenv("JINCRESIZE_CACHE_DIR", str(tmp_path))
    clip = Clip.from_frames([random_frame(gray(8), 48, 40, seed=4)])
    cfgs = [
        JincConfig(target_width=72, target_height=60, tap=2),
        JincConfig(target_width=96, target_height=80, tap=2),
    ]
    r1 = ChainResizer(clip.format, 48, 40, cfgs, frame0=clip.frames[0])
    assert list(tmp_path.glob("chain_*.npz")), "composed cache entry missing"
    assert r1.stages, "cold chain should have built stage operators"

    import jincresize_tpu.compose as compose_mod

    def boom(a, b):
        raise AssertionError("compose called despite warm chain cache")

    monkeypatch.setattr(compose_mod, "compose", boom)
    r2 = ChainResizer(clip.format, 48, 40, cfgs, frame0=clip.frames[0])
    assert not r2.stages, "warm chain must skip stage builds"
    assert np.array_equal(r1.op_luma.start_x, r2.op_luma.start_x)
    out1 = r1(clip).frames[0].planes["Y"]
    out2 = r2(clip).frames[0].planes["Y"]
    assert np.array_equal(out1, out2)


def test_mesh_requires_compatible_impl():
    from jincresize_tpu.api import JincError

    clip = Clip.from_frames([random_frame(gray(8), 48, 40, seed=5)])
    with pytest.raises(JincError, match="mesh"):
        api.JincResizer(
            clip.format,
            48,
            40,
            JincConfig(target_width=72, target_height=60, impl="xla"),
            frame0=clip.frames[0],
            mesh=object(),
        )
