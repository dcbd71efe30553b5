"""Compacted megakernel (v5) vs the XLA realtime pipeline and the dense v3
megakernel (interpret mode, fp32). The compaction is a data-movement
reshuffle, not an approximation — counts must match exactly and rgb must
match the XLA pipeline to the same tolerance v3 does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adanerf_tpu.config import Config
from adanerf_tpu.ops.pallas.megakernel import (make_megakernel,
                                               pack_oracle_weights,
                                               prep_inputs)
from adanerf_tpu.ops.pallas.megakernel3 import make_megakernel_compact
from adanerf_tpu.ops.pallas.megakernel import pack_nerf_weights
from adanerf_tpu.realtime import RealtimeRenderer
from adanerf_tpu.train_state import TrainState

from scene_utils import dense_config_args, make_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_mk3")))
    log = str(tmp_path_factory.mktemp("logs_mk3"))
    config = Config.init(argv=dense_config_args(scene, log, threshold=0.2))
    ts = TrainState()
    ts.initialize(config)
    return ts


def _run(ts, dirs, pose, rot, **kw):
    build = make_megakernel_compact(ts.model_defs[0], ts.model_defs[1],
                                    ts.scene, ts.config_file, interpret=True,
                                    **kw)
    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    out = np.asarray(build(po, pn)(*prep_inputs(
        jnp.asarray(dirs), jnp.asarray(pose), jnp.asarray(rot))))
    return out[:, :3], out[:, 3].astype(int)


def test_compact_matches_pipeline(setup):
    ts = setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    dataset = ts.test_dataset
    dirs = dataset.directions[:128]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_mk, counts_mk = _run(ts, dirs, pose, rot, tile=64, chunk=64)

    rgb_ref = rt.render_frame(pose, rot, dirs)
    packed, mask, n_act = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                                        jnp.asarray(rot), jnp.asarray(dirs))
    counts_ref = np.asarray(mask).sum(axis=1)

    np.testing.assert_array_equal(counts_mk, counts_ref)
    np.testing.assert_allclose(rgb_mk, rgb_ref, atol=2e-4)


def test_compact_matches_dense_v3_exactly(setup):
    """v5 must reproduce v3 (same kernel numerics, compacted data movement)
    bit-for-bit in fp32 interpret mode."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:192]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    po = pack_oracle_weights(ts.model_defs[0], ts.params[0],
                             dtype=jnp.float32)
    pn = pack_nerf_weights(ts.model_defs[1], ts.params[1], dtype=jnp.float32)
    v3 = make_megakernel(ts.model_defs[0], ts.model_defs[1], ts.scene,
                         ts.config_file, tile=64, interpret=True)(po, pn)
    out3 = np.asarray(v3(*prep_inputs(jnp.asarray(dirs), jnp.asarray(pose),
                                      jnp.asarray(rot))))

    rgb5, counts5 = _run(ts, dirs, pose, rot, tile=64, chunk=64)
    np.testing.assert_array_equal(counts5, out3[:, 3].astype(int))
    # v5's lane-packed norm reduces (l*l).sum() pairwise where v3 chains
    # lx2+ly2+lz2 -> 1-ulp differences on a handful of pixels; anything
    # beyond 2 ulp is a real bug
    np.testing.assert_allclose(rgb5, out3[:, :3], atol=1.5e-7, rtol=0)


@pytest.mark.parametrize("chunk", [32, 128])
def test_compact_chunk_sizes(setup, chunk):
    """Chunk granularity is a pure tiling knob: results identical."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:64]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_a, counts_a = _run(ts, dirs, pose, rot, tile=64, chunk=64)
    rgb_b, counts_b = _run(ts, dirs, pose, rot, tile=64, chunk=chunk)
    np.testing.assert_array_equal(counts_a, counts_b)
    # different MLP batch shapes change the CPU dot's blocking -> 1-ulp
    # reduction-order differences; anything beyond that is a real bug
    np.testing.assert_allclose(rgb_a, rgb_b, atol=2e-7, rtol=0)


def test_dynamic_chunk_loop_exact(setup):
    """v5d (dynamic-trip fori_loop over live chunks) runs the same chunk
    bodies in the same order — bit-identical to the static unroll. v5d is
    the viewer's default --megakernel variant and the S=16 path."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:192]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_a, counts_a = _run(ts, dirs, pose, rot, tile=64, chunk=64)
    rgb_b, counts_b = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                           dynamic=True)
    np.testing.assert_array_equal(counts_a, counts_b)
    np.testing.assert_array_equal(rgb_a, rgb_b)


@pytest.mark.parametrize("group", [2, 3, 4])
def test_dense_group_exact(setup, group):
    """Grouped dense-base passes (G slots stacked into one (G*T, 128)
    encode+MLP batch per fori_loop trip) are a pure batching/cost knob: the
    candidate bases quantize to multiples of G (plus S), so pass coverage
    always equals the chosen base and no live slot is double-shaded. Checked
    including G=3 (S=8 non-multiple: the phantom slots >= S scatter to
    nothing)."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:192]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_a, counts_a = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                           dynamic=True)
    rgb_b, counts_b = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                           dynamic=True, dense_group=group)
    np.testing.assert_array_equal(counts_a, counts_b)
    # a different base moves samples between the dense and gathered paths
    # (same row-local math, different fusion context) and G>1 changes the
    # MLP batch blocking — same ulp class as the chunk-shape tolerance
    np.testing.assert_allclose(rgb_a, rgb_b, atol=5e-7, rtol=0)


def test_dense_tile_fast_path_exact(setup):
    """Tiles where max(count) whole-tile dense passes cost no more MLP rows
    than the compact chunk loop dispatch to the direct (no-gather) dense
    path — same row-local math as the gathered chunk path (the fp32
    hi/mid/lo reconstruction is exact), checked on a mixed-count workload
    and on the two extremes the dispatch exists for: all-sky (count 1 via
    high-threshold fallback) and at-cap (count = S via threshold 0)."""
    ts = setup
    cfg = ts.config_file
    dataset = ts.test_dataset
    dirs = dataset.directions[:192]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    # the fast path runs the same row-local math but in a different fusion
    # context (no gather matmuls around the encode), so the CPU interpret
    # backend's sin/dot blocking differs by 1-2 ulp on a handful of pixels
    # — same class as the chunk-shape tolerance in the tests above
    def check(dense_cost=408, **cfg_over):
        old = {k: getattr(cfg, k) for k in cfg_over}
        try:
            for k, v in cfg_over.items():
                setattr(cfg, k, v)
            rgb_a, counts_a = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                                   dense_path=False)
            rgb_b, counts_b = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                                   dense_cost=dense_cost)
        finally:
            for k, v in old.items():
                setattr(cfg, k, v)
        np.testing.assert_array_equal(counts_a, counts_b)
        np.testing.assert_allclose(rgb_a, rgb_b, atol=5e-7, rtol=0)
        return counts_a

    check()  # mixed counts: cost-argmin base per tile
    # the base is exact at ANY cost weighting: force the argmin to the two
    # ends of the candidate range on the same mixed-count workload
    check(dense_cost=0)         # machinery free -> base rides low
    check(dense_cost=100_000)   # machinery prohibitive -> full dense
    # threshold above every oracle output -> each ray keeps only the
    # argmax-fallback sample -> every tile dense at 1 pass
    counts = check(adaptiveSamplingThreshold=1e9)
    assert (counts == 1).all()
    # threshold 0 -> plain top-S keep -> every ray at the cap (the
    # barbershop/pavillon in-cell regime) -> dense at S passes
    counts = check(adaptiveSamplingThreshold=0.0)
    assert (counts == cfg.numRaymarchSamples[1]).all()


@pytest.mark.parametrize("hook", ["oracle", "select", "zcols", "minimal",
                                  "dense", "compact"])
def test_stop_after_hooks_build_and_run(setup, hook):
    """The profiling ladder (tools/bench_megakernel.py v5:stop_after=...)
    must always build and run — BENCH.md's stage ledgers depend on every
    rung. Hooks return partial data, so only shape and finiteness are
    contractual."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:64]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]
    rgb, _counts = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                        stop_after=hook)
    assert rgb.shape == (64, 3)
    assert np.all(np.isfinite(rgb))


def test_no_depth_range_sampler_matches_pipeline(setup):
    """A *NoDepthRange sampler WITHOUT NDC keeps z as the raw [0,1] bin
    depth in the realtime pipeline (realtime.py z_no_range); the kernel
    must key its z branch the same way, not on useNDC alone."""
    ts = setup
    cfg = ts.config_file
    old = cfg.rayMarchSampler
    try:
        cfg.rayMarchSampler = [old[0], "FromClassifiedDepthAdaptiveNoDepthRange"]
        rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene,
                              cfg, batch_size=128, dtype=None)
        assert rt.z_no_range and not rt.use_ndc
        dataset = ts.test_dataset
        dirs = dataset.directions[:128]
        pose = dataset.poses[0]
        rot = dataset.rotations[0]
        rgb_mk, counts_mk = _run(ts, dirs, pose, rot, tile=64, chunk=64)
        rgb_ref = rt.render_frame(pose, rot, dirs)
        np.testing.assert_allclose(rgb_mk, rgb_ref, atol=2e-4)
    finally:
        cfg.rayMarchSampler = old


def test_unsupported_normalization_rejected(setup):
    """An absent rayMarchNormalization resolves to the MaxDepth default
    elsewhere (normalization.py _SWITCH) — the kernel implements only
    InverseSqrtDistCentered and the explicit \"None\" string, and must
    refuse anything else instead of silently shading a different
    function."""
    ts = setup
    cfg = ts.config_file
    old = cfg.rayMarchNormalization
    try:
        for bad in (None, [old[0], None], [old[0], "MaxDepth"]):
            cfg.rayMarchNormalization = bad
            with pytest.raises(ValueError, match="rayMarchNormalization"):
                make_megakernel_compact(ts.model_defs[0], ts.model_defs[1],
                                        ts.scene, cfg, interpret=True)
    finally:
        cfg.rayMarchNormalization = old




def test_viewer_megakernel_renderer_wiring(setup):
    """viewer.build_megakernel_renderer: pad-to-tile, pose/rot packing and
    count slicing must reproduce the XLA frame renderer on a ragged ray
    count."""
    import viewer as viewer_mod

    ts = setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    dataset = ts.test_dataset
    dirs = dataset.directions[:150]   # not a tile multiple -> exercises pad
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    render = viewer_mod.build_megakernel_renderer(rt, ts.scene, dirs)
    rgb, counts = render(rt.params[0], rt.params[1],
                         jnp.asarray(pose), jnp.asarray(rot), None)

    rgb_ref = rt.render_frame(pose, rot, dirs)
    _pk, mask, _n = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                                  jnp.asarray(rot), jnp.asarray(dirs))
    np.testing.assert_array_equal(np.asarray(counts).astype(int),
                                  np.asarray(mask).sum(axis=1))
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref, atol=2e-4)


@pytest.fixture(scope="module")
def ndc_setup(tmp_path_factory):
    scene = make_scene(str(tmp_path_factory.mktemp("scene_mk3_ndc")))
    log = str(tmp_path_factory.mktemp("logs_mk3_ndc"))
    args = dense_config_args(scene, log, threshold=0.2)
    args[args.index("FromClassifiedDepthAdaptive")] = \
        "FromClassifiedDepthAdaptiveNoDepthRange"
    k = args.index("InverseSqrtDistCentered")
    args[args.index("InverseSqrtDistCentered", k + 1)] = "None"
    args[args.index("log")] = "linear"
    args += ["--useNDC"]
    config = Config.init(argv=args)
    ts = TrainState()
    ts.initialize(config)
    return ts


def test_compact_ndc_matches_pipeline(ndc_setup):
    """v5's in-kernel NDC ray transform (lane-packed ndc_rays + raw [0,1]
    z + unnormalized pos encode + normalized dir encode) must reproduce the
    NDC realtime pipeline."""
    ts = ndc_setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=128, dtype=None)
    assert rt.use_ndc
    dataset = ts.test_dataset
    dirs = dataset.directions[:128]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_mk, counts_mk = _run(ts, dirs, pose, rot, tile=64, chunk=64)

    rgb_ref = rt.render_frame(pose, rot, dirs)
    _pk, mask, _n = rt._oracle_fn(rt.params[0], jnp.asarray(pose),
                                  jnp.asarray(rot), jnp.asarray(dirs))
    np.testing.assert_array_equal(counts_mk, np.asarray(mask).sum(axis=1))
    np.testing.assert_allclose(rgb_mk, rgb_ref, atol=2e-4)




def test_block_permutation_roundtrip():
    import viewer as viewer_mod

    perm, inv = viewer_mod.block_permutation(32, 48, 256)
    assert perm is not None and perm.size == 32 * 48
    assert np.array_equal(np.sort(perm), np.arange(32 * 48))
    x = np.random.RandomState(0).rand(32 * 48, 4)
    np.testing.assert_array_equal(x[perm][inv], x)
    # each consecutive 256-ray tile is one 16x16 image block
    rows, cols = perm[:256] // 32, perm[:256] % 32
    assert rows.max() - rows.min() == 15 and cols.max() - cols.min() == 15
    # non-divisible images fall back to scan order
    assert viewer_mod.block_permutation(100, 30, 256) == (None, None)


def test_block_order_output_invariant(setup):
    """image_size= block reorder must return the SAME image in scan order
    (the permutation is pure data movement around a per-ray kernel)."""
    import viewer as viewer_mod

    ts = setup
    rt = RealtimeRenderer(ts.model_defs, ts.params, ts.scene, ts.config_file,
                          batch_size=1024, dtype=None)
    dataset = ts.test_dataset
    dirs = dataset.directions[:1024]  # 32x32 image at tile 256
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    plain = viewer_mod.build_megakernel_renderer(rt, ts.scene, dirs)
    blocked = viewer_mod.build_megakernel_renderer(rt, ts.scene, dirs,
                                                   image_size=(32, 32))
    rgb_a, counts_a = plain(rt.params[0], rt.params[1],
                            jnp.asarray(pose), jnp.asarray(rot), None)
    rgb_b, counts_b = blocked(rt.params[0], rt.params[1],
                              jnp.asarray(pose), jnp.asarray(rot), None)
    np.testing.assert_array_equal(np.asarray(counts_a), np.asarray(counts_b))
    # tile regrouping changes chunk batching -> ulp-level dot differences
    np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b),
                               atol=2e-7, rtol=0)


def test_act_split_f32_identity(setup):
    """With f32 packing the hi/lo activation split is a no-op by
    construction (_mm takes the plain-dot path) — outputs must be
    bit-identical to the non-split kernel."""
    ts = setup
    dataset = ts.test_dataset
    dirs = dataset.directions[:64]
    pose = dataset.poses[0]
    rot = dataset.rotations[0]

    rgb_a, counts_a = _run(ts, dirs, pose, rot, tile=64, chunk=64)
    rgb_b, counts_b = _run(ts, dirs, pose, rot, tile=64, chunk=64,
                           oracle_split=True, nerf_split=True)
    np.testing.assert_array_equal(counts_a, counts_b)
    np.testing.assert_array_equal(rgb_a, rgb_b)


def test_act_split_recovers_activation_bits():
    """_mm(split=True) must remove (nearly all of) the ACTIVATION rounding:
    against an f32-weight reference, the split path's residual is weight
    rounding only, and the activation-rounding part it eliminates dominates
    the plain path's error by >5x on generic data."""
    from adanerf_tpu.ops.pallas.megakernel import _mm

    class R:  # minimal ref-like wrapper (kernel code indexes with [:])
        def __init__(self, a):
            self.a = a
            self.dtype = a.dtype

        def __getitem__(self, s):
            return self.a[s]

    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    w32 = rng.normal(size=(128, 128)).astype(np.float32)
    w16 = jnp.asarray(w32).astype(jnp.bfloat16)
    # f32 weights + f32 activations, same accumulate order
    ref = np.asarray(_mm(h, R(jnp.asarray(w32)), jnp.float32, False))
    # isolate ACTIVATION rounding: same bf16 weights in both paths
    ref16w = np.asarray(_mm(
        h, R(jnp.asarray(w16).astype(jnp.float32)), jnp.float32, False))
    plain = np.asarray(_mm(h, R(w16), jnp.bfloat16, False))
    split = np.asarray(_mm(h, R(w16), jnp.bfloat16, True))
    act_err_plain = float(np.abs(plain - ref16w).mean())
    act_err_split = float(np.abs(split - ref16w).mean())
    assert act_err_split < act_err_plain / 5, (act_err_split, act_err_plain)
    # and end-to-end (weight rounding included) it must not get worse
    assert float(np.abs(split - ref).mean()) \
        <= float(np.abs(plain - ref).mean())
