"""linear_time_sample: selection-matmul form vs a NumPy gather-lerp oracle.

The rewrite from take_along_axis to one-hot matmuls (21% whole-step win on
v5e) must stay numerically identical — each output row accumulates exactly
one nonzero product, so dtype and accumulation order cannot change the
result. These tests pin that equivalence in fp32 (exact) and bf16 (exact
selection, lerp in fp32).
"""

import jax.numpy as jnp
import numpy as np

from drn_tpu.models.layers import linear_time_sample


def _oracle(feat, pos):
    """Reference gather-lerp in NumPy (the pre-rewrite formulation)."""
    b, t, d = feat.shape
    pos = np.clip(pos, 0.0, t - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    w = (pos - lo)[..., None].astype(np.float32)
    f_lo = np.take_along_axis(feat, lo[..., None], axis=1).astype(np.float32)
    f_hi = np.take_along_axis(feat, hi[..., None], axis=1).astype(np.float32)
    return f_lo * (1.0 - w) + f_hi * w


def test_matches_gather_oracle_fp32():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(3, 17, 8)).astype(np.float32)
    pos = rng.uniform(-2.0, 20.0, size=(3, 11)).astype(np.float32)
    got = np.asarray(linear_time_sample(jnp.asarray(feat), jnp.asarray(pos)))
    np.testing.assert_array_equal(got, _oracle(feat, pos))


def test_matches_gather_oracle_bf16_selection_exact():
    rng = np.random.default_rng(1)
    feat32 = rng.normal(size=(2, 9, 4)).astype(np.float32)
    feat = jnp.asarray(feat32, jnp.bfloat16)
    pos = rng.uniform(0.0, 8.0, size=(2, 7)).astype(np.float32)
    got = np.asarray(
        linear_time_sample(feat, jnp.asarray(pos)), np.float32
    )
    want = _oracle(np.asarray(feat, np.float32), pos)
    np.testing.assert_array_equal(got, want)


def test_integer_positions_select_exactly():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(2, 6, 5)).astype(np.float32)
    pos = np.asarray([[0.0, 3.0, 5.0], [1.0, 1.0, 4.0]], np.float32)
    got = np.asarray(linear_time_sample(jnp.asarray(feat), jnp.asarray(pos)))
    for b in range(2):
        for n, p in enumerate(pos[b]):
            np.testing.assert_array_equal(got[b, n], feat[b, int(p)])


def test_blocked_samples_bit_identical_to_flat():
    """IoU-head per-level blocked sampling == flat sampling over the level
    concat, bit-for-bit — including the fp32 `pos − lo_ℓ` rebasing (exact
    by Sterbenz because level offsets ≥ level size − 1). Pins the round-3
    rewrite that removed the block-diagonal zero FLOPs (~22% of the TACoS
    eval step)."""
    from drn_tpu.models.heads import (blocked_segment_samples,
                                      flat_segment_samples)

    rng = np.random.default_rng(3)
    sizes = [32, 16, 8, 4]  # 4-level pyramid, halving (the TACoS shape)
    b, d = 3, 6
    pyramid = [jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
               for t in sizes]
    n = sum(sizes)
    starts = np.cumsum([0] + sizes[:-1]).astype(np.float32)
    level_ids = np.concatenate(
        [np.full(t, i) for i, t in enumerate(sizes)])
    lo = starts[level_ids]
    hi = lo + np.asarray(sizes, np.float32)[level_ids] - 1.0
    # flat positions clipped inside each location's own level, fractional,
    # including exact-boundary and sub-grid values. The range spans the
    # FULL flat grid (levels 2-3 live at offsets 48/56-59): a narrower
    # range would clip every deep-level position to exactly lo, never
    # exercising fractional `pos − lo` rebasing at large offsets.
    raw = rng.uniform(-4.0, 64.0, size=(b, 3 * n)).astype(np.float32)
    pos = np.clip(raw, np.tile(lo, 3), np.tile(hi, 3))
    pos = jnp.asarray(pos)

    got = np.asarray(blocked_segment_samples(pyramid, pos, sizes))
    want = np.asarray(flat_segment_samples(pyramid, pos, sizes))
    np.testing.assert_array_equal(got, want)
    # and the flat form itself matches the raw concat sampling layout
    s = np.asarray(linear_time_sample(jnp.concatenate(pyramid, axis=1), pos))
    np.testing.assert_array_equal(
        want,
        np.concatenate([s[:, :n], s[:, n : 2 * n], s[:, 2 * n :]], axis=-1),
    )


def test_out_of_range_positions_clip():
    feat = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    pos = np.asarray([[-5.0, 99.0]], np.float32)
    got = np.asarray(linear_time_sample(jnp.asarray(feat), jnp.asarray(pos)))
    np.testing.assert_array_equal(got[0, 0], feat[0, 0])
    np.testing.assert_array_equal(got[0, 1], feat[0, -1])


def test_iou_fold_mix_equivalent_and_gated():
    """The mix-fold (`iou_fold_mix_min_locations`) folds mix_0 through
    the (linear) sampling on the blocked-dispatch path:
    mix0(concat_k(Sel_k @ F)) == Σ_k Sel_k @ (F @ W0_k). Equivalent up
    to bf16 accumulation order (values AND the param tree — the fold
    reads mix_0's params, it never creates new ones), and inert below
    _BLOCKED_SAMPLING_MIN_LOCATIONS even at threshold 0, so the tiny
    configs' bit-level parity pins are untouched. Perf trail:
    scripts/iou_mix_probe.py + design.md §4.2."""
    import dataclasses

    import jax

    from drn_tpu.config import ModelConfig
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.heads import (_BLOCKED_SAMPLING_MIN_LOCATIONS,
                                      IoUHead)

    rng = np.random.default_rng(7)
    base, b = 256, 2  # N = 256+128+64+32 = 480 ≥ blocked threshold
    m = ModelConfig(
        feature_dim=64, hidden_dim=32, num_levels=4,
        level_ranges=((0.0, 0.12), (0.12, 0.25), (0.25, 0.5), (0.5, 2.0)),
        iou_fold_mix_min_locations=10 ** 9,  # `m` = unfolded reference
    )
    sizes = [base // 2 ** l for l in range(m.num_levels)]
    assert sum(sizes) >= _BLOCKED_SAMPLING_MIN_LOCATIONS
    pyramid = [
        jnp.asarray(rng.normal(size=(b, t, m.hidden_dim)), jnp.bfloat16)
        for t in sizes
    ]
    n = sum(sizes)
    _, strides, level_ids = location_metadata(m, base)
    segments = jnp.asarray(
        np.sort(rng.uniform(0, base, size=(b, n, 2)), axis=-1), jnp.float32)

    params = IoUHead(m).init(
        jax.random.key(0), pyramid, segments, level_ids, strides)["params"]
    # threshold 0 = fold wherever the blocked dispatch is active
    m_fold = dataclasses.replace(m, iou_fold_mix_min_locations=0)
    # init under the fold flag creates the IDENTICAL param tree (init
    # always takes the unfolded branch)
    params_fold = IoUHead(m_fold).init(
        jax.random.key(0), pyramid, segments, level_ids, strides)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fold)

    ya = np.asarray(IoUHead(m).apply(
        {"params": params}, pyramid, segments, level_ids, strides))
    yb = np.asarray(IoUHead(m_fold).apply(
        {"params": params}, pyramid, segments, level_ids, strides))
    rel = np.abs(ya - yb).max() / max(1e-6, np.abs(ya).max())
    assert rel < 2e-2, rel  # bf16 accumulation-order tolerance

    # below the blocked threshold the fold is inert even at threshold 0:
    # bit-identical
    base_s = 64  # N = 64+32+16+8 = 120 < 256
    sizes_s = [base_s // 2 ** l for l in range(m.num_levels)]
    pyr_s = [
        jnp.asarray(rng.normal(size=(b, t, m.hidden_dim)), jnp.bfloat16)
        for t in sizes_s
    ]
    n_s = sum(sizes_s)
    _, strides_s, level_ids_s = location_metadata(m, base_s)
    seg_s = jnp.asarray(
        np.sort(rng.uniform(0, base_s, size=(b, n_s, 2)), axis=-1),
        jnp.float32)
    pr = IoUHead(m).init(
        jax.random.key(1), pyr_s, seg_s, level_ids_s, strides_s)["params"]
    za = np.asarray(IoUHead(m).apply(
        {"params": pr}, pyr_s, seg_s, level_ids_s, strides_s))
    zb = np.asarray(IoUHead(m_fold).apply(
        {"params": pr}, pyr_s, seg_s, level_ids_s, strides_s))
    np.testing.assert_array_equal(za, zb)


def test_iou_fold_mix_gradient_path_at_production_width():
    """The fold is live in the stage-2 TRAINING graph (TACoS N=960 ≥ the
    512 gate), where mix_0's params are consumed via `self.variables` +
    a functional LayerNorm.apply instead of declared submodules — so the
    backward through that read path must match the unfolded module's, at
    PRODUCTION width (CLAUDE.md: tiny configs mask this class of bug).
    fp32 end to end so the only divergence left is matmul reassociation;
    checks grads wrt BOTH the params (Adam's view, incl. mix_0 getting
    nonzero grads through the variables read) and the pyramid inputs
    (the path stage-2 joint training backprops into the FPN/backbone)."""
    import dataclasses

    import jax

    from drn_tpu.config import ModelConfig
    from drn_tpu.models.drn import location_metadata
    from drn_tpu.models.heads import IoUHead

    rng = np.random.default_rng(11)
    base, b = 256, 2  # N = 256+128+64+32 = 480: blocked + foldable
    m = ModelConfig(
        feature_dim=1024, hidden_dim=512, num_levels=4, dtype="float32",
        level_ranges=((0.0, 0.12), (0.12, 0.25), (0.25, 0.5), (0.5, 2.0)),
        iou_fold_mix_min_locations=10 ** 9,  # `m` = unfolded reference
    )
    m_fold = dataclasses.replace(m, iou_fold_mix_min_locations=0)
    sizes = [base // 2 ** l for l in range(m.num_levels)]
    n = sum(sizes)
    pyramid = [
        jnp.asarray(rng.normal(size=(b, t, m.hidden_dim)), jnp.float32)
        for t in sizes
    ]
    _, strides, level_ids = location_metadata(m, base)
    segments = jnp.asarray(
        np.sort(rng.uniform(0, base, size=(b, n, 2)), axis=-1), jnp.float32)
    targets = jnp.asarray(rng.uniform(0, 1, size=(b, n)), jnp.float32)

    params = IoUHead(m).init(
        jax.random.key(0), pyramid, segments, level_ids, strides)["params"]

    def loss_fn(mdl):
        def f(p, pyr):
            pred = IoUHead(mdl).apply(
                {"params": p}, pyr, segments, level_ids, strides)
            return jnp.mean((pred - targets) ** 2)  # stage-2 IoU MSE shape
        return f

    ga_p, ga_x = jax.value_and_grad(loss_fn(m), argnums=(0, 1))(
        params, pyramid)[1]
    gb_p, gb_x = jax.value_and_grad(loss_fn(m_fold), argnums=(0, 1))(
        params, pyramid)[1]

    # mix_0 receives real gradient through the fold's variables read.
    k_fold = np.asarray(gb_p["mix_0"]["Conv_0"]["kernel"])
    assert np.isfinite(k_fold).all() and np.abs(k_fold).max() > 0

    def flat(tree):
        return jax.tree_util.tree_leaves_with_path(tree)

    for (path_a, a), (_, bb) in zip(flat(ga_p), flat(gb_p)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            a, bb, rtol=2e-3, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(path_a))
    for i, (a, bb) in enumerate(zip(ga_x, gb_x)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, bb, rtol=2e-3, atol=2e-4 * scale,
                                   err_msg=f"pyramid level {i}")
