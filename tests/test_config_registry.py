"""Config registry invariants.

The per-config defaults encode measured decisions (eval batch sweeps,
feature dims of the public releases, pyramid geometry — see the trail
comments in drn_tpu/config.py); these tests pin the structural rules so
a future registry edit can't silently break a scenario.
"""

import pytest

from drn_tpu.config import get_config, list_configs

EXPECTED_FEATURE_DIMS = {
    # (dataset, feature_type) -> released feature dim
    ("charades", "c3d"): 4096,
    ("charades", "i3d"): 1024,
    ("activitynet", "i3d"): 1024,
    ("activitynet", "c3d"): 500,  # ActivityNet ships PCA-500 C3D
    ("tacos", "c3d"): 4096,
}


@pytest.mark.parametrize("name", list_configs())
def test_registry_entry_is_consistent(name):
    cfg = get_config(name)
    m, d, t, e = cfg.model, cfg.data, cfg.train, cfg.eval

    assert cfg.name == name
    assert len(m.level_ranges) == m.num_levels
    # ranges must tile [0, ...] in order and overlap-free
    for lo, hi in m.level_ranges:
        assert 0.0 <= lo < hi
    for (a, b), (c, dd) in zip(m.level_ranges, m.level_ranges[1:]):
        assert b == c, f"level_ranges not contiguous in {name}"

    assert d.batch_size > 0 and e.batch_size > 0
    assert d.num_clips > 0 and d.num_clips % 2 == 0  # stride-2 pyramid
    assert d.max_query_len > 0
    assert e.top_k > 0 and e.top_k <= d.num_clips * m.num_levels
    assert 0.0 < e.nms_iou_threshold < 1.0
    assert t.accum_steps >= 1

    key = (d.dataset, d.feature_type)
    if key in EXPECTED_FEATURE_DIMS:
        assert m.feature_dim == EXPECTED_FEATURE_DIMS[key], (
            f"{name}: feature_dim {m.feature_dim} does not match the "
            f"public {key} release ({EXPECTED_FEATURE_DIMS[key]})")


def test_registry_covers_baseline_scenarios():
    names = set(list_configs())
    for required in ("charades_c3d", "charades_i3d",
                     "charades_c3d_batched_eval", "activitynet_i3d",
                     "activitynet_c3d", "tacos_c3d", "synthetic_tiny"):
        assert required in names


def test_swept_eval_batches_pinned():
    """Eval batch defaults are MEASURED optima (logs/sweep_r3.log); changing
    them requires re-measuring — see config.py trail comments."""
    assert get_config("charades_c3d_batched_eval").eval.batch_size == 48
    assert get_config("charades_i3d").eval.batch_size == 64
    assert get_config("activitynet_c3d").eval.batch_size == 16
    assert get_config("activitynet_i3d").eval.batch_size == 16
    # moved up from 8 by the blocked-IoU-sampling rewrite (r3): the
    # O(B·3N·N) selection tensor was what rolled the 512-clip grid over
    # at small batches — trail in config.py.
    assert get_config("tacos_c3d").eval.batch_size == 32


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        get_config("nope")
