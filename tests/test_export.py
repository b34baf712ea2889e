"""AOT export roundtrip: serialize the eval step, reload, match live outputs.

The serving contract (drn_tpu/export.py): one StableHLO artifact carries the
full inference semantics — forward, decode, scoring, top-k, temporal NMS,
seconds scaling — callable with (params, batch) and NO model code.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from drn_tpu.config import get_config
from drn_tpu.evaluate import make_eval_step
from drn_tpu.export import (batch_spec, export_eval_step, load_exported,
                            main as export_main, save_exported)
from drn_tpu.train import build_model, init_state, make_optimizer


def _setup():
    cfg = get_config("synthetic_tiny")
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    return cfg, model, state.params


def _batch(cfg, b=4, seed=0):
    rng = np.random.default_rng(seed)
    t, f, l = cfg.data.num_clips, cfg.model.feature_dim, cfg.data.max_query_len
    return {
        "features": jnp.asarray(rng.normal(size=(b, t, f)), jnp.float32),
        "word_ids": jnp.asarray(
            rng.integers(2, cfg.model.vocab_size, (b, l)), jnp.int32),
        "query_mask": jnp.asarray(
            np.arange(l)[None] < rng.integers(2, l + 1, (b, 1))),
        "gt_grid": jnp.asarray(
            np.stack([np.full(b, 4.0), np.full(b, 12.0)], -1), jnp.float32),
        "duration": jnp.full((b,), 30.0, jnp.float32),
        "valid": jnp.ones((b,), bool),
    }


def test_export_roundtrip_matches_live_step(tmp_path):
    cfg, model, params = _setup()
    batch = _batch(cfg)
    exported, sidecar = export_eval_step(
        cfg, model, params, batch_size=4,
        platforms=(jax.default_backend(),),
    )
    path = str(tmp_path / "drn.hlo")
    save_exported(exported, sidecar, path)
    assert os.path.exists(path) and os.path.exists(path + ".json")

    call, sc = load_exported(path)
    assert sc["config"] == cfg.name
    got = call(params, batch)
    counts, n_valid, segs_sec, keep, scores = make_eval_step(cfg, model)(
        params, batch
    )
    from drn_tpu.ops.metrics import metric_name

    want = {
        "recall_counts": {metric_name(k): v for k, v in counts.items()},
        "n_valid": n_valid,
        "segments_seconds": segs_sec,
        "nms_keep": keep,
        "scores": scores,
    }
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(jax.tree.leaves(got[k]), jax.tree.leaves(want[k])):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(w, np.float32),
                                       rtol=1e-5, atol=1e-5, err_msg=k)


def test_batch_spec_matches_eval_contract():
    cfg, model, params = _setup()
    spec = batch_spec(cfg, batch_size=4)
    batch = _batch(cfg)
    assert set(spec) == set(batch)
    for k, s in spec.items():
        assert tuple(s.shape) == tuple(batch[k].shape), k
        assert s.dtype == batch[k].dtype, k


def test_export_cli(tmp_path):
    out = str(tmp_path / "cli.hlo")
    export_main(["--config", "synthetic_tiny", "--batch-size", "2",
                 "--platforms", jax.default_backend(), "--out", out])
    with open(out + ".json") as f:
        sc = json.load(f)
    assert sc["batch"]["features"][0][0] == 2
    call, _ = load_exported(out)
    cfg, model, params = _setup()
    got = call(params, _batch(cfg, b=2))
    assert np.isfinite(float(jax.tree.leaves(got)[0]))
