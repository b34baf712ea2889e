"""Parity harness tests: torch twin → converted flax params → same outputs.

This is the harness SURVEY.md §5/§8-step-9 requires for reference-checkpoint
parity; with the reference mount empty it is exercised against the in-repo
torch twin (identical architecture), proving the converter and both
implementations agree to float32 tolerance.
"""

import dataclasses

import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import BatchIterator, make_dataset

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def fp32_cfg():
    cfg = get_config("synthetic_tiny")
    return cfg.replace(
        model=dataclasses.replace(cfg.model, dtype="float32",
                                  use_pallas_fusion=False)
    )


def test_torch_flax_output_parity(fp32_cfg):
    from drn_tpu.parity.compare import compare_models

    ds = make_dataset(fp32_cfg.data, fp32_cfg.model, split="train")
    batch = next(BatchIterator(ds, 8, shuffle=False).epoch(0))
    diffs = compare_models(fp32_cfg, batch)
    for k, v in diffs.items():
        assert v < 1e-4, f"{k}: max abs diff {v}"


def test_end_to_end_ranked_output_parity(fp32_cfg):
    """The WHOLE inference path — decode → score → top-k → NMS → recall —
    matches the reference's serial NumPy semantics, not just the network:
    the torch twin's raw outputs pushed through the NumPy oracle must yield
    the same ranked segments, survival mask, and R@n,IoU@m counts as the
    flax jitted eval step (SURVEY.md §4.3; VERDICT r1 missing #2)."""
    import jax
    import jax.numpy as jnp

    from drn_tpu.evaluate import make_eval_step
    from drn_tpu.parity.convert import torch_state_to_flax
    from drn_tpu.parity.oracle import reference_postprocess
    from drn_tpu.parity.torch_model import TorchDRNParity
    from drn_tpu.train import build_model

    cfg = fp32_cfg
    ds = make_dataset(cfg.data, cfg.model, split="train")
    batch = next(BatchIterator(ds, 8, shuffle=False).epoch(0))

    torch.manual_seed(0)
    tm = TorchDRNParity(cfg.model, base_len=cfg.data.num_clips).eval()
    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(batch["features"]),
            torch.from_numpy(batch["word_ids"].astype(np.int64)),
            torch.from_numpy(batch["query_mask"]),
        )
    oracle = reference_postprocess(
        {k: np.asarray(t_out[k])
         for k in ("segments", "match_logits", "iou_logits")},
        gt=batch["gt_grid"], valid=batch["valid"],
        top_k=cfg.eval.top_k,
        nms_iou_threshold=cfg.eval.nms_iou_threshold,
        score_use_iou_head=cfg.eval.score_use_iou_head,
        # Forward the blend explicitly — the oracle's own default merely
        # mirrors EvalConfig's, and this test must track cfg, not a
        # coincidence of two defaults.
        score_iou_weight=cfg.eval.score_iou_weight,
        ns=cfg.eval.recall_ns, iou_thresholds=cfg.eval.iou_thresholds,
    )

    params = torch_state_to_flax(tm.state_dict(), cfg.model)
    model = build_model(cfg)
    step = make_eval_step(cfg, model)
    counts, n_valid, segs_sec, keep, scores = jax.device_get(
        step(params, {k: jnp.asarray(v) for k, v in batch.items()})
    )

    # identical survival mask and candidate ordering
    np.testing.assert_array_equal(keep, oracle["keep"])
    np.testing.assert_allclose(scores, oracle["scores"], atol=1e-5)
    # eval step returns segments scaled to seconds; undo for comparison
    scale = (batch["duration"] / cfg.data.num_clips)[:, None, None]
    np.testing.assert_allclose(
        segs_sec / scale, oracle["sorted_segments"], atol=1e-3
    )
    # identical recall counts, key by key (recall hits are integers —
    # exact; the mIoU accumulator is an IoU sum — fp tolerance)
    from drn_tpu.ops.metrics import MIOU_KEY

    assert float(n_valid) == float(np.sum(batch["valid"]))
    for k, v in oracle["counts"].items():
        if k == MIOU_KEY:
            np.testing.assert_allclose(float(counts[k]), v, atol=1e-3)
        else:
            assert float(counts[k]) == v, (k, float(counts[k]), v)


def test_checkpoint_file_roundtrip(fp32_cfg, tmp_path):
    """torch.save → load_torch_checkpoint matches in-memory conversion."""
    import jax

    from drn_tpu.parity.convert import load_torch_checkpoint, torch_state_to_flax
    from drn_tpu.parity.torch_model import TorchDRNParity

    torch.manual_seed(0)
    tm = TorchDRNParity(fp32_cfg.model, base_len=fp32_cfg.data.num_clips)
    path = tmp_path / "ref.pth"
    torch.save({"epoch": 3, "model": tm.state_dict()}, path)

    direct = torch_state_to_flax(tm.state_dict(), fp32_cfg.model)
    loaded = load_torch_checkpoint(str(path), fp32_cfg.model)
    flat_d = jax.tree_util.tree_leaves(direct)
    flat_l = jax.tree_util.tree_leaves(loaded)
    assert len(flat_d) == len(flat_l)
    for a, b in zip(flat_d, flat_l):
        np.testing.assert_array_equal(a, b)


def test_converted_tree_matches_init_structure(fp32_cfg):
    """Converted pytree must be structurally identical to DRN.init's tree."""
    import jax
    import jax.numpy as jnp

    from drn_tpu.parity.convert import torch_state_to_flax
    from drn_tpu.parity.torch_model import TorchDRNParity
    from drn_tpu.train import build_model

    tm = TorchDRNParity(fp32_cfg.model, base_len=fp32_cfg.data.num_clips)
    converted = torch_state_to_flax(tm.state_dict(), fp32_cfg.model)

    model = build_model(fp32_cfg)
    d = fp32_cfg.data
    ref = model.init(
        jax.random.key(0),
        jnp.zeros((1, d.num_clips, fp32_cfg.model.feature_dim)),
        jnp.zeros((1, d.max_query_len), jnp.int32),
        jnp.ones((1, d.max_query_len), bool),
    )
    ref_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(ref)
    }
    conv_paths = {
        jax.tree_util.keystr(p): np.asarray(l).shape
        for p, l in jax.tree_util.tree_leaves_with_path(converted)
    }
    assert ref_paths == conv_paths
