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
