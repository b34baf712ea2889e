"""torch→Orbax conversion CLI: .pth in, native checkpoint out, params equal
the in-memory conversion (the one-time migration path for reference users).
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_convert_cli_roundtrip(tmp_path, capsys):
    from drn_tpu.config import get_config
    from drn_tpu.parity.convert import load_torch_checkpoint, main
    from drn_tpu.parity.torch_model import TorchDRNParity
    from drn_tpu.utils.checkpoint import CheckpointManager
    from drn_tpu.train import build_model, init_state, make_optimizer

    cfg = get_config("synthetic_tiny")
    torch.manual_seed(0)
    tm = TorchDRNParity(cfg.model, base_len=cfg.data.num_clips)
    pth = tmp_path / "twin.pth"
    torch.save({"model": tm.state_dict()}, pth)
    out = tmp_path / "orbax"

    main(["--config", "synthetic_tiny",
          "--torch-checkpoint", str(pth), "--out", str(out)])
    assert "wrote Orbax checkpoint" in capsys.readouterr().out

    want = load_torch_checkpoint(str(pth), cfg.model)
    model = build_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 1), jax.random.key(0))
    ckpt = CheckpointManager(str(out))
    restored = ckpt.restore({"params": state.params}, partial=True)
    ckpt.close()
    assert restored is not None
    wmap = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(want)}
    gmap = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(restored["params"])}
    assert set(wmap) == set(gmap)
    for k in wmap:
        np.testing.assert_array_equal(
            np.asarray(wmap[k]), np.asarray(gmap[k]), err_msg=k)
