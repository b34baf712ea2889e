"""End-to-end test of the single-query inference CLI (drn_tpu.infer)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_infer_cli_torch_checkpoint(tmp_path, capsys):
    from drn_tpu.config import get_config
    from drn_tpu.infer import main
    from drn_tpu.parity.torch_model import TorchDRNParity

    rng = np.random.default_rng(0)
    feats = tmp_path / "vid.npy"
    np.save(feats, rng.normal(size=(48, 128)).astype(np.float32))

    cfg = get_config("synthetic_tiny")
    tm = TorchDRNParity(cfg.model, base_len=cfg.data.num_clips)
    ckpt = tmp_path / "twin.pth"
    torch.save({"model": tm.state_dict()}, ckpt)

    main(["--config", "synthetic_tiny", "--torch-checkpoint", str(ckpt),
          "--features", str(feats), "--duration", "60",
          "--query", "a person opens the door", "--query", "someone waves",
          "--top", "3"])
    out = capsys.readouterr().out
    assert out.count("query:") == 2
    # three ranked segments per query, seconds within the video duration
    import re

    segs = re.findall(r"\[\s*([\d.]+)s,\s*([\d.]+)s\]", out)
    assert len(segs) == 6
    for s, e in segs:
        assert 0.0 <= float(s) <= float(e) <= 60.0 + 1e-6
