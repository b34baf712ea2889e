"""GloVe-mode end-to-end: dataset-filtered vocab, table wired to the model.

Covers the reference's torchtext-GloVe path (SURVEY.md §3 "Query encoder")
with a tiny synthetic GloVe file + Charades-style annotations + .npy
features — no downloads.
"""

import dataclasses

import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.data.pipeline import build_vocab, make_dataset
from drn_tpu.data.vocab import PAD_ID, UNK_ID, Vocab

SENTS = [
    "person opens the door",
    "someone closes a window",
    "person reads the book",
]
GLOVE_WORDS = ["the", "person", "opens", "door", "closes", "window",
               "a", "reads", "unrelated", "extra"]  # no "someone", "book"


@pytest.fixture()
def fixtures(tmp_path):
    dim = 16
    rng = np.random.default_rng(0)
    glove = tmp_path / "glove.txt"
    with open(glove, "w") as f:
        for w in GLOVE_WORDS:
            vec = " ".join(f"{v:.4f}" for v in rng.normal(size=dim))
            f.write(f"{w} {vec}\n")
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    for split, n in (("train", 6), ("test", 3)):
        with open(tmp_path / f"charades_sta_{split}.txt", "w") as f:
            for i in range(n):
                vid = f"{split.upper()}{i}"
                np.save(feats_dir / f"{vid}.npy",
                        rng.normal(size=(40, 64)).astype(np.float32))
                f.write(f"{vid} 2.0 18.0##{SENTS[i % len(SENTS)]}\n")
    cfg = get_config("synthetic_tiny")
    return cfg.replace(
        model=dataclasses.replace(cfg.model, embed_dim=dim, feature_dim=64),
        data=dataclasses.replace(
            cfg.data, dataset="charades", feature_type="c3d",
            feature_dir=str(feats_dir),
            annotation_path=str(tmp_path / "charades_sta_{split}.txt"),
            glove_path=str(glove), batch_size=4,
        ),
    )


def test_filtered_vocab(fixtures):
    cfg = fixtures
    vocab = build_vocab(cfg.data, cfg.model)
    # only words present in BOTH the annotations and the GloVe file
    kept = set(vocab.word_to_id)
    assert "person" in kept and "door" in kept
    assert "unrelated" not in kept          # glove-only
    assert "someone" not in kept            # annotation-only (OOV → UNK)
    assert vocab.embeddings.shape == (len(kept) + 2, cfg.model.embed_dim)
    ids, mask = vocab.encode(["someone", "door"], 4)
    assert ids[0] == UNK_ID and ids[1] >= 2 and ids[2] == PAD_ID


def test_glove_train_eval_end_to_end(fixtures, tmp_path):
    cfg = fixtures
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ckpt"), num_epochs=1,
        eval_every_epochs=1, log_every_steps=1000,
    ))
    from drn_tpu.train import train

    state = train(cfg, max_steps=2)
    # embedding table is the filtered GloVe table, not cfg.vocab_size
    emb = state.params["params"]["query_encoder"]["embedding"]["embedding"]
    vocab = build_vocab(cfg.data, cfg.model)
    assert emb.shape == vocab.embeddings.shape
    np.testing.assert_allclose(np.asarray(emb), vocab.embeddings, atol=1e-6)

    from drn_tpu.evaluate import evaluate
    from drn_tpu.train import build_model

    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    ds = make_dataset(cfg.data, cfg.model, vocab=vocab, split="test")
    results = evaluate(cfg, model, state.params, dataset=ds)
    assert all(0.0 <= v <= 100.0 for v in results.values())
