"""Config system: frozen dataclasses, one registry entry per BASELINE.json config.

The reference (SURVEY.md §3 "Config/flags") drives everything through argparse
flags plus per-dataset shell scripts. Here every knob is an explicit dataclass
field; named configs in `_REGISTRY` mirror BASELINE.json's five scenarios.
All shapes derived from a config are static so the whole pipeline compiles
under `jit` once per config.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (SURVEY.md §3.3 — tunable, low confidence)."""

    feature_dim: int = 4096          # C3D fc6 = 4096, I3D = 1024
    hidden_dim: int = 512            # model width D
    embed_dim: int = 300             # GloVe 300-d
    vocab_size: int = 8000           # hashed-vocab buckets when GloVe absent
    num_lstm_layers: int = 3         # one level-specific representation per layer
    num_levels: int = 3              # temporal pyramid levels (strides 1/2/4)
    fusion_kernel_size: int = 3      # 1D conv width in the fusion block
    head_tower_layers: int = 2       # convs in loc/match towers (shared across levels)
    iou_head_layers: int = 2
    # max(d_start, d_end) range-of-interest per level, as fractions of the
    # base temporal grid (FCOS-style object_sizes_of_interest, 1-D analogue).
    level_ranges: Tuple[Tuple[float, float], ...] = (
        (0.0, 0.20),
        (0.20, 0.45),
        (0.45, 2.00),
    )
    dtype: str = "bfloat16"          # compute dtype for conv/matmul (MXU-friendly)
    param_dtype: str = "float32"
    # Pallas kernel switches — all OFF by default, and that decision is
    # FINAL per measurement on v5e at flagship shapes (full trail in
    # docs/design.md §3): every kernel loses end-to-end to XLA's own
    # whole-graph fusion (fusion kernel 9.91 vs 9.38 ms; conv blocks
    # 9.73 vs 9.49 ms; stem 11.06 vs 9.38 ms, B=384). The kernels stay
    # as validated, flag-gated alternatives for shapes XLA might
    # mis-schedule; each is numerics-pinned by tests.
    use_pallas_fusion: bool = False
    use_pallas_conv_blocks: bool = False
    use_pallas_stem: bool = False
    # Fold the IoU head's first k=1 mix conv through the (linear) sampling
    # matmuls when the total location count reaches this threshold,
    # eliminating the (B, N, 3D) sampled intermediate:
    # mix0(concat_k(Sel_k @ F)) == Σ_k Sel_k @ (F @ W_k). Identical FLOPs
    # (132.9 GFLOP traced both ways at TACoS shapes), less data movement;
    # equivalent up to bf16 accumulation order (in-module 1.862 →
    # 1.126 ms, scripts/iou_mix_probe.py). The win is SHAPE-DEPENDENT —
    # the fold trades one (B,3T,T) selection per level for three (B,T,T)
    # ones, so small grids pay more small-matmul dispatches than they
    # save in HBM. Measured end-to-end on v5e (iters=96, design.md §4.2):
    # TACoS (N=960, B=32) 5,698/5,708 → 6,216/6,261 q/s (+9.4%, two runs
    # each, logs/fold_ab_tacos_r4.log); ActivityNet (N=480, B=16) LOSES
    # (i3d 17.7k → 16.8/17.4k, c3d 17.4k → 14.9k,
    # logs/fold_ab_anet_r4.log). Threshold 512 splits the measured
    # points; 0 force-enables wherever the blocked dispatch is active
    # (≥256 locations — the fold never applies below that), a huge value
    # disables. A/B: `--model-override iou_fold_mix_min_locations=0`.
    iou_fold_mix_min_locations: int = 512

    def __post_init__(self):
        assert len(self.level_ranges) == self.num_levels


@dataclass(frozen=True)
class DataConfig:
    """Dataset + host-pipeline knobs (SURVEY.md §3 Datasets / §4.4)."""

    dataset: str = "charades"        # charades | activitynet | tacos | synthetic
    feature_type: str = "c3d"        # c3d | i3d
    feature_dir: str = ""            # dir of per-video .npy / single .h5
    annotation_path: str = ""        # charades_sta_{split}.txt or dataset JSON
    glove_path: str = ""             # optional GloVe .txt; hashed fallback if empty
    num_clips: int = 64              # fixed temporal grid T after sampling
    # Feature rows per second of video. Used ONLY when the annotation
    # format carries no duration (Charades-STA): duration ≈ rows/fps.
    # tIoU/recall are scale-invariant, but segment outputs in seconds are
    # off by this factor if it doesn't match the feature extraction rate.
    # 0.0 = unconfigured: 1.0 is assumed WITH a one-time warning (see
    # data.features.effective_feature_fps) — set explicitly to silence.
    feature_fps: float = 0.0
    max_query_len: int = 20          # queries padded/truncated to this
    # Split used for in-training periodic eval. "" → try "val", then fall
    # back to "test" (Charades-STA has no val split; ActivityNet does).
    val_split: str = ""
    lowercase: bool = True
    batch_size: int = 32
    num_workers: int = 0             # >0 → Grain worker processes for IO
    # Byte budget (MB, per process) for the FeatureReader's LRU of
    # resampled per-video grids. Annotations average several queries per
    # video and eval iterates in file order (grouped by video), so the
    # cache removes all but the first read+resample per video (measured
    # host-pipeline numbers in operations.md §6). serve.py reuses the
    # same budget for its features_path cache. 0 disables. Purely a
    # host-side performance knob: batch contents are identical either
    # way (tests/test_data.py pins it).
    feature_cache_mb: float = 64.0
    shuffle_buffer: int = 2048
    seed: int = 0
    # Synthetic-fixture knobs (dataset="synthetic" only). The recipe-
    # demonstration config needs (a) a train set large enough that the
    # model generalizes rather than memorizes (held-out val split) and
    # (b) a task hard enough that CONVERGED stage-1 recall sits well
    # below ceiling — the regime real grounding lives in (Charades R@1
    # ~45-53) and the only regime where stage-2 IoU rescoring has
    # headroom to demonstrate anything. At the easy defaults the model
    # saturates val R@1,IoU=0.5≈99 by epoch 2 (logs/recipe_demo_r4.log
    # trail) and the demo would measure noise.
    synthetic_examples: int = 256
    # Signal amplitude added inside the GT span (lower = harder
    # boundaries; 2.0 reproduces the original easy fixture exactly).
    synthetic_snr: float = 2.0
    # Decoy spans carrying a DIFFERENT query's signal, placed outside
    # the GT span: matching must be query-conditioned, not
    # "any-signal" detection, and mis-ranked candidates appear — the
    # exact failure mode IoU rescoring exists to fix.
    synthetic_distractors: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Two-stage recipe (SURVEY.md §4.1/§4.2)."""

    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    grad_clip_norm: float = 10.0
    num_epochs: int = 30
    lr_decay_epochs: Tuple[int, ...] = (20,)
    lr_decay_rate: float = 0.1
    stage: int = 1                   # 1 = grounding heads, 2 = +IoU head
    # Stage-2 variant (SURVEY.md §4.2, medium confidence on the reference's
    # freezing details): True (default) trains ONLY the IoU head from the
    # stage-1 init; False fine-tunes everything jointly. Defaulted to the
    # freeze on a 3-seed × 3-regime A/B at width 128 (freeze R@1-mean
    # 39.13 vs joint 38.68 vs joint@0.1·lr 38.56, and joint shifts the
    # grounding outputs so the recipe's rescore-off sanity row no longer
    # matches stage 1) — docs/design.md §4.3, logs/stage2_regime_ab_r5.log.
    stage2_iou_only: bool = True
    # Gradient accumulation: each optimizer update averages this many
    # consecutive micro-batch gradients (optax.MultiSteps) — large
    # effective batches on small slices without the memory. The LR decay
    # boundaries are scaled so decay happens at the configured EPOCH
    # regardless of accum_steps; checkpoint cadence, log_every and
    # --max-steps still count MICRO-steps.
    accum_steps: int = 1
    match_loss_weight: float = 1.0
    reg_loss_weight: float = 1.0
    iou_loss_weight: float = 1.0
    focal_alpha: float = 0.25        # focal loss for matching head; alpha<0 → plain BCE
    focal_gamma: float = 2.0
    checkpoint_dir: str = "/tmp/drn_tpu_ckpt"
    checkpoint_every_steps: int = 500
    keep_checkpoints: int = 3
    log_every_steps: int = 50
    tensorboard_dir: str = ""        # empty → JSONL-to-stderr only
    eval_every_epochs: int = 1
    resume: bool = True
    seed: int = 0


@dataclass(frozen=True)
class EvalConfig:
    """Decode + NMS + recall (SURVEY.md §4.3)."""

    top_k: int = 48                  # candidates kept before NMS (per query)
    nms_iou_threshold: float = 0.5
    recall_ns: Tuple[int, ...] = (1, 5)
    iou_thresholds: Tuple[float, ...] = (0.3, 0.5, 0.7)
    score_use_iou_head: bool = True  # score = sigmoid(match) * sigmoid(iou_pred)^w
    # Rescore blend exponent w: 0 ≡ rescoring off, 1 ≡ the full product
    # (the reference's score, SURVEY.md §4.3). Fractional w softens the
    # IoU head's reranking. Defaulted to 0.25 on a 2-width sweep
    # (3-4 trained seeds each, w ∈ {0.25, 0.5, 0.75, 1}): w=0.25 keeps
    # the FULL R@1 gain of w=1 at both widths (128: 37.07 vs 36.56 mean
    # R@1,0.5; flagship 512: 36.81 vs 36.86) while recovering most of
    # the R@5 cost (128: loss 5.9 → 1.7 pts vs the 78.4 no-rescore
    # baseline; flagship: 12.0 → 2.4 pts vs 78.15) — design.md §4.4,
    # logs/recipe_treatment_seeds_r5.log, logs/recipe_treatment_w128_r5.log
    # (VERDICT r4 item 2). w=1 reproduces the reference's exact scoring.
    score_iou_weight: float = 0.25
    batch_size: int = 32


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism layout (SURVEY.md §3.1-§3.2).

    DP over a `data` axis is the parity requirement (the reference's only
    strategy is DDP). A `model` axis tensor-shards the wide conv/embed
    kernels when >1; a `time` axis shards the clip dimension (sequence
    parallelism). train.py's --model-axis/--time-axis flags override these
    defaults; the data axis always takes the remaining devices.
    """

    data_axis: int = -1              # -1 → all remaining devices
    model_axis: int = 1
    time_axis: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "charades_c3d"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _cfg(name: str, **sections: Dict[str, Any]) -> ExperimentConfig:
    base = ExperimentConfig(name=name)
    updates = {}
    for sec, kw in sections.items():
        updates[sec] = dataclasses.replace(getattr(base, sec), **kw)
    return dataclasses.replace(base, **updates)


# Registry — one entry per BASELINE.json config scenario.
_REGISTRY: Dict[str, ExperimentConfig] = {
    # 1) Charades-STA, C3D features (single-query latency & parity target).
    "charades_c3d": _cfg(
        "charades_c3d",
        model=dict(feature_dim=4096),
        data=dict(dataset="charades", feature_type="c3d", num_clips=64),
    ),
    # Charades-STA, I3D features.
    "charades_i3d": _cfg(
        "charades_i3d",
        model=dict(feature_dim=1024),
        # Train batch stays the recipe default (32); throughput-optimal
        # measured at 128 (16,186 ex/s @128 vs 15,114 @384, logs/sweep_r3.log —
        # the light 1024-d stem saturates earlier than c3d's 384).
        data=dict(dataset="charades", feature_type="i3d", num_clips=64),
        # v5e eval-batch sweep (iters=96; logs/sweep_r3.log): 69.7k q/s @32,
        # 73.8k @48, 74.2/76.5/77.4k @64, 77.1/72.6k @96 (tied with 64
        # within relay noise), 69.2k @128. The 1024-d stem is ~4x lighter
        # than c3d's 4096, so the optimum sits above the flagship's B=48.
        eval=dict(batch_size=64),
    ),
    # 2) Charades-STA batched multi-query eval (on-device NMS). Batch
    # sweep on v5e, FULL step timed (NMS + recall counts consumed),
    # iters=96, AFTER the selection-matmul sampling + fused-LSTM rewrites
    # moved the optimum way down: 56.3k@32, 57.1k@40, ~60k@48 (best;
    # 59.3/60.0/62.7k across three runs), 58.0k@56, 54.2k@64, 56.0k@80,
    # 54.8k@96, 52.5k@128, 51.1k@256, 49.8k@384. Training throughput
    # still prefers big batches (44% MFU @384), so data.batch_size stays
    # 384 for the train-step benchmark.
    "charades_c3d_batched_eval": _cfg(
        "charades_c3d_batched_eval",
        model=dict(feature_dim=4096),
        data=dict(dataset="charades", feature_type="c3d", num_clips=64, batch_size=384),
        eval=dict(batch_size=48),
    ),
    # 3) ActivityNet-Captions: longer videos, deeper pyramid, I3D features.
    "activitynet_i3d": _cfg(
        "activitynet_i3d",
        model=dict(
            feature_dim=1024,
            num_levels=4,
            level_ranges=((0.0, 0.12), (0.12, 0.25), (0.25, 0.5), (0.5, 2.0)),
        ),
        # Train batch stays the recipe default (32); throughput-optimal
        # measured at 128 (4,069 ex/s @32 → 4,348 @128, logs/sweep_r3.log).
        data=dict(dataset="activitynet", feature_type="i3d", num_clips=256,
                  max_query_len=25),
        # v5e eval-batch sweep (iters=96, 2026-08-17): 15.5k q/s @8,
        # 16.9/15.9k @16 (peak, 73-77% MFU), 15.4k @32. Deep-pyramid
        # configs peak far below the charades flagship's B=48.
        # Re-swept r4 AFTER blocked IoU sampling (which moved TACoS's
        # optimum 8→32): 16.5k @16 (68.1% MFU) vs 16.2k @32 (66.6%) —
        # B=16 stays the optimum here.
        eval=dict(batch_size=16),
    ),
    "activitynet_c3d": _cfg(
        "activitynet_c3d",
        model=dict(
            feature_dim=500,  # ActivityNet release ships PCA-500 C3D features
            num_levels=4,
            level_ranges=((0.0, 0.12), (0.12, 0.25), (0.25, 0.5), (0.5, 2.0)),
        ),
        # Train batch stays the recipe default (32): raising it changes
        # convergence, not just speed. Throughput-optimal train batch
        # measured at 128 (iters=96, logs/sweep_r3.log: 4,259 ex/s @32,
        # 4,441 @128 peak 51.9% MFU, 4,141 @256) — users scaling the LR
        # accordingly can pass --batch-size 128.
        data=dict(dataset="activitynet", feature_type="c3d", num_clips=256,
                  max_query_len=25),
        # Sweep (iters=96): 15.4k @8, 16.8/17.1k @16 (peak, ~75% MFU),
        # 15.5k @32, 15.4k @64. With blocked IoU sampling (r3):
        # 16.8/17.4k @16, 14.5k @32 — B=16 stays the optimum.
        eval=dict(batch_size=16),
    ),
    # 4) TACoS: fine-grained dense moments, high-resolution temporal grid.
    "tacos_c3d": _cfg(
        "tacos_c3d",
        model=dict(
            feature_dim=4096,
            num_levels=4,
            level_ranges=((0.0, 0.08), (0.08, 0.18), (0.18, 0.4), (0.4, 2.0)),
        ),
        # Train batch stays the recipe default (32). Throughput-optimal
        # train batch measured at 64 (iters=96, logs/sweep_r3.log: 1,748 ex/s
        # @32, 1,813 @64 peak 59.2% MFU — the 512-clip grid fills the MXU
        # without huge batches, 1,759 @128); pass --batch-size 64 with a
        # rescaled LR to trade recipe fidelity for speed.
        data=dict(dataset="tacos", feature_type="c3d", num_clips=512,
                  max_query_len=25),
        # Sweep (iters=96): 3.4k @4, 5.1/5.0k @8 (the pre-r3 peak),
        # 4.9k @16, 4.8k @32, 4.7k @64. After the per-level blocked IoU
        # sampling (heads.blocked_segment_samples) removed the (3N, N)
        # selection tensor, the optimum moved UP: 5.4k @8, 5.2k @16,
        # 5.72/5.71k @32 (two runs), 5.1k @64.
        eval=dict(batch_size=32),
    ),
    # 6) Two-stage recipe demonstration (scripts/recipe_demo.py; VERDICT r3
    # item 1): a non-trivial width with a HELD-OUT synthetic val split, so
    # stage-2 IoU rescoring is measured on generalization, not memorization.
    # Train set 4096 examples keeps stage-1 val R@1 off the ceiling (the
    # regime where rescoring can help); 3 levels exercises cross-level
    # flattening in the rescore. Runs on CPU in minutes.
    "synthetic_recipe": _cfg(
        "synthetic_recipe",
        model=dict(feature_dim=256, hidden_dim=128, vocab_size=512,
                   num_lstm_layers=2),
        data=dict(dataset="synthetic", num_clips=64, max_query_len=12,
                  batch_size=32, synthetic_examples=4096,
                  synthetic_snr=0.5, synthetic_distractors=2),
        # Stage-1 val recall plateaus by epoch ~2 in this regime
        # (logs/recipe_demo_r4.log trail: 34.7 after epoch 1, 32.9 after
        # epoch 2 — best-on-val keeps epoch 1); 3 epochs covers it for
        # both stages.
        train=dict(num_epochs=3, log_every_steps=32,
                   checkpoint_every_steps=10_000),
        eval=dict(top_k=32, batch_size=64),
    ),
    # 6b) The same recipe demonstration at PRODUCTION width (hidden 512,
    # 3 LSTM layers, I3D-like 1024-d features — the dims the real configs
    # train at), because width-dependent training bugs exist: a hard exp()
    # froze every regression gradient at width 512 while the tiny config
    # trained fine (CLAUDE.md; test_regression_learns_at_flagship_width).
    # Same held-out-val regime as synthetic_recipe; ~40 min on the TPU
    # (relay dispatch dominates — CLAUDE.md) and similar on CPU.
    # Trail: logs/recipe_demo_flagship_r4.log.
    "synthetic_recipe_flagship": _cfg(
        "synthetic_recipe_flagship",
        model=dict(feature_dim=1024, hidden_dim=512, vocab_size=512),
        data=dict(dataset="synthetic", num_clips=64, max_query_len=12,
                  batch_size=32, synthetic_examples=4096,
                  synthetic_snr=0.5, synthetic_distractors=2),
        train=dict(num_epochs=3, log_every_steps=32,
                   checkpoint_every_steps=10_000),
        eval=dict(top_k=32, batch_size=64),
    ),
    # 5) End-to-end training on a TPU mesh (synthetic fixture runs everywhere).
    "synthetic_tiny": _cfg(
        "synthetic_tiny",
        model=dict(feature_dim=128, hidden_dim=64, vocab_size=128,
                   num_lstm_layers=2, num_levels=2,
                   level_ranges=((0.0, 0.3), (0.3, 2.0))),
        data=dict(dataset="synthetic", num_clips=32, max_query_len=8,
                  batch_size=8),
        train=dict(num_epochs=2, log_every_steps=10),
        eval=dict(top_k=16, batch_size=8),
    ),
}


def get_config(name: str) -> ExperimentConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_configs():
    return sorted(_REGISTRY)
