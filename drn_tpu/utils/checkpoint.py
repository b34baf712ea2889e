"""Orbax checkpointing: async save, latest-step resume (SURVEY.md §6).

Reference equivalent: `torch.save({'epoch', 'model', 'optimizer'})` +
`--resume` (SURVEY.md §3 "Checkpointing"); here a CheckpointManager holds
{params, opt_state, step} with retention and auto-resume from the latest
step — the elastic-recovery story the reference lacks.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 save_interval_steps: int = 1):
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def should_save(self, step: int) -> bool:
        """True iff a save() at this step would persist (interval hit and
        step not already on disk) — lets callers skip the device→host
        state fetch otherwise."""
        return step not in self._mgr.all_steps() and self._mgr.should_save(
            step
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        if step in self._mgr.all_steps():
            return False  # already persisted (e.g. final save after loop)
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None,
                partial: bool = False) -> Any:
        """Restore into `state_template`'s structure. `partial=True` allows
        the template to be a subtree of what's on disk (e.g. stage 2 loading
        only `params` from a stage-1 {params, opt_state, step} checkpoint)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if partial:
            return self._mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    state_template, partial_restore=True
                ),
            )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


BEST_SUBDIR = "best"
_LOADER_SUBDIR = "loader_state"
CONFIG_FILENAME = "experiment_config.json"

# Fields whose mismatch between the config that TRAINED a checkpoint and
# the config now RESTORING it silently changes model semantics: the params
# would load fine (same tree) but decode against different level_ranges /
# grids / dims — wrong results with no error. Everything under `model`
# defines the architecture EXCEPT the scheduling-only knobs below; the
# data fields further down define the input grid and id space the params
# were trained on. Training-only knobs (lr, epochs, stage, batch size)
# are deliberately NOT parity-relevant.
_PARITY_SECTIONS = ("model",)
# Scheduling/performance knobs that pick between numerics-equivalent
# compute paths (same params, same outputs up to bf16 accumulation order
# — design.md §3/§4.2). Re-tuning or A/B-ing them must not lock users out
# of existing checkpoints, and excluding them keeps the hard failure
# reserved for REAL semantic drift.
_PARITY_EXCLUDE = {
    ("model", "use_pallas_fusion"),
    ("model", "use_pallas_conv_blocks"),
    ("model", "use_pallas_stem"),
    ("model", "iou_fold_mix_min_locations"),
}
_PARITY_FIELDS = (
    ("data", "dataset"),
    ("data", "feature_type"),
    ("data", "num_clips"),
    ("data", "max_query_len"),
)


def _jsonable_config(cfg: Any) -> dict:
    """dataclasses.asdict + a JSON round-trip so comparisons see what a
    loaded file sees (tuples → lists)."""
    import dataclasses
    import json

    return json.loads(json.dumps(dataclasses.asdict(cfg)))


def save_experiment_config(directory: str, cfg: Any) -> None:
    """Persist the full ExperimentConfig next to the Orbax steps
    (SURVEY.md §6 Config row: "serialized into checkpoints"). Atomic
    write: a crash mid-save must not leave a truncated JSON on the
    resume path."""
    import json

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, CONFIG_FILENAME)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"name": getattr(cfg, "name", ""),
                   **_jsonable_config(cfg)}, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_experiment_config(directory: str) -> Optional[dict]:
    """Read the persisted config for a checkpoint directory. A `best/`
    subdirectory inherits its parent's file (BestCheckpointTracker stores
    params only). Returns None for pre-provenance checkpoints."""
    import json

    candidates = [directory]
    if os.path.basename(os.path.normpath(directory)) == BEST_SUBDIR:
        candidates.append(os.path.dirname(os.path.normpath(directory)))
    for d in candidates:
        path = os.path.join(d, CONFIG_FILENAME)
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            continue
        except (OSError, ValueError) as e:
            import warnings

            warnings.warn(f"unreadable {path!r} ({e}); ignoring it")
    return None


def config_parity_diffs(saved: dict, cfg: Any, *,
                        warn_on_skew: bool = True) -> list:
    """Human-readable list of parity-relevant differences between a
    persisted config dict and the active ExperimentConfig.

    Only keys present in BOTH configs can hard-fail: a key the saved
    config has never heard of is additive schema evolution (a new field
    with a default), and treating saved=absent vs active=default as a
    mismatch would brick every pre-upgrade checkpoint (ADVICE r4). Those
    asymmetric keys get a warning instead — visible, not fatal.
    `warn_on_skew=False` suppresses that warning for callers using this
    purely as a predicate (e.g. the fresh-run overwrite check, where
    'cross-version restore' phrasing would mislead — nothing is being
    restored)."""
    import warnings

    active = _jsonable_config(cfg)
    diffs = []
    skewed = []  # keys on one side only — schema evolution, warn-only
    for section in _PARITY_SECTIONS:
        s, a = saved.get(section, {}), active.get(section, {})
        for k in sorted(set(s) | set(a)):
            if (section, k) in _PARITY_EXCLUDE:
                continue
            if k not in s or k not in a:
                skewed.append(f"{section}.{k}")
            elif s[k] != a[k]:
                diffs.append(
                    f"{section}.{k}: checkpoint={s[k]!r} "
                    f"active={a[k]!r}"
                )
    for section, key in _PARITY_FIELDS:
        s, a = saved.get(section, {}), active.get(section, {})
        if key not in s or key not in a:
            skewed.append(f"{section}.{key}")
        elif s[key] != a[key]:
            diffs.append(
                f"{section}.{key}: checkpoint={s[key]!r} "
                f"active={a[key]!r}")
    if skewed and warn_on_skew:
        warnings.warn(
            "checkpoint config schema differs from the active one (fields "
            f"on one side only: {', '.join(sorted(set(skewed)))}); "
            "cross-version restore — verify the new/removed fields' "
            "defaults match how the checkpoint was trained"
        )
    # Vocab MODE (GloVe vs hashed) changes the id space the embedding
    # table was trained against; the path itself may legitimately move.
    sg = bool(saved.get("data", {}).get("glove_path"))
    ag = bool(active.get("data", {}).get("glove_path"))
    if sg != ag:
        diffs.append(
            f"data.glove_path mode: checkpoint={'glove' if sg else 'hashed'}"
            f" active={'glove' if ag else 'hashed'}")
    return diffs


def check_experiment_config(directory: str, cfg: Any, *,
                            allow_mismatch: bool = False,
                            context: str = "restore") -> list:
    """Fail loudly when a checkpoint is restored under a config whose
    parity-relevant fields differ from the one that trained it (silently
    wrong results otherwise — e.g. level_ranges changed between stage-1
    and stage-2 runs). `allow_mismatch=True` downgrades to a warning.
    Pre-provenance checkpoints (no persisted config) pass silently."""
    saved = load_experiment_config(directory)
    if saved is None:
        return []
    diffs = config_parity_diffs(saved, cfg)
    if diffs:
        msg = (
            f"checkpoint in {directory!r} was trained under a different "
            f"parity-relevant config than the active one ({context}):\n  "
            + "\n  ".join(diffs)
            + "\nRestoring across these changes silently alters model "
              "semantics. Pass allow_config_mismatch / "
              "--allow-config-mismatch to proceed anyway."
        )
        if not allow_mismatch:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)
    return diffs


def save_loader_state(directory: str, step: int, blob: bytes,
                      process_index: int = 0, keep: int = 3) -> None:
    """Persist a data-loader iterator state blob (e.g. Grain's
    `get_state()`) next to the Orbax step so a mid-epoch resume can skip
    consumed batches without re-reading them. One file per process (each
    process owns its own Grain shard iterator); prunes this process's
    blobs beyond the newest `keep`."""
    d = os.path.join(directory, _LOADER_SUBDIR)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{step}_p{process_index}.bin"), "wb") as f:
        f.write(blob)
    suffix = f"_p{process_index}.bin"
    mine = sorted(
        (int(name[: -len(suffix)]) for name in os.listdir(d)
         if name.endswith(suffix) and name[: -len(suffix)].isdigit()),
    )
    for old in mine[:-keep]:
        try:
            os.remove(os.path.join(d, f"{old}{suffix}"))
        except OSError:
            pass


def load_loader_state(directory: str, step: int,
                      process_index: int = 0) -> Optional[bytes]:
    path = os.path.join(directory, _LOADER_SUBDIR,
                        f"{step}_p{process_index}.bin")
    try:
        with open(path, "rb") as f:
            return f.read()
    except OSError:
        return None


def prefer_best_dir(directory: str, prefer: bool = True) -> str:
    """Resolve a checkpoint directory for READING params: `<dir>/best` when
    a best-on-val checkpoint exists there (the reference recipe's "best"
    checkpoint, SURVEY.md §3 Checkpointing), else `directory` unchanged."""
    best = os.path.join(directory, BEST_SUBDIR)
    if prefer and os.path.isdir(best):
        try:
            if any(name.isdigit() for name in os.listdir(best)):
                return best
        except OSError:
            pass
    return directory


class BestCheckpointTracker:
    """Keeps the single best-on-val checkpoint under `<directory>/best`.

    Stores {params, step, val_metric}; the metric survives restarts, so a
    resumed run can't overwrite a better checkpoint from before the
    restart with a worse one."""

    def __init__(self, directory: str):
        self.directory = os.path.join(os.path.abspath(directory),
                                      BEST_SUBDIR)
        os.makedirs(self.directory, exist_ok=True)
        self._best: Optional[float] = None
        # Opening + restoring the persisted metric sits on the RESUME
        # path: a corrupt, truncated, or foreign-schema `best/` directory
        # (e.g. killed mid-save, or written by an older version without
        # `val_metric`) must degrade to "no best yet" — never crash the
        # resume it exists to protect. The unreadable directory is
        # QUARANTINED (renamed `best.corrupt-N`, data preserved) rather
        # than reused: a garbage step dir also poisons Orbax's
        # item-structure inference, making every later save() fail. The
        # next real val eval re-anchors best (worst case: one overwrite
        # by a marginally worse checkpoint, vs. an unresumable run).
        try:
            self._mgr = self._open()
            step = self._mgr.latest_step()
            if step is not None:
                # Schema check BEFORE restoring: a partial restore of a
                # missing key silently fills the template default (0.0 —
                # a fake anchor), and the foreign layout still poisons
                # Orbax's item-structure inference so every later save()
                # raises. A reopened manager exposes no item_metadata
                # (no handler registry yet), so read the step's on-disk
                # _METADATA tree directly. The probe is three-valued:
                # metadata readable + key present → restore; readable +
                # key ABSENT → foreign schema, quarantine; the probe
                # itself unreadable (an Orbax version bump moving or
                # reshaping the metadata file) → the directory may be
                # perfectly valid, so attempt the restore rather than
                # quarantining a good best checkpoint (a real restore
                # failure still lands in the quarantine path below).
                has_metric = self._has_val_metric(step)
                if has_metric is False:
                    raise KeyError(
                        "checkpoint has no 'val_metric' (foreign schema)"
                    )
                if has_metric is None:
                    import warnings

                    warnings.warn(
                        f"unrecognized checkpoint metadata layout in "
                        f"{self.directory!r} step {step}; attempting the "
                        f"metric restore anyway"
                    )
                restored = self._mgr.restore(
                    step,
                    args=ocp.args.PyTreeRestore(
                        {"val_metric": 0.0}, partial_restore=True
                    ),
                )
                m = float(restored["val_metric"])
                # A non-finite persisted metric (older runs could write
                # one) must not become the comparison anchor — NaN makes
                # every `<=` False and turns "best" into "last".
                self._best = m if math.isfinite(m) else None
        except Exception as e:  # noqa: BLE001 — any open/restore failure
            import warnings

            quarantined = self._quarantine()
            warnings.warn(
                f"best-checkpoint metric restore failed in "
                f"{self.directory!r} ({type(e).__name__}: {e}); moved the "
                f"unreadable directory to {quarantined!r} and starting "
                f"with no prior best — the next val eval re-anchors it"
            )
            self._mgr = self._open()

    def _has_val_metric(self, step: int) -> Optional[bool]:
        """True/False when the step's metadata is readable in the known
        Orbax on-disk layout (<step>/default/_METADATA with a
        tree_metadata/key_metadata schema); None when the layout itself
        is unrecognized — the caller must NOT treat None as corruption,
        only as "cannot pre-check"."""
        import json

        path = os.path.join(self.directory, str(step), "default",
                            "_METADATA")
        try:
            with open(path) as f:
                tm = json.load(f)["tree_metadata"]
            return any(
                e["key_metadata"][0]["key"] == "val_metric"
                for e in tm.values()
            )
        except Exception:  # noqa: BLE001 — layout probe only, see above
            return None

    def _open(self) -> ocp.CheckpointManager:
        return ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                enable_async_checkpointing=True,
            ),
        )

    def _quarantine(self) -> str:
        """Move the unreadable best/ dir aside (never delete user data).

        Race-safe for multi-process training: every process constructs a
        tracker against the same shared checkpoint FS, so on a resume
        after a mid-save kill ALL of them can enter this path at once.
        os.rename is atomic but only one rename of the same source can
        win — the losers see FileNotFoundError (source already moved:
        quarantined by a peer, report that target) or FileExistsError /
        ENOTEMPTY (target taken: bump the suffix and retry). Crashing
        here would kill that worker inside the recovery path and hang
        the job at the next collective."""
        try:
            getattr(self, "_mgr", None).close()
        except Exception:  # noqa: BLE001 — mgr may not exist / be broken
            pass
        n = 0
        while True:
            target = f"{self.directory}.corrupt-{n}"
            if os.path.exists(target):
                n += 1
                continue
            try:
                os.rename(self.directory, target)
            except FileNotFoundError:
                # A peer process already quarantined it — our locally
                # computed `target` is NOT where the peer moved it, so
                # don't report a guessed (possibly nonexistent) path
                # (ADVICE r4). The newest sibling quarantine dir is the
                # peer's actual target when one is visible.
                import glob

                # glob.escape: checkpoint dirs can contain glob
                # metacharacters (pytest's parametrized tmp dirs, '[').
                peers = glob.glob(glob.escape(str(self.directory))
                                  + ".corrupt-*")
                try:
                    target = max(peers, key=os.path.getmtime)
                except (ValueError, FileNotFoundError):
                    # no peers visible, or a peer dir vanished between
                    # glob and stat — never crash the recovery path.
                    target = (f"{self.directory}.corrupt-* "
                              f"(quarantined by a peer process)")
                break
            except OSError:
                n += 1  # lost the target to a peer; try the next suffix
                continue
            break
        os.makedirs(self.directory, exist_ok=True)
        return target

    @property
    def best_metric(self) -> Optional[float]:
        return self._best

    def update(self, step: int, params: Any, val_metric: float) -> bool:
        """Persist {params, step, val_metric} iff this is a new best.

        A non-finite metric (diverged eval) is never "best": accepting a
        NaN would poison every later comparison (`m <= nan` is False) and
        silently degrade best-on-val into last-eval."""
        m = float(val_metric)
        if not math.isfinite(m):
            return False
        if self._best is not None and m <= self._best:
            return False
        self._best = m
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": params, "step": step, "val_metric": m}
            ),
            force=True,
        )
        return True

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
