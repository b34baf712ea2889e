"""Feature-file IO + temporal resampling to the fixed clip grid.

Reference equivalent: h5py/np.load reads + temporal sample/interpolate in
each Dataset.__getitem__ (SURVEY.md §4.4). Supports a directory of
`{video_id}.npy` arrays (T_raw, F) or a single HDF5 file keyed by video id.
Resampling is linear interpolation onto `num_clips` uniformly spaced
timestamps — fixed output shape keeps every downstream op static under jit.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import numpy as np

_warned_default_fps = False


def effective_feature_fps(feature_fps: float, warn: bool = True) -> float:
    """Feature rows per second to use for seconds-from-rows durations.

    DataConfig.feature_fps == 0.0 means "not configured": assume 1 row/s
    but warn ONCE — the assumed rate silently scales every user-facing
    seconds output if it doesn't match the real extraction rate (tIoU /
    recall are scale-invariant, so metrics don't catch it). Passing an
    explicit rate (even 1.0) is the opt-in that silences this.
    `warn=False` is for callers that surface the unset state themselves
    (the preflight validator) — the fallback value stays shared."""
    global _warned_default_fps
    if feature_fps > 0.0:
        return feature_fps
    if warn and not _warned_default_fps:
        _warned_default_fps = True
        warnings.warn(
            "DataConfig.feature_fps is unset; assuming 1.0 feature row per "
            "second to derive video durations. Segment outputs in SECONDS "
            "are wrong by exactly the ratio to the real extraction rate — "
            "set feature_fps (e.g. --feature-fps) to the rate your "
            "features were extracted at.",
            stacklevel=2,
        )
    return 1.0


def resample_features(feats: np.ndarray, num_clips: int) -> np.ndarray:
    """(T_raw, F) → (num_clips, F) by linear interpolation along time."""
    t_raw = feats.shape[0]
    if t_raw == num_clips:
        return feats.astype(np.float32)
    if t_raw == 1:
        return np.repeat(feats, num_clips, axis=0).astype(np.float32)
    src = np.linspace(0.0, t_raw - 1.0, num_clips)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, t_raw - 1)
    w = (src - lo)[:, None].astype(np.float32)
    out = feats[lo] * (1.0 - w) + feats[hi] * w
    return out.astype(np.float32)


class ResampledLru:
    """Byte-bounded, thread-safe LRU of resampled grids: key → (read-only
    (num_clips, F) float32 array, raw clip count).

    Exists because every annotation references a whole video and datasets
    average several queries per video (Charades ~4, TACoS tens), so
    consecutive examples re-read and re-resample the same file. Cached
    arrays are marked read-only and shared between hits; batch assembly
    copies them via np.stack. budget_mb <= 0 disables (get misses, put
    drops)."""

    def __init__(self, budget_mb: float):
        import threading
        from collections import OrderedDict

        self.budget_mb = float(budget_mb)
        self._entries = OrderedDict()
        self._bytes = 0
        # serve.py and multi-threaded hosts share one cache; the lock
        # covers only dict bookkeeping (reads/resamples run outside it).
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        if self.budget_mb <= 0.0:
            return None
        with self._lock:
            hit = self._entries.get(key)
            if hit is None:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return hit

    def put(self, key, feats: np.ndarray, t_raw: int):
        if self.budget_mb <= 0.0 or feats.nbytes > self.budget_mb * 1e6:
            return
        feats.flags.writeable = False
        with self._lock:
            if key in self._entries:
                return
            self._entries[key] = (feats, t_raw)
            self._bytes += feats.nbytes
            while self._bytes > self.budget_mb * 1e6:
                _, (old, _t) = self._entries.popitem(last=False)
                self._bytes -= old.nbytes


class FeatureReader:
    """Reads per-video features from a .npy directory or an .h5/.hdf5 file.

    `cache_mb` > 0 keeps a ResampledLru keyed by (video_id, num_clips).
    Annotation files group queries by video and eval iterates in file
    order, so even a small cache turns all but the first read per video
    into a dict hit (training shuffles, where hits are incidental — the
    cache is a bounded win, never a correctness change)."""

    def __init__(self, feature_dir: str, cache_mb: float = 0.0):
        self.feature_dir = feature_dir
        self.cache_mb = float(cache_mb)
        self._h5 = None
        self._is_h5 = feature_dir.endswith((".h5", ".hdf5"))
        self._cache = ResampledLru(self.cache_mb)

    @property
    def cache_hits(self):
        return self._cache.hits

    @property
    def cache_misses(self):
        return self._cache.misses

    def __getstate__(self):
        # Grain pickles the data source into each worker process: locks
        # and h5 handles don't pickle, and a shared cache wouldn't be
        # shared anyway — workers start with their own empty cache.
        d = self.__dict__.copy()
        for k in ("_cache", "_h5"):
            d.pop(k, None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._h5 = None
        self._cache = ResampledLru(self.cache_mb)

    def _h5_file(self):
        if self._h5 is None:
            import h5py  # optional dep; only needed for HDF5 archives

            self._h5 = h5py.File(self.feature_dir, "r")
        return self._h5

    def num_frames(self, video_id: str) -> Optional[int]:
        try:
            return self.read(video_id).shape[0]
        except (FileNotFoundError, KeyError):
            return None

    def read(self, video_id: str) -> np.ndarray:
        if self._is_h5:
            f = self._h5_file()
            if video_id not in f:
                raise KeyError(video_id)
            node = f[video_id]
            if not hasattr(node, "shape"):
                # h5py.Group, not a Dataset: the public ActivityNet C3D
                # release nests features one level down
                # (f["v_..."]["c3d_features"]). Prefer a child whose name
                # mentions "feature"; fall back to a sole child; anything
                # else is ambiguous and must be converted explicitly.
                keys = list(node.keys())
                named = [k for k in keys if "feature" in k.lower()]
                if len(named) == 1:
                    node = node[named[0]]
                elif len(keys) == 1:
                    node = node[keys[0]]
                # ValueError, not KeyError: every caller treats KeyError
                # as "video missing" (validate.py counts them, num_frames
                # returns None) and would swallow the diagnostic.
                if not hasattr(node, "shape"):
                    raise ValueError(
                        f"HDF5 group {video_id!r} in {self.feature_dir!r} "
                        f"does not resolve to a feature array (children: "
                        f"{keys[:4]}) — re-export with one dataset per "
                        f"video, or nest exactly one dataset (or one "
                        f"named '*feature*') per group")
            return np.asarray(node)
        path = os.path.join(self.feature_dir, f"{video_id}.npy")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return np.load(path)

    def read_resampled(self, video_id: str, num_clips: int
                       ) -> tuple[np.ndarray, int]:
        """→ ((num_clips, F) float32, raw clip count). For .npy files the
        read+resample runs in one native pass (drn_tpu.native, mmap'd —
        the raw array is never materialized); falls back to NumPy for HDF5
        or when the toolchain/format is unsupported. LRU-cached per video
        when cache_mb > 0 (the returned array is then read-only and
        shared — do not mutate in place)."""
        key = (video_id, num_clips)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        feats, t_raw = self._read_resampled_uncached(video_id, num_clips)
        self._cache.put(key, feats, t_raw)
        return feats, t_raw

    def _read_resampled_uncached(self, video_id: str, num_clips: int
                                 ) -> tuple[np.ndarray, int]:
        if not self._is_h5:
            path = os.path.join(self.feature_dir, f"{video_id}.npy")
            if not os.path.exists(path):
                raise FileNotFoundError(path)
            from drn_tpu import native

            res = native.read_resample(path, num_clips)
            if res is not None:
                return res
        raw = self.read(video_id)
        return resample_features(raw, num_clips), int(raw.shape[0])
