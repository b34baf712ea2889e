"""Native feature reader vs NumPy-path equivalence (drn_tpu/native)."""

import numpy as np
import pytest

from drn_tpu import native
from drn_tpu.data.features import FeatureReader, resample_features

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="no C++ toolchain for the native reader"
)


@pytest.mark.parametrize("t_raw,f,num_clips", [
    (97, 300, 64),    # downsample, odd sizes
    (12, 4096, 64),   # upsample, wide features
    (64, 512, 64),    # identity
    (1, 33, 16),      # single-frame broadcast
])
def test_native_matches_numpy(tmp_path, t_raw, f, num_clips):
    rng = np.random.default_rng(t_raw)
    arr = rng.normal(size=(t_raw, f)).astype(np.float32)
    p = tmp_path / "vid.npy"
    np.save(p, arr)
    res = native.read_resample(str(p), num_clips)
    assert res is not None
    got, rows = res
    assert rows == t_raw
    want = resample_features(arr, num_clips)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_native_float16(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(40, 128)).astype(np.float16)
    p = tmp_path / "vid16.npy"
    np.save(p, arr)
    got, rows = native.read_resample(str(p), 64)
    want = resample_features(arr.astype(np.float32), 64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_native_rejects_unsupported(tmp_path):
    p = tmp_path / "f8.npy"
    np.save(p, np.zeros((4, 4), np.float64))
    assert native.read_resample(str(p), 8) is None
    assert native.read_resample(str(tmp_path / "missing.npy"), 8) is None


def test_feature_reader_uses_native(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(50, 256)).astype(np.float32)
    np.save(tmp_path / "vidA.npy", arr)
    reader = FeatureReader(str(tmp_path))
    feats, t_raw = reader.read_resampled("vidA", 32)
    assert feats.shape == (32, 256) and t_raw == 50
    np.testing.assert_allclose(
        feats, resample_features(arr, 32), rtol=1e-6, atol=1e-6
    )
