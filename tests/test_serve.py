"""Batched HTTP grounding server: end-to-end over a real socket.

Starts the server with random params on the synthetic config, then checks
/healthz, a single /ground request, concurrent requests (one batched step),
and the 400 path for malformed input.
"""

import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from drn_tpu.config import get_config
from drn_tpu.serve import GroundingHTTPServer, build_service, make_handler


@pytest.fixture(scope="module")
def server():
    cfg = get_config("synthetic_tiny")
    service = build_service(cfg, batch_size=4, max_wait_ms=10.0, top=3)
    service.start()
    httpd = GroundingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", cfg, service
    httpd.shutdown()
    service.stop()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url + "/ground", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _payload(cfg, seed=0, t_raw=40):
    rng = np.random.default_rng(seed)
    return {
        "query": "the person opens the door",
        "features": rng.normal(
            size=(t_raw, cfg.model.feature_dim)).tolist(),
        "duration": 20.0,
    }


def test_healthz(server):
    url, cfg = server[:2]
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        got = json.loads(r.read())
    assert got["status"] == "ok"
    assert got["batch_size"] == 4


def test_single_request(server):
    url, cfg = server[:2]
    out = _post(url, _payload(cfg))
    assert out["segments"] and len(out["segments"]) <= 3
    assert len(out["scores"]) == len(out["segments"])
    for (s, e), sc in zip(out["segments"], out["scores"]):
        assert 0.0 <= s <= e <= 20.0 + 1e-3
        assert 0.0 <= sc <= 1.0
    # best-first ordering
    assert out["scores"] == sorted(out["scores"], reverse=True)


def test_concurrent_requests_batch(server):
    url, cfg = server[:2]
    with ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(
            lambda i: _post(url, _payload(cfg, seed=i)), range(4)
        ))
    assert all(o["segments"] for o in outs)
    # different inputs -> not all identical outputs
    assert len({json.dumps(o) for o in outs}) > 1


def test_single_request_latency_is_one_step(server):
    """serve.py's claim: "single requests pay ~one step of latency".
    Quantified: a lone request's end-to-end time is bounded by the
    measured bare-step time + the gather window (max_wait_ms=10 in this
    fixture) + host overhead. Generous multipliers so shared-CI CPU
    noise can't flake it — the failure mode it guards (a request waiting
    for a FULL batch to form, i.e. multiple batch timeouts or a lost
    wakeup) is orders of magnitude above the bound."""
    import time

    url, cfg, service = server

    # warm the HTTP + step path, then measure the bare compiled step
    _post(url, _payload(cfg, seed=100))
    t0 = time.perf_counter()
    service._run([])
    step_s = time.perf_counter() - t0

    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        _post(url, _payload(cfg, seed=200 + i))
        lat.append(time.perf_counter() - t0)
    best = min(lat)  # min: immune to scheduler hiccups on shared CI
    bound = 3.0 * step_s + (service.max_wait_s + 0.1) + 0.5
    assert best < bound, (best, step_s, service.max_wait_s)


def test_batch_fill_wakes_before_window():
    """A batch that FILLS mid-window must dispatch immediately instead of
    sleeping out the full --max-wait-ms (VERDICT r4 item 5): with a 20 s
    window, 4 concurrent requests on a batch_size-4 service must complete
    in a few steps' time, not ~20 s."""
    import time

    from drn_tpu.serve import build_service

    cfg = get_config("synthetic_tiny")
    service = build_service(cfg, batch_size=4, max_wait_ms=20_000.0, top=3)
    service.start()  # warms the compile before timing
    try:
        def one(i):
            payload = _payload(cfg, seed=300 + i)
            return service.submit(service.prepare(payload), timeout_s=30.0)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(one, range(4)))
        dt = time.perf_counter() - t0
        assert all(o["segments"] for o in outs)
        # Far below the 20 s window; generous for shared-CI CPU noise.
        assert dt < 5.0, dt
    finally:
        service.stop()


def test_bad_feature_shape_is_400(server):
    url, cfg = server[:2]
    bad = {"query": "hi", "features": [[1.0, 2.0]], "duration": 5.0}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, bad)
    assert ei.value.code == 400


def test_features_path_input(server, tmp_path):
    url, cfg = server[:2]
    rng = np.random.default_rng(7)
    path = tmp_path / "vid.npy"
    np.save(path, rng.normal(size=(50, cfg.model.feature_dim))
            .astype(np.float32))
    out = _post(url, {"query": "person walks in",
                      "features_path": str(path), "duration": 25.0})
    assert out["segments"]
    for s, e in out["segments"]:
        assert 0.0 <= s <= e <= 25.0 + 1e-3


def test_features_root_restricts_paths(server, tmp_path):
    """With features_root set, paths outside it are rejected (400), paths
    inside it load (ADVICE r2: features_path as arbitrary-file-read)."""
    url, cfg = server[:2]
    service_cls_root = tmp_path / "allowed"
    service_cls_root.mkdir()
    inside = service_cls_root / "vid.npy"
    rng = np.random.default_rng(8)
    np.save(inside, rng.normal(size=(50, cfg.model.feature_dim))
            .astype(np.float32))
    outside = tmp_path / "secret.npy"
    np.save(outside, rng.normal(size=(50, cfg.model.feature_dim))
            .astype(np.float32))

    # Exercise the root check directly on an (unstarted) service's
    # prepare() — the module-scoped fixture server runs without a root.
    # The check fires before model/vocab are touched.
    from drn_tpu.serve import GroundingService

    svc = GroundingService(cfg, None, None, None,
                           features_root=str(service_cls_root))
    with pytest.raises(ValueError, match="features root"):
        svc.prepare({"query": "x", "features_path": str(outside)})
    traversal = service_cls_root / ".." / "secret.npy"
    with pytest.raises(ValueError, match="features root"):
        svc.prepare({"query": "x", "features_path": str(traversal)})


def test_features_path_cache_hits_and_stale_invalidation(tmp_path):
    """Repeat requests for one server-side file share the cached resampled
    grid; overwriting the file changes the (mtime,size) key, so the cache
    can never serve stale features."""
    from drn_tpu.data.features import resample_features
    from drn_tpu.data.vocab import Vocab
    from drn_tpu.serve import GroundingService

    cfg = get_config("synthetic_tiny")
    svc = GroundingService(cfg, None, None,
                           Vocab.hashed(cfg.model.vocab_size))
    path = tmp_path / "vid.npy"
    rng = np.random.default_rng(9)
    np.save(path, rng.normal(size=(50, cfg.model.feature_dim))
            .astype(np.float32))
    r1 = svc.prepare({"query": "a", "features_path": str(path),
                      "duration": 25.0})
    r2 = svc.prepare({"query": "b", "features_path": str(path),
                      "duration": 25.0})
    assert r2.features is r1.features  # identity ⇒ load+resample skipped
    assert svc._feat_cache.hits == 1 and not r1.features.flags.writeable

    arr2 = rng.normal(size=(60, cfg.model.feature_dim)).astype(np.float32)
    np.save(path, arr2)
    r3 = svc.prepare({"query": "c", "features_path": str(path),
                      "duration": 25.0})
    assert r3.features is not r1.features
    np.testing.assert_allclose(
        r3.features, resample_features(arr2, cfg.data.num_clips),
        rtol=1e-6)


def test_staged_corpus_video_id_requests(tmp_path):
    """--stage-corpus: video_id requests resolve from RAM with zero
    request-path file IO; unknown ids and path-shaped ids are 400-class
    errors; without staging, video_id falls back to a per-file read."""
    from drn_tpu.data.features import resample_features
    from drn_tpu.data.vocab import Vocab
    from drn_tpu.serve import GroundingService

    cfg = get_config("synthetic_tiny")
    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.default_rng(3)
    raws = {}
    for vid in ("VA", "VB"):
        raws[vid] = rng.normal(size=(40, cfg.model.feature_dim)) \
            .astype(np.float32)
        np.save(root / f"{vid}.npy", raws[vid])

    vocab = Vocab.hashed(cfg.model.vocab_size)
    svc = GroundingService(cfg, None, None, vocab,
                           features_root=str(root), stage_corpus=True)
    assert len(svc._corpus) == 2

    (root / "VA.npy").unlink()  # staged requests must not touch disk
    r = svc.prepare({"query": "q", "video_id": "VA", "duration": 20.0})
    # atol: staging reads through the NATIVE resampler, which differs
    # from the NumPy oracle by float-rounding (~2e-7) near zero.
    np.testing.assert_allclose(
        r.features, resample_features(raws["VA"], cfg.data.num_clips),
        rtol=1e-6, atol=1e-5)
    # duration fallback uses the staged t_raw
    r2 = svc.prepare({"query": "q", "video_id": "VB"})
    assert r2.duration == 40.0  # t_raw / feature_fps(=1.0 assumed)

    with pytest.raises(ValueError, match="not in the staged corpus"):
        svc.prepare({"query": "q", "video_id": "GHOST"})
    with pytest.raises(ValueError, match="bare id"):
        svc.prepare({"query": "q", "video_id": "../secret"})

    # unstaged service: video_id falls back to the per-file LRU path
    svc2 = GroundingService(cfg, None, None, vocab,
                            features_root=str(root))
    r3 = svc2.prepare({"query": "q", "video_id": "VB", "duration": 5.0})
    np.testing.assert_allclose(
        r3.features, resample_features(raws["VB"], cfg.data.num_clips),
        rtol=1e-6)
    # an unknown id on the FALLBACK path must also be a 400-class
    # ValueError (not os.stat's FileNotFoundError → 500 leaking the
    # server-side path)
    with pytest.raises(ValueError, match="not found under the features"):
        svc2.prepare({"query": "q", "video_id": "GHOST"})
    with pytest.raises(ValueError, match="features-root"):
        GroundingService(cfg, None, None, vocab, stage_corpus=True)

    # a wrong-width file must fail AT STARTUP (named), not poison
    # batches at request time
    np.save(root / "BAD.npy",
            np.zeros((8, cfg.model.feature_dim + 1), np.float32))
    with pytest.raises(ValueError, match="BAD.npy"):
        GroundingService(cfg, None, None, vocab,
                         features_root=str(root), stage_corpus=True)


def test_serve_cli_guards(tmp_path):
    """CLI: non-loopback bind without --features-root refuses to start;
    both checkpoint sources refuse to start."""
    from drn_tpu import serve

    with pytest.raises(SystemExit):
        serve.main(["--checkpoint-dir", str(tmp_path), "--host", "0.0.0.0"])
    with pytest.raises(SystemExit):
        serve.main(["--checkpoint-dir", str(tmp_path),
                    "--torch-checkpoint", str(tmp_path / "x.pth")])
