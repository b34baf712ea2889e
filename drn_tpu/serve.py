"""Batched HTTP inference server (stdlib-only; TPU-idiomatic fixed shapes).

The reference has no serving story at all — inference means running
`test.py` over a dataset (SURVEY.md §4.3). This serves ad-hoc grounding
requests against ONE compiled step: requests queue on the host, a batcher
thread gathers up to the compiled batch size (or until --max-wait-ms),
pads the remainder with invalid rows, and runs the SAME jitted eval step
every time — no retracing, no dynamic shapes, the TPU only ever sees the
one program.

    python -m drn_tpu.serve --config charades_c3d \
        --checkpoint-dir /ckpt/charades_c3d/stage2 --port 8100

API:
  GET  /healthz            → {"status": "ok", "batch_size": N, ...}
  POST /ground             JSON {"query": str,
                                 "features": [[...]...] (T_raw, F) floats
                                   | "features_path": server-side .npy
                                   | "video_id": id under --features-root
                                     (zero request-path file IO with
                                      --stage-corpus),
                                 "duration": seconds (optional)}
                           → {"segments": [[s,e]...], "scores": [...]}
    (top segments in seconds, post-NMS, best first)

Batching waits at most --max-wait-ms once a request arrives, so single
requests pay ~one step of latency and concurrent load rides the batch.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from drn_tpu.config import ExperimentConfig, get_config
from drn_tpu.data.features import (ResampledLru, effective_feature_fps,
                                   resample_features)
from drn_tpu.data.vocab import Vocab, tokenize


def _check_feature_shape(raw: np.ndarray, feature_dim: int,
                         what: str = "features") -> None:
    if raw.ndim != 2 or raw.shape[1] != feature_dim:
        raise ValueError(
            f"{what} must be (T_raw, {feature_dim}); got {raw.shape}"
        )


class _Request:
    __slots__ = ("features", "word_ids", "query_mask", "duration", "event",
                 "result", "error")

    def __init__(self, features, word_ids, query_mask, duration):
        self.features = features
        self.word_ids = word_ids
        self.query_mask = query_mask
        self.duration = duration
        self.event = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[str] = None


class GroundingService:
    """Owns the compiled step + vocab; turns raw requests into responses."""

    def __init__(self, cfg: ExperimentConfig, model, params,
                 vocab: Vocab, batch_size: Optional[int] = None,
                 max_wait_ms: float = 5.0, top: int = 5,
                 features_root: Optional[str] = None,
                 stage_corpus: bool = False):
        # When set, client 'features_path' values must resolve inside this
        # directory (the CLI refuses a non-loopback bind without it —
        # otherwise the endpoint is an arbitrary-file-read/probe primitive).
        self.features_root = (
            os.path.realpath(features_root) if features_root else None
        )
        if batch_size:
            cfg = cfg.replace(
                eval=dataclasses.replace(cfg.eval, batch_size=batch_size)
            )
        self.cfg = cfg
        self.model = model
        self.params = params
        self.vocab = vocab
        self.top = top
        self.batch_size = cfg.eval.batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # Repeated requests against the same server-side feature file
        # (many queries over one video — the grounding access pattern)
        # skip the np.load + resample; keyed by (path, mtime, size) so an
        # overwritten file is never served stale.
        self._feat_cache = ResampledLru(
            getattr(cfg.data, "feature_cache_mb", 0.0))
        # RAM-resident corpus (--stage-corpus): every *.npy under
        # features_root read+resampled ONCE at startup; 'video_id'
        # requests then do zero file IO on the request path (the
        # serving-side sibling of evaluate's --device-features,
        # operations.md §6). A video_id without a staged corpus still
        # resolves through the per-file path below.
        self._corpus: Dict[str, tuple] = {}
        if stage_corpus:
            if self.features_root is None:
                raise ValueError("--stage-corpus requires --features-root")
            from drn_tpu.data.features import FeatureReader

            reader = FeatureReader(self.features_root)
            names = sorted(f[:-4] for f in os.listdir(self.features_root)
                           if f.endswith(".npy"))
            nbytes = 0
            for vid in names:
                feats, t_raw = reader.read_resampled(
                    vid, self.cfg.data.num_clips)
                # Same dim check every other input path gets — a stray
                # wrong-width file must fail HERE at startup, not poison
                # whole batches (broadcast error → 500s for co-batched
                # clients) the first time its video_id is requested.
                _check_feature_shape(feats, cfg.model.feature_dim,
                                     what=f"{vid}.npy")
                feats.flags.writeable = False
                self._corpus[vid] = (feats, t_raw)
                nbytes += feats.nbytes
            print(f"[serve] staged {len(names)} videos "
                  f"({nbytes / 1e9:.2f} GB RAM) from "
                  f"{self.features_root}", flush=True)
        # Wakes the batcher's gather window early when the batch fills
        # mid-window (VERDICT r4 item 5: an unconditional sleep made
        # every batch that filled mid-window pay the full --max-wait-ms).
        self._arrival = threading.Condition()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._batcher, daemon=True)

    # -- host-side preprocessing (the Dataset equivalent for ad-hoc input)

    def prepare(self, payload: Dict[str, Any]) -> _Request:
        d, m = self.cfg.data, self.cfg.model
        if "video_id" in payload:
            vid = str(payload["video_id"])
            if os.sep in vid or (os.altsep and os.altsep in vid):
                raise ValueError("video_id must be a bare id, not a path")
            hit = self._corpus.get(vid)
            if hit is None:
                if self._corpus:
                    raise ValueError(
                        f"video_id {vid!r} is not in the staged corpus "
                        f"({len(self._corpus)} videos)")
                if self.features_root is None:
                    raise ValueError(
                        "video_id requests require --features-root")
                # No staged corpus: resolve to a per-file read below
                # (shares the mtime-keyed LRU with features_path). An
                # unknown id is a CLIENT error — check existence here so
                # it surfaces as the same 400 the staged path gives,
                # instead of os.stat's FileNotFoundError → a 500 that
                # leaks the server-side directory layout.
                path = os.path.join(self.features_root, f"{vid}.npy")
                if not os.path.exists(path):
                    raise ValueError(
                        f"video_id {vid!r} not found under the features "
                        f"root")
                payload = dict(payload)
                payload["features_path"] = path
        else:
            hit = None
        if hit is not None:
            feats, t_raw = hit
        elif "features_path" in payload:
            path = os.path.realpath(str(payload["features_path"]))
            if self.features_root is not None and not (
                path == self.features_root
                or path.startswith(self.features_root + os.sep)
            ):
                raise ValueError(
                    "features_path must be inside the configured "
                    "features root"
                )
            st = os.stat(path)
            key = (path, d.num_clips, st.st_mtime_ns, st.st_size)
            hit = self._feat_cache.get(key)
            if hit is not None:
                feats, t_raw = hit
            else:
                raw = np.load(path).astype(np.float32)
                _check_feature_shape(raw, m.feature_dim)
                feats = resample_features(raw, d.num_clips)
                t_raw = raw.shape[0]
                self._feat_cache.put(key, feats, t_raw)
        else:
            raw = np.asarray(payload["features"], np.float32)
            _check_feature_shape(raw, m.feature_dim)
            feats = resample_features(raw, d.num_clips)
            t_raw = raw.shape[0]
        ids, mask = self.vocab.encode(
            tokenize(str(payload["query"]), d.lowercase), d.max_query_len
        )
        duration = float(payload.get("duration", 0.0))
        if duration <= 0.0:
            duration = t_raw / effective_feature_fps(d.feature_fps)
        return _Request(feats, ids, mask, duration)

    def submit(self, req: _Request, timeout_s: float = 60.0
               ) -> Dict[str, Any]:
        self._q.put(req)
        with self._arrival:
            self._arrival.notify()
        if not req.event.wait(timeout_s):
            raise TimeoutError("inference timed out")
        if req.error:
            raise RuntimeError(req.error)
        assert req.result is not None
        return req.result

    # -- the batcher: fixed-shape padded batches into one jitted step

    def start(self):
        # Warm the compile before accepting traffic.
        self._run([])
        self._thread.start()

    def stop(self):
        self._stop.set()
        with self._arrival:
            self._arrival.notify_all()  # unblock a mid-window batcher
        self._thread.join(timeout=5)

    def _batcher(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            reqs = [first]
            # Gather window: wait up to max_wait_s for the batch to fill,
            # but wake IMMEDIATELY when it does — submit() notifies on
            # every arrival, and holding the condition across the
            # qsize-check → wait() pair means a notify can't slip through
            # the gap. Burst load therefore pays dispatch latency, not
            # the full window, per batch.
            deadline = time.monotonic() + self.max_wait_s
            with self._arrival:
                while self._q.qsize() < self.batch_size - 1:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._stop.is_set():
                        break
                    self._arrival.wait(remaining)
            while len(reqs) < self.batch_size:
                try:
                    reqs.append(self._q.get_nowait())
                except queue.Empty:
                    break
            try:
                results = self._run(reqs)
                for r, out in zip(reqs, results):
                    r.result = out
            except Exception as e:  # surface to every waiter, keep serving
                for r in reqs:
                    r.error = f"{type(e).__name__}: {e}"
            for r in reqs:
                r.event.set()

    def _run(self, reqs: List[_Request]) -> List[Dict[str, Any]]:
        from drn_tpu.evaluate import predict

        d, m = self.cfg.data, self.cfg.model
        b = self.batch_size
        n = len(reqs)
        batch = {
            "features": np.zeros((b, d.num_clips, m.feature_dim), np.float32),
            "word_ids": np.zeros((b, d.max_query_len), np.int32),
            "query_mask": np.zeros((b, d.max_query_len), bool),
            # gt_grid/valid explicit: predict() would otherwise force
            # valid=ones, counting the padding rows as live requests.
            "gt_grid": np.zeros((b, 2), np.float32),
            "duration": np.full((b,), 1.0, np.float32),
            "valid": np.zeros((b,), bool),
        }
        batch["query_mask"][:, 0] = True  # LSTM needs >=1 live step per row
        for i, r in enumerate(reqs):
            batch["features"][i] = r.features
            batch["word_ids"][i] = r.word_ids
            batch["query_mask"][i] = r.query_mask
            batch["duration"][i] = r.duration
            batch["valid"][i] = True
        segs, keep, scores = predict(self.cfg, self.model, self.params, batch)
        out = []
        for i in range(n):
            kept = [
                {"segment": [float(segs[i, j, 0]), float(segs[i, j, 1])],
                 "score": float(scores[i, j])}
                for j in range(segs.shape[1]) if keep[i, j]
            ][: self.top]
            out.append({
                "segments": [e["segment"] for e in kept],
                "scores": [e["score"] for e in kept],
            })
        return out


def make_handler(service: GroundingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; errors still raise
            pass

        def _send(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "config": service.cfg.name,
                    "batch_size": service.batch_size,
                    "staged_videos": len(service._corpus),
                })
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/ground":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length))
                req = service.prepare(payload)
                self._send(200, service.submit(req))
            except (ValueError, KeyError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class GroundingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a listen backlog sized for bursty load.

    The stdlib default (`request_queue_size = 5`) drops SYNs with
    connection-reset once more than ~5 clients connect in the same
    gather window — measured at 64 concurrent clients in
    `scripts/serve_load_probe.py` (25–50 resets per 8 s window).
    128 removes the resets without bounding in-flight work (the batcher
    queue, not the accept queue, is the intended backpressure point).
    """

    request_queue_size = 128


def build_service(cfg: ExperimentConfig, checkpoint_dir: Optional[str] = None,
                  torch_checkpoint: Optional[str] = None,
                  batch_size: Optional[int] = None,
                  max_wait_ms: float = 5.0, top: int = 5,
                  params=None,
                  features_root: Optional[str] = None,
                  allow_config_mismatch: bool = False,
                  stage_corpus: bool = False) -> GroundingService:
    import jax

    from drn_tpu.data.pipeline import build_vocab
    from drn_tpu.train import build_model, init_params

    if checkpoint_dir and torch_checkpoint:
        raise ValueError(
            "checkpoint_dir and torch_checkpoint are mutually exclusive; "
            "pass exactly one parameter source"
        )
    vocab = build_vocab(cfg.data, cfg.model)
    model = build_model(cfg, pretrained_embeddings=vocab.embeddings)
    if params is None:
        if torch_checkpoint:
            # Conversion builds the full tree; init_state's device compile
            # is only needed as the Orbax restore template below.
            from drn_tpu.parity.convert import load_torch_checkpoint

            params = load_torch_checkpoint(torch_checkpoint, cfg.model)
        else:
            params = init_params(cfg, model, jax.random.key(0))
        if checkpoint_dir:
            from drn_tpu.utils.checkpoint import (CheckpointManager,
                                                  check_experiment_config,
                                                  prefer_best_dir)

            check_experiment_config(
                checkpoint_dir, cfg,
                allow_mismatch=allow_config_mismatch, context="serve")
            ckpt = CheckpointManager(prefer_best_dir(checkpoint_dir))
            restored = ckpt.restore({"params": params}, partial=True)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint in {checkpoint_dir}")
            params = restored["params"]
            ckpt.close()
    return GroundingService(cfg, model, params, vocab,
                            batch_size=batch_size, max_wait_ms=max_wait_ms,
                            top=top, features_root=features_root,
                            stage_corpus=stage_corpus)


def main(argv=None):
    p = argparse.ArgumentParser(description="drn_tpu grounding server")
    p.add_argument("--config", default="charades_c3d")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--glove-path", default=None)
    p.add_argument("--annotation-path", default=None,
                   help="GloVe mode: dataset annotations that fix the vocab")
    p.add_argument("--feature-fps", type=float, default=None,
                   help="feature rows per second of video (extraction "
                        "rate); unset configs assume 1.0 with a warning — "
                        "seconds outputs scale by this")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8100)
    p.add_argument("--batch-size", type=int, default=None,
                   help="serving batch (default: the config's swept "
                        "eval batch optimum)")
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--top", type=int, default=5)
    p.add_argument("--features-root", default=None,
                   help="directory that client 'features_path' values must "
                        "resolve inside; required for a non-loopback --host")
    p.add_argument("--stage-corpus", action="store_true",
                   help="read+resample every *.npy under --features-root "
                        "into RAM at startup; 'video_id' requests then do "
                        "zero file IO on the request path (operations.md "
                        "§6)")
    p.add_argument("--allow-config-mismatch", action="store_true",
                   help="downgrade the checkpoint-vs-active config parity "
                        "check to a warning")
    args = p.parse_args(argv)
    if args.stage_corpus and not args.features_root:
        p.error("--stage-corpus requires --features-root")
    if not args.checkpoint_dir and not args.torch_checkpoint:
        p.error("one of --checkpoint-dir / --torch-checkpoint is required")
    if args.checkpoint_dir and args.torch_checkpoint:
        p.error("--checkpoint-dir and --torch-checkpoint are mutually "
                "exclusive; pass exactly one parameter source")
    if args.host not in ("127.0.0.1", "localhost", "::1") \
            and not args.features_root:
        p.error("--features-root is required when binding a non-loopback "
                "--host (otherwise 'features_path' reads arbitrary "
                "server-side files)")

    from drn_tpu.utils import enable_jit_cache

    enable_jit_cache()
    cfg = get_config(args.config)
    da = {}
    if args.glove_path:
        da["glove_path"] = args.glove_path
    if args.annotation_path:
        da["annotation_path"] = args.annotation_path
    if args.feature_fps is not None:
        da["feature_fps"] = args.feature_fps
    if da:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **da))

    service = build_service(
        cfg, checkpoint_dir=args.checkpoint_dir,
        torch_checkpoint=args.torch_checkpoint,
        batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
        top=args.top, features_root=args.features_root,
        allow_config_mismatch=args.allow_config_mismatch,
        stage_corpus=args.stage_corpus,
    )
    service.start()
    server = GroundingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(f"serving {cfg.name} on http://{args.host}:{args.port} "
          f"(batch={service.batch_size})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()


if __name__ == "__main__":
    main()
