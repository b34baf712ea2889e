"""Serving-under-load characterization (VERDICT r3 item 6).

Drives the real HTTP server (`drn_tpu.serve`) with N concurrent clients
and measures end-to-end request latency (p50/p95) and sustained QPS
across concurrency levels and --max-wait-ms settings — quantifying
serve.py's "single requests pay ~one step of latency" claim and finding
the saturation operating points documented in docs/operations.md.

    python scripts/serve_load_probe.py --cpu                # CI-safe
    python scripts/serve_load_probe.py --config charades_c3d  # real TPU

Random params (perf is parameter-value-independent); features generated
once per client and reused so the probe measures the SERVER, not client
feature generation. Output: one table row per (max_wait_ms, concurrency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _client_loop(url, payload_bytes, stop, lats, errs):
    import urllib.request

    while not stop.is_set():
        req = urllib.request.Request(
            url + "/ground", data=payload_bytes,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()
            lats.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — count, keep hammering
            errs.append(str(e))


def run_load(service, url, cfg, concurrency: int, seconds: float,
             refs=None):
    """`refs=(key, values)`: payloads reference server-side features —
    ("features_path", [paths]) for per-file reads or ("video_id", [ids])
    for the staged corpus — so the payloads are tiny and the probe
    measures the serving machinery (queue, batcher, compiled step)
    rather than multi-MB JSON parses (a 48×4096 C3D feature array is
    ~4 MB of JSON text per request)."""
    payloads = []
    rng = np.random.default_rng(0)
    for i in range(concurrency):
        body = {"query": f"the person number {i} opens the door",
                "duration": 24.0}
        if refs is not None:
            key, values = refs
            body[key] = values[i % len(values)]
        else:
            body["features"] = rng.normal(
                size=(48, cfg.model.feature_dim)).astype(float).tolist()
        payloads.append(json.dumps(body).encode())
    stop = threading.Event()
    lats: list = []
    errs: list = []
    threads = [
        threading.Thread(target=_client_loop,
                         args=(url, payloads[i], stop, lats, errs),
                         daemon=True)
        for i in range(concurrency)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t0
    if errs:
        print(f"  !! {len(errs)} errors, first: {errs[0]}", file=sys.stderr)
    arr = np.asarray(sorted(lats))
    if not len(arr):
        return None
    return {
        "concurrency": concurrency,
        "requests": len(arr),
        "qps": len(arr) / wall,
        "p50_ms": float(np.percentile(arr, 50) * 1e3),
        "p95_ms": float(np.percentile(arr, 95) * 1e3),
        "max_ms": float(arr[-1] * 1e3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="serving load probe")
    p.add_argument("--config", default="synthetic_tiny")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-wait-ms", type=float, nargs="+",
                   default=[2.0, 5.0, 20.0])
    p.add_argument("--concurrency", type=int, nargs="+",
                   default=[1, 4, 16, 64])
    p.add_argument("--seconds", type=float, default=8.0,
                   help="measurement window per cell")
    p.add_argument("--features-path-mode", action="store_true",
                   help="clients reference pre-saved server-side .npy "
                        "files instead of shipping features as JSON "
                        "(isolates the serving machinery from payload "
                        "parse time)")
    p.add_argument("--video-id-mode", action="store_true",
                   help="clients send video_id against a --stage-corpus "
                        "server (zero request-path file IO — the fastest "
                        "reference mode)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip the TPU relay)")
    args = p.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from drn_tpu.config import get_config
    from drn_tpu.serve import (GroundingHTTPServer, build_service,
                               make_handler)

    cfg = get_config(args.config)
    refs = None
    corpus_dir = None
    if args.features_path_mode or args.video_id_mode:
        import tempfile

        corpus_dir = tempfile.mkdtemp(prefix="drn_serve_probe_")
        rng = np.random.default_rng(1)
        names, paths = [], []
        for i in range(8):
            path = os.path.join(corpus_dir, f"vid{i}.npy")
            np.save(path, rng.normal(
                size=(48, cfg.model.feature_dim)).astype(np.float32))
            names.append(f"vid{i}")
            paths.append(path)
        refs = (("video_id", names) if args.video_id_mode
                else ("features_path", paths))
    rows = []
    for wait in args.max_wait_ms:
        service = build_service(cfg, batch_size=args.batch_size,
                                max_wait_ms=wait,
                                features_root=corpus_dir,
                                stage_corpus=args.video_id_mode)
        service.start()  # warms the compile before traffic
        httpd = GroundingHTTPServer(("127.0.0.1", 0), make_handler(service))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        # one-step reference: a lone request's floor is ~step + wait
        t0 = time.perf_counter()
        service._run([])
        step_ms = (time.perf_counter() - t0) * 1e3
        print(f"max_wait_ms={wait}  batch={service.batch_size}  "
              f"bare step={step_ms:.1f} ms", flush=True)
        for conc in args.concurrency:
            r = run_load(service, url, cfg, conc, args.seconds,
                         refs=refs)
            if r is None:
                continue
            r.update({"max_wait_ms": wait, "batch": service.batch_size,
                      "step_ms": round(step_ms, 1)})
            rows.append(r)
            print(f"  conc={conc:4d}  qps={r['qps']:8.1f}  "
                  f"p50={r['p50_ms']:7.1f} ms  p95={r['p95_ms']:7.1f} ms  "
                  f"n={r['requests']}", flush=True)
        httpd.shutdown()
        service.stop()
    print(json.dumps({"config": cfg.name, "rows": rows}))


if __name__ == "__main__":
    main()
