"""Concurrent load test of the synthesis service.

Drives a live SynthesisService over HTTP with concurrent clients and
reports per-endpoint throughput + latency percentiles from the service's
own /metrics aggregation, comparing:

- N sequential /synthesize requests (the per-clip fused program),
- the same N clips as /synthesize_batch calls of size B,
- a /stream session feeding real-time-sized chunks (is the service fast
  enough to keep up with live audio? headroom = audio-seconds per wall-s).

Each section runs in BOTH transports: 'json' (float lists, the naive
client) and 'b64' (audio_b64 raw-f32 request + binary response) — on a
1-core host the JSON encode/parse of 80k samples/clip dominates the
whole request, so the transport choice IS the serving throughput story
(docs/PERFORMANCE.md).

Usage: python tools/bench_serve_load.py [--clips 32] [--seconds 5]
       [--batch 8] [--threads 4]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    assert resp.status == 200, data
    return data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=32)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--chunk-ms", type=int, default=250)
    p.add_argument("--tiny", action="store_true",
                   help="small model config (CPU smoke runs)")
    args = p.parse_args(argv)

    import numpy as np

    from speech2affective_gestures_tpu import compile_cache

    compile_cache.enable()
    import jax

    # honor JAX_PLATFORMS=cpu even though the axon sitecustomize
    # froze the platform default at interpreter start (same trick
    # as tests/conftest.py / __graft_entry__.dryrun_multichip)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from speech2affective_gestures_tpu import constants as C
    from speech2affective_gestures_tpu import serve as serve_mod
    from speech2affective_gestures_tpu.config import ModelConfig
    from speech2affective_gestures_tpu.data.vocab import Vocab
    from speech2affective_gestures_tpu.train import builder
    import jax.numpy as jnp

    cfg = (ModelConfig(hidden_size=32, hidden_size_s2eg=32,
                       n_layers=2)
           if args.tiny else ModelConfig())
    gen, _, _ = builder.build_models(cfg, 1000, 100)
    batch = builder.synthetic_batch(np.random.default_rng(0), 2, cfg, 1000, 100)
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((2, cfg.n_poses, C.POSE_DIM + 1)),
        jnp.asarray(batch["extended_word_seq"]),
        jnp.asarray(batch["mfcc_features"]),
        jnp.asarray(batch["vid_indices"]),
    )
    lang = Vocab("load")
    for w in ("hello", "world"):
        lang.index_word(w)
    service = serve_mod.SynthesisService(cfg, gen, variables, lang)
    service.warmup(seconds=max(args.seconds + 1, 10.0))
    server = serve_mod.serve(service, port=0)
    port = server.server_address[1]

    words = [["hello", 0.3, 0.8], ["world", 2.0, 2.5]]
    n_audio = int(args.seconds * C.AUDIO_SR)
    raw_audios = [
        (0.2 * np.sin(2 * np.pi * (150 + 9 * i) * np.arange(n_audio)
                      / C.AUDIO_SR)).astype(np.float32)
        for i in range(args.clips)
    ]
    audios = [a.tolist() for a in raw_audios]
    audios_b64 = [serve_mod.encode_f32_b64(a) for a in raw_audios]

    def req_body(i, transport):
        if transport == "b64":
            return {"audio_b64": audios_b64[i], "words": words,
                    "vid_idx": i % 50, "binary": True}
        return {"audio": audios[i], "words": words, "vid_idx": i % 50}

    # --- warmups: this exact window bucket, the batch program
    # (B bucket x window bucket), and the stream window program, so the
    # timed sections measure steady state
    _post(port, "/synthesize", req_body(0, "json"))
    _post(port, "/synthesize_batch", {"requests": [
        req_body(0, "json") for _ in range(args.batch)
    ]})
    _sid = _post(port, "/stream/start", {})["stream_id"]
    _post(port, "/stream/feed", {"stream_id": _sid, "audio": audios[0]})
    _post(port, "/stream/flush", {"stream_id": _sid})

    def section_metrics():
        """Per-section phase breakdown: fetch + reset so sections (and
        their compiles) can't pollute each other's means."""
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        m = json.loads(conn.getresponse().read())
        conn.close()
        service.reset_metrics()
        return {k: {kk: v[kk] for kk in ("mean_ms", "p50_ms", "p90_ms",
                                         "phase_mean_ms") if kk in v}
                for k, v in m.items() if isinstance(v, dict)}

    results = {}
    phases = {}
    section_metrics()  # drop warmup aggregates
    for transport in ("json", "b64"):
        # --- threaded /synthesize
        def one(i, _t=transport):
            return _post(port, "/synthesize", req_body(i, _t))

        t0 = time.perf_counter()
        with ThreadPoolExecutor(args.threads) as ex:
            list(ex.map(one, range(args.clips)))
        t_single = time.perf_counter() - t0
        phases[f"synthesize.{transport}"] = section_metrics()

        # --- /synthesize_batch in groups of B
        t0 = time.perf_counter()
        for lo in range(0, args.clips, args.batch):
            _post(port, "/synthesize_batch", {
                "binary": transport == "b64",
                "requests": [req_body(i, transport)
                             for i in range(lo, min(lo + args.batch,
                                                    args.clips))],
            })
        t_batch = time.perf_counter() - t0
        phases[f"batch.{transport}"] = section_metrics()

        # --- live stream: chunk_ms-sized chunks, keep-up headroom
        sid = _post(port, "/stream/start", {"vid_idx": 1})["stream_id"]
        chunk = int(C.AUDIO_SR * args.chunk_ms / 1000)
        t0 = time.perf_counter()
        frames = 0
        for lo in range(0, n_audio, chunk):
            body = {"stream_id": sid}
            if transport == "b64":
                body["audio_b64"] = serve_mod.encode_f32_b64(
                    raw_audios[0][lo:lo + chunk])
                body["binary"] = True
            else:
                body["audio"] = audios[0][lo:lo + chunk]
            if lo == 0:
                body["words"] = words
            frames += _post(port, "/stream/feed", body)["frames"]
        frames += _post(port, "/stream/flush", {"stream_id": sid})["frames"]
        t_stream = time.perf_counter() - t0

        results[transport] = {
            "synthesize_clips_per_s": round(args.clips / t_single, 2),
            "batch_clips_per_s": round(args.clips / t_batch, 2),
            "batch_speedup": round(t_single / t_batch, 2),
            "stream_realtime_headroom": round(args.seconds / t_stream, 1),
            "stream_frames": frames,
        }

    # --- server-side micro-batching A/B: concurrent b64 /synthesize with
    # auto_batch_ms off vs on (toggled in-process on the same service, so
    # the comparison shares compiled programs and device state)
    auto_results = {}

    def one_b64(i):
        return _post(port, "/synthesize", req_body(i, "b64"))

    # warm every clip-count bucket the coalescer can form (requests may
    # split across timer windows, so group sizes 1..threads all occur)
    service.auto_batch_ms = 10.0
    with ThreadPoolExecutor(max(args.threads, 8)) as ex:
        list(ex.map(one_b64, range(args.clips)))
    for ab_ms in (0.0, 10.0):
        service.auto_batch_ms = ab_ms
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max(args.threads, 8)) as ex:
            list(ex.map(one_b64, range(args.clips)))
        auto_results["on" if ab_ms else "off"] = round(
            args.clips / (time.perf_counter() - t0), 2
        )
    service.auto_batch_ms = 0.0

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/metrics")
    metrics = json.loads(conn.getresponse().read())
    conn.close()
    server.shutdown()

    print(json.dumps({
        "clips": args.clips, "clip_seconds": args.seconds,
        "threads": args.threads, "batch": args.batch,
        "json": results["json"],
        "b64": results["b64"],
        "auto_batch_synthesize_clips_per_s": auto_results,
        "section_phases": phases,
        "metrics": metrics,
    }), flush=True)


if __name__ == "__main__":
    main()
