"""Gesture-synthesis serving.

A production-shaped inference server the reference lacks entirely (its only
"serving" is the offline render loop): load a trained checkpoint once,
pre-compile the windowed-synthesis scan, and serve synthesis requests over
HTTP. Latency numbers live in docs/PERFORMANCE.md (measured with honest
value-fetch sync — the request path's elapsed_ms ends after the full
device->host copy of the output, so it cannot under-report).

API (JSON over HTTP):
  GET  /healthz           -> {"status": "ok", "backend": ...}
  POST /synthesize        body: {
        "audio": [float, ...] | null,   # 16 kHz waveform; null = silence
                                        # covering the words' time range
        "audio_b64": base64 str,        # OR: raw little-endian float32
                                        # samples (takes precedence over
                                        # "audio"; ~40x cheaper to parse —
                                        # docs/PERFORMANCE.md serve table)
        "words": [[word, start_s, end_s], ...],
        "vid_idx": int (optional),
        "fade_out": bool (optional),
        "binary": bool (optional),      # true -> arrays come back as
                                        # base64 f32 + shape fields
                                        # (dir_vec_b64/dir_vec_shape/...)
        "fps": implied 15
      }
      -> {"dir_vec": [[27 floats] x F], "poses": [[10][3] x F],
          "frames": F, "elapsed_ms": ...}
  POST /synthesize_batch  body: {"requests": [<synthesize body>, ...]}
      -> {"results": [<synthesize response>, ...]} — the whole batch runs
      as ONE device program (the fused clip program vmapped over clips);
      elapsed_ms on each result is the batch wall time
      (with --auto-batch-ms N, concurrent /synthesize requests arriving
      within N ms coalesce into the same batched program server-side —
      no client changes needed)
  POST /stream/start      body: {"vid_idx": int?, "seed": int?}
      -> {"stream_id": ...} — open a live synthesis session
  POST /stream/feed       body: {"stream_id", "audio": [...] |
                                 "audio_b64": ..., "words": [...]?,
                                 "binary": bool?}
      -> {"dir_vec": [...frames final so far...], "frames": k}
  POST /stream/flush      body: {"stream_id", "words": [...]?}
      -> final frames + closes the session
      (streaming.StreamingSynthesizer: frames are emitted the moment each
      34-frame window's audio is complete — live avatars, not just clips)

Compilation: the window scan is shape-specialized on the window count; the
service pads window counts up to power-of-two buckets and `warmup` compiles
EVERY bucket up to its horizon, so steady-state requests never recompile
(asserted by tests/test_serve.py::test_load_smoke_no_steadystate_recompiles).

Run: python -m speech2affective_gestures_tpu.serve -b BASE -c cfg.yml \
         [--port 8787]
"""

from __future__ import annotations

import argparse
import base64
import binascii
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


def encode_f32_b64(arr) -> str:
    """Array -> base64 of raw little-endian float32 (C order)."""
    return base64.b64encode(
        np.ascontiguousarray(arr, dtype="<f4").tobytes()
    ).decode("ascii")


def decode_f32_b64(blob: str) -> np.ndarray:
    """base64 of raw little-endian float32 -> 1-D float32 array."""
    try:
        raw = base64.b64decode(blob, validate=True)
    except (binascii.Error, TypeError) as e:
        raise ValueError(f"bad base64 audio: {e}") from None
    if len(raw) % 4:
        raise ValueError(
            f"audio_b64 decodes to {len(raw)} bytes, not a multiple of 4 "
            "(expected raw little-endian float32 samples)"
        )
    # .copy(): frombuffer views the read-only bytes object
    return np.frombuffer(raw, dtype="<f4").astype(np.float32, copy=True)


def audio_from_request(req: dict) -> np.ndarray | None:
    """Pull the waveform out of a request dict: 'audio_b64' (raw f32le,
    ~40x cheaper than a JSON float list on this host) wins over 'audio';
    both absent / null -> None (silence covering the words)."""
    b64 = req.get("audio_b64")
    if b64 is not None:
        return decode_f32_b64(b64)
    raw = req.get("audio")
    return None if raw is None else np.asarray(raw, np.float32)

from . import constants as C
from .config import ModelConfig
from .data.vocab import Vocab
from .ops import pose as pose_ops
from .train import builder, synthesis


class SynthesisService:
    """Owns the model, vocab and the compiled window scan; thread-safe
    (single device queue; JAX dispatch serializes).

    `gen` must be the module the `variables` were created with — construct
    via `from_trainer` (checkpointed models) or `from_config` (fresh)."""

    def __init__(self, cfg: ModelConfig, gen, variables, lang_model: Vocab,
                 use_mfcc: bool = True, precision: str = "f32",
                 auto_batch_ms: float = 0.0, auto_batch_max: int = 16):
        self.cfg = cfg
        self.lang = lang_model
        self.gen = gen
        self.variables = variables
        self.use_mfcc = use_mfcc
        # 'f32' = converted-checkpoint output parity (highest-precision
        # matmuls); 'bf16' = TPU-native inference precision — measured
        # latency/drift trade in docs/PERFORMANCE.md (precision_wrap)
        self.precision = precision
        # the whole request path (MFCC -> window scan -> crossfade -> FK)
        # as ONE device program per window bucket: one dispatch + one fetch
        # per request instead of one per stage (synthesis.make_fused_clip_fn)
        self.clip_fn = synthesis.make_fused_clip_fn(
            gen.apply, cfg, use_mfcc, precision
        )
        # multi-clip program for /synthesize_batch, compiled lazily per
        # (clip-count bucket, window bucket) pair
        self.batched_fn = synthesis.make_batched_clip_fn(
            gen.apply, cfg, use_mfcc, precision=precision
        )
        self._lock = threading.Lock()
        self._counter = 0
        # server-side micro-batching: /synthesize requests arriving within
        # auto_batch_ms of each other coalesce into ONE /synthesize_batch
        # device program (vmapped over clips — concurrent throughput
        # approaches the batched line instead of serializing per-clip
        # programs). 0 = off (default): single requests keep their
        # zero-added-latency path.
        self.auto_batch_ms = float(auto_batch_ms)
        self.auto_batch_max = int(auto_batch_max)
        self._ab_lock = threading.Lock()
        self._ab_pending: list[dict] = []
        # live sessions: one shared compiled window program for all of them
        self._window_fn = None
        self._streams: dict = {}
        self._stream_last_used: dict = {}
        self.stream_idle_ttl = 600.0  # s; idle sessions pruned lazily
        self.max_streams = 256
        # request metrics: per-endpoint latency aggregates (/metrics);
        # own lock — _record is called from ThreadingHTTPServer threads
        # and metrics() must not iterate a dict another thread grows
        self._metrics: dict = {}
        self._metrics_lock = threading.Lock()

    def _record(self, endpoint: str, elapsed_ms: float, clips: int = 1,
                phases: dict | None = None):
        with self._metrics_lock:
            m = self._metrics.setdefault(endpoint, {
                "requests": 0, "clips": 0, "total_ms": 0.0,
                "max_ms": 0.0, "recent_ms": [], "phase_ms": {},
            })
            m["requests"] += 1
            m["clips"] += clips
            m["total_ms"] += elapsed_ms
            m["max_ms"] = max(m["max_ms"], elapsed_ms)
            m["recent_ms"].append(round(elapsed_ms, 2))
            del m["recent_ms"][:-64]  # bounded window for percentiles
            # phase breakdown (host prep / device / host post / transport):
            # where a request's wall time actually goes on this 1-core host
            for k, v in (phases or {}).items():
                m["phase_ms"][k] = m["phase_ms"].get(k, 0.0) + float(v)

    def reset_metrics(self):
        """Drop accumulated aggregates (warmup() calls this so compile
        latencies never pollute the steady-state numbers)."""
        with self._metrics_lock:
            self._metrics.clear()

    def metrics(self) -> dict:
        out = {}
        with self._metrics_lock:
            for endpoint, m in self._metrics.items():
                recent = sorted(m["recent_ms"])
                out[endpoint] = {
                    "requests": m["requests"],
                    "clips": m["clips"],
                    "mean_ms": round(m["total_ms"] / max(m["requests"], 1), 2),
                    "max_ms": round(m["max_ms"], 2),
                    "p50_ms": recent[len(recent) // 2] if recent else None,
                    "p90_ms": recent[int(len(recent) * 0.9)] if recent else None,
                }
                if m.get("phase_ms"):
                    n = max(m["requests"], 1)
                    out[endpoint]["phase_mean_ms"] = {
                        k: round(v / n, 2) for k, v in m["phase_ms"].items()
                    }
        out["active_streams"] = len(self._streams)
        return out

    @classmethod
    def from_config(cls, cfg: ModelConfig, variables, lang_model: Vocab,
                    n_speakers: int = 1000, variant: str = "s2ag",
                    word_embeddings=None,
                    precision: str = "f32") -> "SynthesisService":
        gen, _, _ = builder.build_models(
            cfg, lang_model.n_words if lang_model else 1000, n_speakers,
            word_embeddings=word_embeddings, variant=variant,
        )
        return cls(cfg, gen, variables, lang_model,
                   use_mfcc=(variant != "abl_audio"), precision=precision)

    @classmethod
    def from_trainer(cls, trainer, precision: str = "f32",
                     **kwargs) -> "SynthesisService":
        lang = (trainer.test_data.lang_model if trainer.test_data
                else trainer.train_data.lang_model)
        variables = {
            "params": trainer.state.gen_params,
            "batch_stats": trainer.state.gen_stats,
        }
        return cls(
            trainer.cfg, trainer.gen, variables, lang,
            use_mfcc=getattr(trainer, "variant", "s2ag") != "abl_audio",
            precision=precision, **kwargs,
        )

    def warmup(self, seconds: float = 62.0):
        """Compile EVERY window-count bucket up to the one covering
        `seconds` (the scan is shape-specialized on the bucketed window
        count: 4, 8, 16, ... — synthesis.synthesize_clip), so steady-state
        requests of any length <= `seconds` never recompile."""
        unit = self.cfg.n_poses / self.cfg.motion_resampling_framerate
        stride = ((self.cfg.n_poses - self.cfg.n_pre_poses)
                  / self.cfg.motion_resampling_framerate)
        words = [["<UNK>", 0.1, 0.4], ["<UNK>", 1.0, 1.4]]
        max_len = max(seconds, unit + 0.1)
        if stride <= 0:  # n_pre_poses >= n_poses: single-window clips only
            audio = np.zeros(int(unit * C.AUDIO_SR), np.float32)
            self.synthesize(audio, words)
            self.reset_metrics()
            return
        bucket = 4
        while True:
            # a clip with exactly `bucket` windows (n = ceil((L-unit)/stride)
            # + 1, plan_subdivisions): aim mid-bucket so float rounding can't
            # spill into the next one
            length = min(unit + (bucket - 1.5) * stride, max_len)
            audio = np.zeros(int(length * C.AUDIO_SR), np.float32)
            self.synthesize(audio, words)
            if length >= max_len:
                break
            bucket *= 2
        # compile latencies are not request latencies
        self.reset_metrics()

    def synthesize(self, audio: np.ndarray | None, words, vid_idx: int = 0,
                   fade_out: bool = False) -> dict:
        t0 = time.perf_counter()
        audio = self._fill_audio(audio, words)
        with self._lock:  # only the id draw; JAX dispatch is thread-safe,
            self._counter += 1  # and the device queue serializes compute —
            rng = jax.random.key(self._counter)  # host prep may overlap
        phases: dict = {}
        dir_vec, poses = synthesis.synthesize_clip_fused(
            self.clip_fn, self.variables, audio, words, self.lang,
            self.cfg, vid_idx=vid_idx, rng=rng, fade_out=fade_out,
            timings=phases,
        )
        elapsed = (time.perf_counter() - t0) * 1e3
        self._record("synthesize", elapsed, phases=phases)
        return {
            "dir_vec": dir_vec,
            "poses": poses,
            "frames": int(len(dir_vec)),
            "elapsed_ms": elapsed,
        }

    @staticmethod
    def _fill_audio(audio, words):
        if audio is None:
            end = max((w[2] for w in words), default=1.0) + 0.5
            return np.zeros(int(end * C.AUDIO_SR), np.float32)
        return np.asarray(audio, np.float32)

    def synthesize_batch(self, requests) -> list[dict]:
        """Serve many requests as ONE device program (the fused clip
        program vmapped over clips — synthesis.make_batched_clip_fn).

        requests: list of dicts {audio, words, vid_idx?, fade_out?}. The
        clip count is padded to a power-of-two bucket (with minimal dummy
        clips) so the program compiles once per (B bucket, window bucket);
        elapsed_ms on each result is the batch wall time.
        """
        t0 = time.perf_counter()
        if not requests:
            return []
        clips, fades = [], []
        for req in requests:
            words = req.get("words", [])
            audio = self._fill_audio(audio_from_request(req), words)
            clips.append((audio, words, int(req.get("vid_idx", 0))))
            fades.append(bool(req.get("fade_out", False)))
        n_real = len(clips)
        bucket = 1 << max(0, (n_real - 1).bit_length())
        unit = self.cfg.n_poses / self.cfg.motion_resampling_framerate
        dummy = (np.zeros(int(unit * C.AUDIO_SR), np.float32), [], 0)
        clips += [dummy] * (bucket - n_real)
        fades += [False] * (bucket - n_real)
        with self._lock:  # only the id draw (see synthesize)
            base = self._counter + 1
            self._counter += n_real
        keys = jnp.stack([
            jax.random.key(base + i) for i in range(bucket)
        ])
        phases: dict = {}
        outs = synthesis.synthesize_clips_batched(
            self.batched_fn, self.variables, clips, self.lang, self.cfg,
            fade_out=fades, keys=keys, timings=phases,
        )[:n_real]
        elapsed = (time.perf_counter() - t0) * 1e3
        self._record("synthesize_batch", elapsed, clips=n_real,
                     phases=phases)
        return [
            {"dir_vec": dv, "poses": ps, "frames": int(len(dv)),
             "elapsed_ms": elapsed}
            for dv, ps in outs
        ]

    # -------------------------------------------- request micro-batching

    def synthesize_auto(self, audio, words, vid_idx: int = 0,
                        fade_out: bool = False) -> dict:
        """/synthesize entry honoring auto_batch_ms: requests that arrive
        while one is waiting coalesce into a single batched device program
        (synthesize_batch); with auto_batch_ms == 0 this IS synthesize().

        A request waits at most auto_batch_ms for companions; a full
        auto_batch_max group dispatches immediately. Failures of the
        shared batch surface on every member request."""
        if self.auto_batch_ms <= 0:
            return self.synthesize(audio, words, vid_idx=vid_idx,
                                   fade_out=fade_out)
        entry = {
            "req": {"audio": audio, "words": words, "vid_idx": vid_idx,
                    "fade_out": fade_out},
            "event": threading.Event(), "out": None, "err": None,
        }
        with self._ab_lock:
            self._ab_pending.append(entry)
            first = len(self._ab_pending) == 1
            full = len(self._ab_pending) >= self.auto_batch_max
        if full:
            self._ab_drain()
        elif first:
            # the first waiter of a group owns its flush timer
            threading.Thread(target=self._ab_drain_later,
                             daemon=True).start()
        entry["event"].wait()
        if entry["err"] is not None:
            raise entry["err"]
        return entry["out"]

    def _ab_drain_later(self):
        time.sleep(self.auto_batch_ms / 1e3)
        self._ab_drain()

    def _ab_drain(self):
        with self._ab_lock:
            pending, self._ab_pending = self._ab_pending, []
        if not pending:
            return
        try:
            results = self.synthesize_batch([e["req"] for e in pending])
            for e, r in zip(pending, results):
                e["out"] = r
        except Exception as ex:  # noqa: BLE001 — fan the error out
            for e in pending:
                e["err"] = ex
        finally:
            for e in pending:
                e["event"].set()

    # -------------------------------------------------- live streaming

    def stream_start(self, vid_idx: int = 0, seed: int | None = None) -> str:
        """Open a live synthesis session (streaming.StreamingSynthesizer).
        All sessions share ONE compiled window program."""
        from . import streaming

        with self._lock:
            self._prune_streams()
            if len(self._streams) >= self.max_streams:
                raise ValueError(
                    f"too many open streams ({self.max_streams}); flush "
                    "or let idle sessions expire"
                )
            if self._window_fn is None:
                self._window_fn = streaming.make_window_fn(
                    self.gen.apply, self.cfg, self.use_mfcc, self.precision
                )
            self._counter += 1
            stream_id = f"s{self._counter:06d}"
            self._streams[stream_id] = streaming.StreamingSynthesizer(
                self.gen.apply, self.variables, self.lang, self.cfg,
                vid_idx=vid_idx, use_mfcc=self.use_mfcc,
                rng=jax.random.key(self._counter if seed is None else seed),
                window_fn=self._window_fn,
            )
            self._stream_last_used[stream_id] = time.monotonic()
        return stream_id

    def _prune_streams(self):
        """Drop sessions idle past stream_idle_ttl (clients that opened a
        stream and vanished without /stream/flush would otherwise leak
        their growing audio buffers forever). Caller holds self._lock."""
        cutoff = time.monotonic() - self.stream_idle_ttl
        for sid in [sid for sid, ts in self._stream_last_used.items()
                    if ts < cutoff]:
            self._streams.pop(sid, None)
            self._stream_last_used.pop(sid, None)

    def _stream(self, stream_id: str):
        try:
            stream = self._streams[stream_id]
        except KeyError:
            raise ValueError(f"unknown stream_id {stream_id!r}") from None
        self._stream_last_used[stream_id] = time.monotonic()
        return stream

    def stream_feed(self, stream_id: str, audio, words=()) -> np.ndarray:
        t0 = time.perf_counter()
        with self._lock:
            self._prune_streams()
            out = self._stream(stream_id).feed(
                np.asarray(audio, np.float32), words
            )
        self._record("stream_feed", (time.perf_counter() - t0) * 1e3)
        return out

    def stream_flush(self, stream_id: str, words=()) -> np.ndarray:
        t0 = time.perf_counter()
        with self._lock:
            out = self._stream(stream_id).flush(words)
            del self._streams[stream_id]
            self._stream_last_used.pop(stream_id, None)
        self._record("stream_flush", (time.perf_counter() - t0) * 1e3)
        return out


def make_handler(service: SynthesisService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/metrics":
                self._send(200, service.metrics())
            elif self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "n_poses": service.cfg.n_poses,
                    "precision": service.precision,
                })
            else:
                self._send(404, {"error": "unknown path"})

        @staticmethod
        def _result_payload(result: dict, binary: bool = False) -> dict:
            if binary:
                dv, ps = result["dir_vec"], result["poses"]
                return {
                    "dir_vec_b64": encode_f32_b64(dv),
                    "dir_vec_shape": list(np.shape(dv)),
                    "poses_b64": encode_f32_b64(ps),
                    "poses_shape": list(np.shape(ps)),
                    "frames": result["frames"],
                    "elapsed_ms": result["elapsed_ms"],
                }
            return {
                "dir_vec": result["dir_vec"].tolist(),
                "poses": result["poses"].tolist(),
                "frames": result["frames"],
                "elapsed_ms": result["elapsed_ms"],
            }

        @staticmethod
        def _frames_payload(out: np.ndarray, binary: bool = False) -> dict:
            if binary:
                return {"dir_vec_b64": encode_f32_b64(out),
                        "dir_vec_shape": list(np.shape(out)),
                        "frames": int(len(out))}
            return {"dir_vec": out.tolist(), "frames": int(len(out))}

        def do_POST(self):
            try:
                t0 = time.perf_counter()
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                binary = bool(req.get("binary", False))
                if self.path == "/synthesize":
                    if "audio" not in req and "audio_b64" not in req:
                        raise KeyError("audio")
                    audio = audio_from_request(req)
                    words = req.get("words", [])
                    t_parse = time.perf_counter()
                    result = service.synthesize_auto(
                        audio, words,
                        vid_idx=int(req.get("vid_idx", 0)),
                        fade_out=bool(req.get("fade_out", False)),
                    )
                    t_run = time.perf_counter()
                    self._send(200, self._result_payload(result, binary))
                    # transport-side phase accounting: how much of the
                    # request is host decode/encode vs the service call
                    service._record(
                        "synthesize.http",
                        (time.perf_counter() - t0) * 1e3,
                        phases={
                            "parse_ms": (t_parse - t0) * 1e3,
                            "run_ms": (t_run - t_parse) * 1e3,
                            "encode_ms": (time.perf_counter() - t_run) * 1e3,
                        })
                elif self.path == "/synthesize_batch":
                    results = service.synthesize_batch(req["requests"])
                    self._send(200, {
                        "results": [self._result_payload(r, binary)
                                    for r in results],
                    })
                elif self.path == "/stream/start":
                    self._send(200, {"stream_id": service.stream_start(
                        vid_idx=int(req.get("vid_idx", 0)),
                        seed=req.get("seed"),
                    )})
                elif self.path == "/stream/feed":
                    chunk = audio_from_request(req)
                    out = service.stream_feed(
                        req["stream_id"],
                        chunk if chunk is not None else [],
                        req.get("words", ()),
                    )
                    self._send(200, self._frames_payload(out, binary))
                elif self.path == "/stream/flush":
                    out = service.stream_flush(
                        req["stream_id"], req.get("words", ()),
                    )
                    self._send(200, self._frames_payload(out, binary))
                else:
                    self._send(404, {"error": "unknown path"})
            except (KeyError, ValueError, TypeError) as e:
                self._send(400, {"error": f"bad request: {e}"})
            except Exception as e:  # noqa: BLE001 — surface as HTTP 500
                self._send(500, {"error": f"synthesis failed: {e}"})

    return Handler


def serve(service: SynthesisService, port: int = 8787,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    import os
    from os.path import join as jn

    from . import compile_cache
    from .main_v2 import build_parser, load_datasets
    from .train.trainer import Trainer

    compile_cache.enable()  # see main_v2.main (S2AG_COMPILE_CACHE=0 = off)

    parser = build_parser()
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--serve-precision", choices=("f32", "bf16"),
                        default="f32",
                        help="bf16 = TPU-native inference precision "
                        "(lower latency; output drift depends on the "
                        "model — check tools/bench_serve_precision.py; "
                        "f32 = converted-checkpoint output parity)")
    parser.add_argument("--auto-batch-ms", type=float, default=0.0,
                        help="coalesce concurrent /synthesize requests "
                        "arriving within this window into one batched "
                        "device program (0 = off)")
    args = parser.parse_args(argv)
    args.train_s2ag = False  # serving never needs the train/val splits
    cfg = ModelConfig.from_yaml(args.config, batch_size=args.batch_size)
    _, _, test_data = load_datasets(args, cfg)
    # same work dir main_v2 trains into, so load_checkpoint('best') finds it
    work_dir = jn(args.base_path, "models", "s2ag_v2_mfcc_tpu",
                  args.dataset_s2ag)
    trainer = Trainer(cfg, work_dir, test_data=test_data, use_mesh=False)
    if args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    elif args.s2ag_load_last_best:
        if not trainer.load_checkpoint("best"):
            raise SystemExit(
                f"no checkpoint found in {work_dir}; pass --torch-checkpoint "
                "or --s2ag-load-last-best false to serve random-init weights"
            )
    service = SynthesisService.from_trainer(
        trainer, precision=args.serve_precision,
        auto_batch_ms=args.auto_batch_ms,
    )
    print("warming up (compiles the window scan)...")
    service.warmup()
    server = serve(service, port=args.port)
    print(f"serving on :{args.port}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
