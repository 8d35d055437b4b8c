"""HTTP synthesis service: end-to-end request/response + error paths."""

import http.client
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speech2affective_gestures_tpu import constants as C
from speech2affective_gestures_tpu import serve
from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.data.vocab import Vocab
from speech2affective_gestures_tpu.models.generator import PoseGenerator

pytestmark = pytest.mark.slow  # compile-heavy: window-scan buckets

CFG = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)


@pytest.fixture(scope="module")
def service():
    gen = PoseGenerator(
        n_words=30, n_speakers=5, hidden_size=32, n_layers=2,
        mfcc_length=CFG.mfcc_length, num_mfcc=CFG.num_mfcc_combined,
    )
    pre = jnp.zeros((1, CFG.n_poses, C.POSE_DIM + 1))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, jnp.zeros((1, CFG.n_poses), jnp.int32),
        jnp.zeros((1, CFG.num_mfcc_combined, CFG.mfcc_length)),
        jnp.zeros((1,), jnp.int32),
    )
    lang = Vocab("w")
    for w in ("hello", "world"):
        lang.index_word(w)
    return serve.SynthesisService(CFG, gen, variables, lang)


@pytest.fixture(scope="module")
def server(service):
    srv = serve.serve(service, port=0)  # ephemeral port
    yield srv
    srv.shutdown()


def _request(server, method, path, payload=None):
    conn = http.client.HTTPConnection(*server.server_address)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def test_healthz(server):
    status, data = _request(server, "GET", "/healthz")
    assert status == 200
    assert data["status"] == "ok"
    assert data["n_poses"] == CFG.n_poses


def test_synthesize_roundtrip(server):
    audio = (0.2 * np.sin(np.arange(int(4.0 * C.AUDIO_SR)) / 30)).tolist()
    status, data = _request(server, "POST", "/synthesize", {
        "audio": audio,
        "words": [["hello", 0.2, 0.6], ["world", 1.5, 2.0]],
        "vid_idx": 1,
    })
    assert status == 200
    out = np.asarray(data["dir_vec"])
    assert out.shape[1] == C.POSE_DIM
    assert data["frames"] == len(out)
    poses = np.asarray(data["poses"])
    assert poses.shape == (len(out), C.NUM_JOINTS, 3)
    assert np.isfinite(out).all()


def test_bad_request_returns_400(server):
    status, data = _request(server, "POST", "/synthesize", {"words": []})
    assert status == 400
    assert "bad request" in data["error"]


def test_unknown_path_404(server):
    status, _ = _request(server, "GET", "/bogus")
    assert status == 404


def test_null_audio_synthesizes_silence(server):
    status, data = _request(server, "POST", "/synthesize", {
        "audio": None,
        "words": [["hello", 0.2, 0.6]],
    })
    assert status == 200
    assert data["frames"] > 0


def test_window_bucketing_constant_compiles(service):
    """Different clip lengths within a bucket reuse the same compiled scan
    and produce the right frame counts."""
    from speech2affective_gestures_tpu.train import synthesis

    for seconds in (5.0, 7.0):
        audio = np.zeros(int(seconds * C.AUDIO_SR), np.float32)
        out = service.synthesize(audio, [["hello", 0.1, 0.5]])
        windows, *_ = synthesis.plan_subdivisions(seconds, CFG)
        expected = (len(windows) - 1) * (CFG.n_poses - CFG.n_pre_poses) \
            + CFG.n_poses
        assert out["frames"] == expected


def test_from_config_constructor_matches_checkpoint_shapes():
    """from_config must rebuild a generator compatible with the variables
    (regression for the constructor that rebuilt with wrong sizes)."""
    from speech2affective_gestures_tpu.train import builder

    lang = Vocab("w")
    for w in ("a", "b"):
        lang.index_word(w)
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    gen, _, _ = builder.build_models(cfg, lang.n_words, n_speakers=7)
    pre = jnp.zeros((1, cfg.n_poses, C.POSE_DIM + 1))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, jnp.zeros((1, cfg.n_poses), jnp.int32),
        jnp.zeros((1, cfg.num_mfcc_combined, cfg.mfcc_length)),
        jnp.zeros((1,), jnp.int32),
    )
    svc = serve.SynthesisService.from_config(cfg, variables, lang, n_speakers=7)
    audio = np.zeros(int(3.0 * C.AUDIO_SR), np.float32)
    out = svc.synthesize(audio, [["a", 0.1, 0.4]])
    assert out["frames"] > 0


def test_load_smoke_no_steadystate_recompiles(service):
    """N concurrent requests over a spread of clip lengths: all succeed, and
    the power-of-two window bucketing keeps the compiled-shape set bounded
    (steady state never recompiles — serve.py:22-24). Compilations are
    counted by wrapping the service's fused clip program and recording the
    bucketed window-count shapes it sees."""
    import threading

    seen_shapes = set()
    orig_clip = service.clip_fn

    def counting_clip(variables, audio_windows, text_windows, *a, **k):
        seen_shapes.add(audio_windows.shape[0])
        return orig_clip(variables, audio_windows, text_windows, *a, **k)

    service.clip_fn = counting_clip
    try:
        # warm the buckets once (the server does this at startup)
        service.warmup(seconds=20.0)
        warm_shapes = set(seen_shapes)

        results, errors = [], []

        def one(seconds, idx):
            try:
                audio = np.zeros(int(seconds * C.AUDIO_SR), np.float32)
                words = [["hello", 0.1, 0.5], ["world", 1.0, 1.5]]
                r = service.synthesize(audio, words, vid_idx=idx % 5)
                results.append(r)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        lengths = [3.0, 4.5, 6.0, 8.0, 11.0, 14.0, 17.0, 19.5]
        threads = [threading.Thread(target=one, args=(s, i))
                   for i, s in enumerate(lengths)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert len(results) == len(lengths)
        for r in results:
            assert r["frames"] > 0
            assert np.isfinite(r["dir_vec"]).all()
            assert r["elapsed_ms"] > 0
        # steady state: every request hit a bucket already compiled during
        # warmup — no new shapes after the warm set
        assert seen_shapes == warm_shapes, (
            f"requests created new scan shapes: {seen_shapes - warm_shapes}"
        )
    finally:
        service.clip_fn = orig_clip


def test_synthesize_batch_roundtrip(server):
    """/synthesize_batch: N requests -> one vmapped device program; each
    result matches the shape/finiteness contract of /synthesize, and
    mixed lengths + null-audio + fade_out coexist in one batch."""
    audio = (0.2 * np.sin(np.arange(int(4.0 * C.AUDIO_SR)) / 30)).tolist()
    long_audio = (0.1 * np.sin(np.arange(int(9.0 * C.AUDIO_SR)) / 50)).tolist()
    status, data = _request(server, "POST", "/synthesize_batch", {
        "requests": [
            {"audio": audio, "words": [["hello", 0.2, 0.6]], "vid_idx": 1},
            {"audio": long_audio, "words": [["world", 1.0, 1.5]],
             "fade_out": True},
            {"audio": None, "words": [["x", 0.2, 0.6]]},
        ],
    })
    assert status == 200
    results = data["results"]
    assert len(results) == 3
    lens = []
    for r in results:
        out = np.asarray(r["dir_vec"])
        assert out.shape[1] == C.POSE_DIM
        assert r["frames"] == len(out)
        assert np.isfinite(out).all()
        assert np.asarray(r["poses"]).shape == (len(out), C.NUM_JOINTS, 3)
        lens.append(len(out))
    assert lens[1] > lens[0]  # per-clip lengths survive shared bucketing
    # fade_out lane ends at the mean pose; the others need not
    assert np.abs(np.asarray(results[1]["dir_vec"])[-1]).max() < 1e-6


def test_synthesize_batch_empty_and_bad(server):
    status, data = _request(server, "POST", "/synthesize_batch",
                            {"requests": []})
    assert status == 200 and data["results"] == []
    status, _ = _request(server, "POST", "/synthesize_batch", {})
    assert status == 400


def test_stream_endpoints_roundtrip(server, service):
    """Live session over HTTP: start -> feed chunks -> flush equals the
    offline /synthesize output for the same audio/words/seed."""
    from speech2affective_gestures_tpu.train import synthesis

    audio = (0.2 * np.sin(np.arange(int(6.0 * C.AUDIO_SR)) / 40)
             ).astype(np.float32)
    words = [["hello", 0.3, 0.8]]

    status, data = _request(server, "POST", "/stream/start",
                            {"vid_idx": 2, "seed": 77})
    assert status == 200
    sid = data["stream_id"]
    frames = []
    chunk = 50000
    for i in range(0, len(audio), chunk):
        body = {"stream_id": sid, "audio": audio[i:i + chunk].tolist()}
        if i == 0:
            body["words"] = words
        status, data = _request(server, "POST", "/stream/feed", body)
        assert status == 200
        frames.extend(data["dir_vec"])
    status, data = _request(server, "POST", "/stream/flush",
                            {"stream_id": sid})
    assert status == 200
    frames.extend(data["dir_vec"])
    got = np.asarray(frames, np.float32)

    want = synthesis.synthesize_clip(
        service.gen.apply, service.variables, audio, words,
        service.lang, service.cfg, vid_idx=2,
        rng=__import__("jax").random.key(77),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # session is closed
    status, _ = _request(server, "POST", "/stream/feed",
                         {"stream_id": sid, "audio": []})
    assert status == 400


def test_stream_unknown_id_400(server):
    status, data = _request(server, "POST", "/stream/feed",
                            {"stream_id": "nope", "audio": []})
    assert status == 400


def test_metrics_endpoint(server):
    # self-sufficient: drive one request per endpoint family so the
    # assertions don't depend on module ordering (warmup() resets metrics)
    body = {"audio": None, "words": [["hello", 0.2, 0.6]]}
    assert _request(server, "POST", "/synthesize", body)[0] == 200
    assert _request(server, "POST", "/synthesize_batch",
                    {"requests": [body, body, body]})[0] == 200
    sid = _request(server, "POST", "/stream/start", {})[1]["stream_id"]
    _request(server, "POST", "/stream/feed",
             {"stream_id": sid, "audio": [0.0] * 1600})
    _request(server, "POST", "/stream/flush", {"stream_id": sid})

    status, data = _request(server, "GET", "/metrics")
    assert status == 200
    assert data["synthesize"]["requests"] >= 1
    assert data["synthesize"]["p50_ms"] > 0
    assert data["synthesize_batch"]["clips"] >= 3
    assert data["stream_feed"]["requests"] >= 1
    assert data["active_streams"] == 0
    # phase breakdown: service-side prep/device/post and the HTTP layer's
    # parse/run/encode means are reported, positive, and bounded by the
    # endpoint mean (phases are sub-spans of the request)
    for ep, keys in (("synthesize", ("prep_ms", "device_ms", "post_ms")),
                     ("synthesize_batch", ("prep_ms", "device_ms",
                                           "post_ms")),
                     ("synthesize.http", ("parse_ms", "run_ms",
                                          "encode_ms"))):
        phases = data[ep]["phase_mean_ms"]
        for k in keys:
            assert phases[k] >= 0.0, (ep, k)
        assert sum(phases.values()) <= data[ep]["mean_ms"] * 1.05, ep
    assert data["synthesize"]["phase_mean_ms"]["device_ms"] > 0


def test_stream_prune_and_cap(service):
    ttl, cap = service.stream_idle_ttl, service.max_streams
    try:
        sid = service.stream_start()
        service.stream_idle_ttl = 0.0  # everything is now "idle"
        sid2 = service.stream_start()  # start prunes stale sessions
        assert sid not in service._streams
        service.stream_idle_ttl = 600.0
        service.max_streams = 1
        with pytest.raises(ValueError, match="too many open streams"):
            service.stream_start()
    finally:
        service.stream_idle_ttl, service.max_streams = ttl, cap
        service._streams.clear()
        service._stream_last_used.clear()


def test_b64_transport_unit_roundtrip():
    """encode/decode helpers: exact f32 round-trip + loud error paths."""
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    y = serve.decode_f32_b64(serve.encode_f32_b64(x))
    assert y.dtype == np.float32
    np.testing.assert_array_equal(x, y)
    with pytest.raises(ValueError, match="base64"):
        serve.decode_f32_b64("not/valid base64!!")
    import base64 as _b64
    with pytest.raises(ValueError, match="multiple of 4"):
        serve.decode_f32_b64(_b64.b64encode(b"abcde").decode())


def test_b64_audio_matches_list_audio(server, service):
    """The SAME audio via 'audio_b64' and via a JSON float list must give
    bit-identical frames (fixed-seed stream sessions isolate the rng)."""
    audio = (0.2 * np.sin(np.arange(int(4.0 * C.AUDIO_SR)) / 35)
             ).astype(np.float32)
    words = [["hello", 0.2, 0.7]]

    def run(body_key, value, binary):
        _, data = _request(server, "POST", "/stream/start",
                           {"vid_idx": 1, "seed": 123})
        sid = data["stream_id"]
        status, _ = _request(server, "POST", "/stream/feed", {
            "stream_id": sid, body_key: value, "words": words,
        })
        assert status == 200
        status, data = _request(server, "POST", "/stream/flush",
                                {"stream_id": sid, "binary": binary})
        assert status == 200
        if binary:
            out = serve.decode_f32_b64(data["dir_vec_b64"]).reshape(
                data["dir_vec_shape"])
            assert data["frames"] == data["dir_vec_shape"][0]
        else:
            out = np.asarray(data["dir_vec"], np.float32)
        return out

    via_list = run("audio", audio.tolist(), binary=False)
    via_b64 = run("audio_b64", serve.encode_f32_b64(audio), binary=True)
    assert via_list.shape == via_b64.shape and via_list.shape[1] == C.POSE_DIM
    np.testing.assert_array_equal(via_list, via_b64)


def test_b64_synthesize_and_batch(server):
    """'audio_b64' + 'binary' on /synthesize and /synthesize_batch: right
    shapes, finite values, and the binary payload decodes consistently."""
    audio = (0.1 * np.sin(np.arange(int(4.0 * C.AUDIO_SR)) / 25)
             ).astype(np.float32)
    b64 = serve.encode_f32_b64(audio)
    status, data = _request(server, "POST", "/synthesize", {
        "audio_b64": b64, "words": [["world", 0.5, 1.0]], "binary": True,
    })
    assert status == 200 and "dir_vec" not in data
    dv = serve.decode_f32_b64(data["dir_vec_b64"]).reshape(
        data["dir_vec_shape"])
    ps = serve.decode_f32_b64(data["poses_b64"]).reshape(data["poses_shape"])
    assert dv.shape[1] == C.POSE_DIM and data["frames"] == len(dv)
    assert ps.shape == (len(dv), C.NUM_JOINTS, 3)
    assert np.isfinite(dv).all() and np.isfinite(ps).all()

    status, data = _request(server, "POST", "/synthesize_batch", {
        "binary": True,
        "requests": [{"audio_b64": b64, "words": [["hello", 0.2, 0.6]]},
                     {"audio": None, "words": [["x", 0.2, 0.6]]}],
    })
    assert status == 200
    for r in data["results"]:
        out = serve.decode_f32_b64(r["dir_vec_b64"]).reshape(
            r["dir_vec_shape"])
        assert out.shape[1] == C.POSE_DIM and np.isfinite(out).all()

    # corrupt b64 surfaces as a 400, not a 500
    status, data = _request(server, "POST", "/synthesize", {
        "audio_b64": "!!!", "words": [],
    })
    assert status == 400


def test_bf16_precision_service():
    """precision='bf16' synthesis: deterministic, f32 outputs, and close
    to the f32 program on a CONTRACTIVE model.

    The weights are scaled 0.3x: at raw random init the GRU recurrence is
    expansive (per-step gain > 1), so bf16 rounding grows exponentially
    over the 34-step window — measured 63% relative deviation on this tiny
    model, ~5% once contractive. That conditioning is why bf16 serving is
    opt-in and why tools/bench_serve_precision.py reports the deviation
    for the ACTUAL model being served (trained GRUs saturate their gates
    and behave like the contractive case)."""
    from speech2affective_gestures_tpu.train import synthesis

    gen = PoseGenerator(
        n_words=30, n_speakers=5, hidden_size=32, n_layers=2,
        mfcc_length=CFG.mfcc_length, num_mfcc=CFG.num_mfcc_combined,
    )
    pre = jnp.zeros((1, CFG.n_poses, C.POSE_DIM + 1))
    variables = gen.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        pre, jnp.zeros((1, CFG.n_poses), jnp.int32),
        jnp.zeros((1, CFG.num_mfcc_combined, CFG.mfcc_length)),
        jnp.zeros((1,), jnp.int32),
    )
    variables = dict(variables)
    variables["params"] = jax.tree.map(
        lambda x: x * 0.3 if x.dtype == jnp.float32 else x,
        variables["params"],
    )
    lang = Vocab("w")
    lang.index_word("hello")
    audio = (0.2 * np.sin(np.arange(int(4.0 * C.AUDIO_SR)) / 30)
             ).astype(np.float32)
    words = [["hello", 0.2, 0.7]]
    outs = {}
    for prec in ("f32", "bf16"):
        fn = synthesis.make_fused_clip_fn(gen.apply, CFG, precision=prec)
        dv, ps = synthesis.synthesize_clip_fused(
            fn, variables, audio, words, lang, CFG, vid_idx=1,
            rng=jax.random.key(9),
        )
        assert dv.dtype == np.float32  # outputs come back f32 either way
        assert np.isfinite(dv).all() and np.isfinite(ps).all()
        outs[prec] = dv
        if prec == "bf16":  # same request twice -> identical bytes
            dv2, _ = synthesis.synthesize_clip_fused(
                fn, variables, audio, words, lang, CFG, vid_idx=1,
                rng=jax.random.key(9),
            )
            np.testing.assert_array_equal(dv, dv2)
    assert outs["f32"].shape == outs["bf16"].shape
    dev = np.abs(outs["f32"] - outs["bf16"]).max()
    scale = max(np.abs(outs["f32"]).max(), 1e-3)
    assert dev / scale < 0.15, (dev, scale)  # measured ~0.05; 3x margin

    with pytest.raises(ValueError, match="unknown precision"):
        synthesis.precision_wrap(gen.apply, "fp8")


def test_auto_batching_coalesces_concurrent_requests(service):
    """auto_batch_ms: N concurrent /synthesize calls run as ONE batched
    device program; results keep per-request shapes; a lone request still
    completes (timer flush); errors fan out to every member."""
    from concurrent.futures import ThreadPoolExecutor

    ttl = service.auto_batch_ms
    service.auto_batch_ms = 80.0
    service.reset_metrics()
    try:
        audio4 = np.zeros(int(4.0 * C.AUDIO_SR), np.float32)
        audio6 = np.zeros(int(6.0 * C.AUDIO_SR), np.float32)
        words = [["hello", 0.2, 0.6]]

        def one(i):
            return service.synthesize_auto(
                audio6 if i == 2 else audio4, words, vid_idx=i,
                fade_out=(i == 1),
            )
        with ThreadPoolExecutor(4) as ex:
            results = list(ex.map(one, range(4)))
        for i, r in enumerate(results):
            out = np.asarray(r["dir_vec"])
            assert out.shape[1] == C.POSE_DIM and np.isfinite(out).all()
            assert r["frames"] == len(out)
        assert len(results[2]["dir_vec"]) > len(results[0]["dir_vec"])
        # fade_out lane ends (near) the mean pose — the polyfit seam
        # smoothing can leave O(1e-3) residue on short clips where the
        # smoothed region reaches the final frame
        assert np.abs(np.asarray(results[1]["dir_vec"])[-1]).max() < 5e-3
        m = service.metrics()
        assert m["synthesize_batch"]["clips"] == 4
        assert m["synthesize_batch"]["requests"] < 4  # actually coalesced
        assert "synthesize" not in m  # nothing took the per-clip path

        # lone request: the timer drains it without companions
        r = service.synthesize_auto(audio4, words, vid_idx=1)
        assert np.isfinite(np.asarray(r["dir_vec"])).all()

        # a poisoned member fails every request in its group, loudly
        def bad(i):
            if i == 0:
                return service.synthesize_auto(audio4, "not words", 0)
            return service.synthesize_auto(audio4, words, vid_idx=i)
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(bad, i) for i in range(2)]
            errs = 0
            for f in futs:
                try:
                    f.result()
                except Exception:
                    errs += 1
        assert errs >= 1  # at least the poisoned one; group failure ok
    finally:
        service.auto_batch_ms = ttl
        service.reset_metrics()


def test_auto_batch_off_uses_per_clip_path(service):
    """auto_batch_ms == 0 (default): synthesize_auto IS synthesize."""
    assert service.auto_batch_ms == 0.0
    service.reset_metrics()
    audio = np.zeros(int(4.0 * C.AUDIO_SR), np.float32)
    r = service.synthesize_auto(audio, [["hello", 0.2, 0.6]])
    assert np.isfinite(np.asarray(r["dir_vec"])).all()
    m = service.metrics()
    assert m["synthesize"]["requests"] == 1
    assert "synthesize_batch" not in m
    service.reset_metrics()
