"""ops/backend.py — the single TPU-detection helper (round-3 verdict #2:
dsp.py accepted ("tpu", "axon") while layers._gru_engine matched only
"tpu", so an axon-reporting platform would silently lose the Pallas GRU)."""

from unittest import mock

import jax

from speech2affective_gestures_tpu.models import layers
from speech2affective_gestures_tpu.ops import backend


def test_cpu_is_not_tpu():
    assert backend.backend_name() == jax.default_backend()
    # tests run on the CPU backend (conftest)
    assert backend.is_tpu() is False


def test_axon_platform_counts_as_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    assert backend.is_tpu() is True
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert backend.is_tpu() is True


def test_gru_engine_defaults_to_pallas_on_axon(monkeypatch):
    """The engine selector must agree with the shared helper: platform
    'axon' => pallas default, same as 'tpu'."""
    monkeypatch.delenv("S2AG_GRU_ENGINE", raising=False)
    with mock.patch.object(jax, "default_backend", lambda: "axon"):
        assert layers._gru_engine() == "pallas"
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        assert layers._gru_engine() == "scan"


def test_dsp_fast_path_uses_shared_helper(monkeypatch):
    """get_mfcc_features_fast consults backend.is_tpu — on CPU it must take
    the XLA path (no pltpu import)."""
    from speech2affective_gestures_tpu.ops import dsp

    called = {}
    monkeypatch.setattr(dsp.backend, "is_tpu", lambda: (called.setdefault("x", True), False)[1])
    import numpy as np

    out = dsp.get_mfcc_features_fast(jax.numpy.asarray(
        np.random.default_rng(0).standard_normal(4096, dtype=np.float32)))
    assert called.get("x") is True
    assert out.shape[-2] == 3 * 14 - 5
