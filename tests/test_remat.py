"""Remat modes are trajectory-preserving: bit-identical step results.

`GanConfig.remat` moves WHERE backward residuals come from (recompute vs
HBM reads) without changing a single value: forward math, RNG consumption,
BN stat updates and gradients are the same program. Unlike fused_pass
(which re-batches BN/RNG), remat must therefore match the baseline
BIT-FOR-BIT — anything less means the checkpoint wrapper changed semantics.
"""

import jax
import numpy as np
import pytest

from speech2affective_gestures_tpu.config import ModelConfig
from speech2affective_gestures_tpu.train import builder

pytestmark = pytest.mark.slow  # three full train-step compiles


def _run(mode):
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    batch = builder.synthetic_batch(np.random.default_rng(1), 4, cfg, 200, 10)
    setup = builder.init_training(cfg, jax.random.key(0), n_words=200,
                                  n_speakers=10, remat=mode)
    state, metrics = setup["train_step"](
        setup["state"], batch, jax.random.key(2), gan_on=True
    )
    out = {k: float(v) for k, v in metrics.items()}
    return out, np.asarray(state.gen_params["out2"]["kernel"]), np.asarray(
        state.dis_params["out"]["kernel"]
    )


def test_remat_modes_bit_identical():
    base_metrics, base_gw, base_dw = _run("none")
    for mode in ("full", "dots"):
        metrics, gw, dw = _run(mode)
        assert metrics == base_metrics, (mode, metrics, base_metrics)
        np.testing.assert_array_equal(gw, base_gw)
        np.testing.assert_array_equal(dw, base_dw)


def test_remat_rejects_unknown_mode():
    cfg = ModelConfig(hidden_size=32, hidden_size_s2eg=32, n_layers=2)
    with pytest.raises(ValueError, match="remat"):
        builder.init_training(cfg, jax.random.key(0), n_words=200,
                              n_speakers=10, remat="bogus")
