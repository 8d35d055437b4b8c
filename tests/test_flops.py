"""Tests for the analytic FLOP counter (train/flops.py) and its use as the
bench MFU numerator — the round-3 verdict's top item: BENCH_r03 regressed
to mfu:null because XLA's Lowered.cost_analysis() started returning None
and a blanket `except` swallowed it. The analytic counter can't go null,
and these tests pin its counting convention on control programs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech2affective_gestures_tpu.train import flops


def _struct(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


class TestControlPrograms:
    def test_matmul_exact(self):
        # (M,K)@(K,N): 2*M*N*K flops
        f = flops.fn_flops(lambda a, b: a @ b, _struct((64, 128)), _struct((128, 32)))
        assert f == 2 * 64 * 32 * 128

    def test_batched_dot_general(self):
        # (B,M,K)@(B,K,N) via einsum: 2*B*M*N*K
        f = flops.fn_flops(
            lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b),
            _struct((4, 8, 16)), _struct((4, 16, 32)),
        )
        assert f == 2 * 4 * 8 * 32 * 16

    def test_conv1d(self):
        # NCW conv: out (B, Co, Wo); MACs/out = K*Ci
        from jax import lax

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1,), "VALID",
                dimension_numbers=("NCH", "OIH", "NCH"))

        b, ci, wi, co, k = 2, 3, 20, 5, 4
        wo = wi - k + 1
        f = flops.fn_flops(conv, _struct((b, ci, wi)), _struct((co, ci, k)))
        assert f == 2 * b * co * wo * k * ci

    def test_grouped_conv_counts_per_group_channels(self):
        from jax import lax

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1,), "VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=2)

        b, ci, wi, co, k = 2, 8, 10, 8, 3
        wo = wi - k + 1
        # kernel shape (co, ci/groups, k): MACs/out = k*ci/2
        f = flops.fn_flops(conv, _struct((b, ci, wi)), _struct((co, ci // 2, k)))
        assert f == 2 * b * co * wo * k * (ci // 2)

    def test_scan_multiplies_by_length(self):
        def scanned(xs, w):
            def body(c, x):
                return c, x @ w
            return jax.lax.scan(body, 0.0, xs)[1]

        t, m, k, n = 7, 4, 8, 16
        f = flops.fn_flops(scanned, _struct((t, m, k)), _struct((k, n)))
        assert f == t * 2 * m * n * k

    def test_elementwise_counted_once_per_element(self):
        f = flops.fn_flops(lambda a, b: a + b, _struct((10, 10)), _struct((10, 10)))
        assert f == 100

    def test_grad_counts_backward_work(self):
        # value_and_grad of x@w wrt w adds the transpose dot: >= 2x forward
        def loss(w, x):
            return jnp.sum(x @ w)

        fwd = flops.fn_flops(loss, _struct((16, 8)), _struct((4, 16)))
        both = flops.fn_flops(
            lambda w, x: jax.value_and_grad(loss)(w, x),
            _struct((16, 8)), _struct((4, 16)),
        )
        assert both >= 2 * (2 * 4 * 8 * 16)
        assert fwd >= 2 * 4 * 8 * 16

    def test_jit_recursed_into(self):
        f = flops.fn_flops(jax.jit(lambda a, b: a @ b),
                           _struct((4, 4)), _struct((4, 4)))
        assert f == 2 * 4 * 4 * 4

    def test_cond_takes_max_branch(self):
        def f(pred, a, b):
            return jax.lax.cond(pred, lambda: a @ b, lambda: a[:, :1] @ b[:1])

        got = flops.fn_flops(f, _struct((), jnp.bool_),
                             _struct((8, 8)), _struct((8, 8)))
        assert got == 2 * 8 * 8 * 8  # the bigger branch


class TestCanonicalStep:
    @pytest.mark.slow
    def test_full_step_count_properties(self):
        from speech2affective_gestures_tpu.config import ModelConfig

        cfg = ModelConfig()
        f128 = flops.canonical_train_step_flops(cfg, 128)
        # never null, positive, and in the physically sane range for this
        # model (~3.3 GFLOP/sample: 3 G fwds incl. 2 with backward, 3 D
        # fwds, T=34 recurrence, hidden 300)
        assert f128 is not None and 100e9 < f128 < 2000e9
        # linear in batch size (tolerate batch-independent residue <1%)
        f256 = flops.canonical_train_step_flops(cfg, 256)
        assert abs(f256 / f128 - 2.0) < 0.02

    @pytest.mark.slow
    def test_dot_conv_dominates(self):
        """The approximate elementwise accounting must be a small correction
        on the exact dot/conv math — otherwise the MFU numerator would
        depend on the elementwise convention."""
        import os
        from functools import partial

        from speech2affective_gestures_tpu.config import ModelConfig
        from speech2affective_gestures_tpu.train import builder

        cfg = ModelConfig()
        prev = os.environ.get("S2AG_GRU_ENGINE")
        os.environ["S2AG_GRU_ENGINE"] = "scan"
        try:
            setup = builder.init_training(
                cfg, jax.random.key(0), n_words=1000, n_speakers=100,
                abstract=True,
            )
            batch = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                builder.synthetic_batch(np.random.default_rng(0), 64, cfg,
                                        1000, 100),
            )
            jaxpr = jax.make_jaxpr(partial(setup["train_step"], gan_on=True))(
                setup["state"], batch, jax.random.key(0)
            )
        finally:
            if prev is None:
                os.environ.pop("S2AG_GRU_ENGINE", None)
            else:
                os.environ["S2AG_GRU_ENGINE"] = prev
        total = flops.count_jaxpr_flops(jaxpr)
        dc = flops.dot_conv_flops_only(jaxpr)
        assert dc / total > 0.9

    def test_abstract_init_creates_no_buffers(self):
        """abstract=True must return ShapeDtypeStructs (pure eval_shape),
        so the flops path costs no compile/device work."""
        from speech2affective_gestures_tpu.config import ModelConfig
        from speech2affective_gestures_tpu.train import builder

        cfg = ModelConfig()
        setup = builder.init_training(
            cfg, jax.random.key(0), n_words=50, n_speakers=7, abstract=True
        )
        leaves = jax.tree.leaves(setup["state"])
        assert leaves, "abstract state is empty"
        assert all(isinstance(l, jax.ShapeDtypeStruct) for l in leaves)


def _load_bench():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


class TestBenchIntegration:
    def test_xla_cost_flops_raises_with_cause(self):
        """bench.xla_cost_flops must raise carrying the failure cause so
        run_stage records it loudly in payload["stages"] — never a silent
        null (the BENCH_r03 mfu:null regression)."""
        bench = _load_bench()

        class NoneCost:
            def lower(self, *a, **k):
                class L:
                    def compile(self):
                        class C:
                            def cost_analysis(self):
                                return None
                        return C()
                return L()

        with pytest.raises(RuntimeError, match="returned None"):
            bench.xla_cost_flops(NoneCost(), None, None, None)

        class NoFlopsKey:
            def lower(self, *a, **k):
                class L:
                    def compile(self):
                        class C:
                            def cost_analysis(self):
                                return {"bytes accessed": 1.0}
                        return C()
                return L()

        with pytest.raises(RuntimeError, match="no positive 'flops'"):
            bench.xla_cost_flops(NoFlopsKey(), None, None, None)

    def test_supervisor_prints_latest_payload_when_worker_hangs(self, capfd):
        """The r4 timeout regression, pinned end-to-end: a worker that emits
        a headline payload then blocks forever must still yield rc 0 and
        EXACTLY ONE JSON line (the latest payload, stamped with the
        supervisor-kill note) within the budget."""
        import json
        import sys

        bench = _load_bench()
        fake_worker = (
            "import json,sys,time;"
            "print(json.dumps({'metric':'m','value':1.0,'unit':'u',"
            "'vs_baseline':1.0,'stages':{'headline':'ok'}}),flush=True);"
            "time.sleep(600)"
        )
        rc = bench.supervise([sys.executable, "-c", fake_worker],
                             budget_s=8.0, grace_s=0.5)
        assert rc == 0
        out = capfd.readouterr().out
        lines = [ln for ln in out.splitlines() if ln.strip()]
        assert len(lines) == 1
        payload = json.loads(lines[0])
        assert payload["metric"] == "m" and payload["value"] == 1.0
        assert "_supervisor" in payload["stages"]

    def test_supervisor_fails_loudly_on_no_payload(self, capfd):
        """A worker that dies before any payload must produce rc != 0 and no
        stdout JSON (the driver's parsed:null then points at stderr)."""
        import sys

        bench = _load_bench()
        rc = bench.supervise(
            [sys.executable, "-c", "import sys; sys.exit(3)"],
            budget_s=5.0, grace_s=0.5)
        assert rc == 1
        out, err = capfd.readouterr()
        assert not out.strip()
        assert "no payload" in err
