"""Layer-level numerical parity vs torch (CPU) with converted weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from speech2affective_gestures_tpu.convert import torch_ckpt as ck
from speech2affective_gestures_tpu.models import layers as L

torch.manual_seed(0)

HI = jax.default_matmul_precision("highest")


def _np(t):
    return t.detach().numpy()


def test_linear_parity(rng):
    tmod = tnn.Linear(20, 7)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))
    params = {"params": ck.linear(_np(tmod.weight), _np(tmod.bias))}
    with HI:
        got = L.Linear(7).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,pad,dil", [(1, 0, 1), (2, 3, 1), (5, 1600, 1), (1, 2, 2)])
def test_conv1d_parity(rng, stride, pad, dil):
    tmod = tnn.Conv1d(3, 8, 15, stride=stride, padding=pad, dilation=dil)
    x = rng.standard_normal((2, 3, 120)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))  # (B, Cout, T')
    params = {"params": ck.conv1d(_np(tmod.weight), _np(tmod.bias))}
    mod = L.Conv1d(8, 15, stride=stride, padding=pad, dilation=dil)
    with HI:
        got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 1)))  # NWC
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("stride,pad", [(1, 0), (2, 0), (2, 1), (1, 2)])
def test_conv_transpose1d_parity(rng, stride, pad):
    tmod = tnn.ConvTranspose1d(6, 4, 3, stride=stride, padding=pad)
    x = rng.standard_normal((2, 6, 30)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))
    params = {"params": ck.conv_transpose1d(_np(tmod.weight), _np(tmod.bias))}
    mod = L.ConvTranspose1d(4, 3, stride=stride, padding=pad)
    with HI:
        got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-4
    )


def test_conv2d_parity(rng):
    tmod = tnn.Conv2d(3, 10, (9, 1), stride=(1, 1), padding=(4, 0))
    x = rng.standard_normal((2, 3, 34, 9)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))
    params = {"params": ck.conv2d(_np(tmod.weight), _np(tmod.bias))}
    mod = L.Conv2d(10, (9, 1), stride=(1, 1), padding=(4, 0))
    with HI:
        got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


def test_conv_transpose2d_parity(rng):
    tmod = tnn.ConvTranspose2d(5, 3, (9, 3), stride=(1, 1), padding=(4, 1))
    x = rng.standard_normal((2, 5, 34, 3)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))
    params = {"params": ck.conv_transpose2d(_np(tmod.weight), _np(tmod.bias))}
    mod = L.ConvTranspose2d(3, (9, 3), stride=(1, 1), padding=(4, 1))
    with HI:
        got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


def test_wn_conv1d_parity(rng):
    base = tnn.Conv1d(4, 6, 2, padding=1, dilation=1)
    base.weight.data.normal_(0, 0.01)
    tmod = tnn.utils.weight_norm(base)
    x = rng.standard_normal((2, 4, 20)).astype(np.float32)
    want = _np(tmod(torch.from_numpy(x)))
    params = {
        "params": ck.wn_conv1d(
            _np(tmod.weight_v), _np(tmod.weight_g), _np(tmod.bias)
        )
    }
    mod = L.WNConv1d(6, 2, padding=1)
    with HI:
        got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, rtol=1e-4, atol=1e-4
    )


def test_batchnorm_train_and_eval_parity(rng):
    tmod = tnn.BatchNorm1d(16)
    x1 = rng.standard_normal((8, 16)).astype(np.float32)
    x2 = rng.standard_normal((8, 16)).astype(np.float32)

    # two train-mode steps then one eval step in torch
    tmod.train()
    want_train1 = _np(tmod(torch.from_numpy(x1)))
    want_train2 = _np(tmod(torch.from_numpy(x2)))
    tmod.eval()
    want_eval = _np(tmod(torch.from_numpy(x1)))

    mod = L.BatchNorm(16)
    p, s = ck.batch_norm(
        np.ones(16, np.float32), np.zeros(16, np.float32),
        np.zeros(16, np.float32), np.ones(16, np.float32),
    )
    variables = {"params": p, "batch_stats": s}
    with HI:
        got1, mut = mod.apply(
            variables, jnp.asarray(x1), use_running_average=False,
            mutable=["batch_stats"],
        )
        variables = {"params": p, **mut}
        got2, mut = mod.apply(
            variables, jnp.asarray(x2), use_running_average=False,
            mutable=["batch_stats"],
        )
        variables = {"params": p, **mut}
        got_eval = mod.apply(variables, jnp.asarray(x1), use_running_average=True)

    np.testing.assert_allclose(np.asarray(got1), want_train1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), want_train2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), _np(tmod.running_mean),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), _np(tmod.running_var),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(got_eval), want_eval, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layers,bidir", [(1, False), (2, True), (4, True)])
def test_gru_parity(rng, layers, bidir):
    tmod = tnn.GRU(12, 16, num_layers=layers, batch_first=True,
                   bidirectional=bidir, dropout=0.0)
    x = rng.standard_normal((3, 10, 12)).astype(np.float32)
    want, want_h = tmod(torch.from_numpy(x))
    state = {k: _np(v) for k, v in tmod.state_dict().items()}
    params = {"params": ck.gru(state, "", layers, bidir)}
    mod = L.GRU(16, num_layers=layers, bidirectional=bidir)
    with HI:
        got, got_h = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _np(want), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_h), _np(want_h), rtol=1e-4, atol=1e-4)


def test_embed_freeze_blocks_gradient():
    table = np.arange(12, dtype=np.float32).reshape(4, 3)
    mod = L.Embed(4, 3, pretrained=table, freeze=True)
    variables = mod.init(jax.random.key(0), jnp.zeros((2,), jnp.int32))

    def loss(v):
        return jnp.sum(mod.apply(v, jnp.array([1, 2])))

    g = jax.grad(loss)(variables)
    assert np.all(np.asarray(g["params"]["embedding"]) == 0.0)


def test_leaky_relu_slopes():
    x = jnp.array([-2.0, 3.0])
    np.testing.assert_allclose(np.asarray(L.leaky_relu(x, 1.0)), [-2.0, 3.0])
    np.testing.assert_allclose(np.asarray(L.leaky_relu(x, 0.3)), [-0.6, 3.0])
    np.testing.assert_allclose(np.asarray(L.leaky_relu(x, 0.01)), [-0.02, 3.0])
