"""Parity tests for conv primitives vs torch."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.nn.conv import (
    Conv1d,
    ConvTranspose1d,
    WNConv1d,
    WNConvTranspose1d,
    Conv2d,
    conv1d_op,
)
from megatts2_hierspeechpp_tpu.utils import torch_compat as tc


def _init(mod, x):
    return mod.init(jax.random.PRNGKey(0), x)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,groups",
    [
        (8, 16, 5, 1, 2, 1, 1),
        (16, 16, 3, 1, 3, 3, 1),
        (8, 24, 10, 5, 4, 1, 1),
        (12, 12, 31, 1, 15, 1, 12),  # depthwise
    ],
)
def test_conv1d_matches_torch(cin, cout, k, stride, pad, dil, groups):
    torch.manual_seed(0)
    tmod = torch.nn.Conv1d(cin, cout, k, stride, padding=pad, dilation=dil, groups=groups)
    x = np.random.default_rng(0).standard_normal((2, 37, cin)).astype(np.float32)

    with torch.no_grad():
        yt = tmod(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    jmod = Conv1d(cout, k, stride, pad, dil, groups)
    params = {
        "params": {
            "kernel": tc.conv1d_kernel(tc.to_np(tmod.weight)),
            "bias": tc.to_np(tmod.bias),
        }
    }
    yj = jmod.apply(params, jnp.asarray(x))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [(16, 8, 4, 2, 1), (8, 4, 16, 8, 4), (6, 3, 3, 1, 1)],
)
def test_conv_transpose1d_matches_torch(cin, cout, k, stride, pad):
    torch.manual_seed(1)
    tmod = torch.nn.ConvTranspose1d(cin, cout, k, stride, padding=pad)
    x = np.random.default_rng(1).standard_normal((2, 25, cin)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    jmod = ConvTranspose1d(cout, k, stride, pad)
    params = {
        "params": {
            "kernel": tc.conv_transpose1d_kernel(tc.to_np(tmod.weight)),
            "bias": tc.to_np(tmod.bias),
        }
    }
    yj = jmod.apply(params, jnp.asarray(x))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


def test_wn_conv1d_matches_torch():
    torch.manual_seed(2)
    tmod = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 16, 5, padding=2))
    x = np.random.default_rng(2).standard_normal((2, 31, 8)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    jmod = WNConv1d(16, 5, padding=2)
    wn = tc.wn_conv1d(tc.to_np(tmod.weight_g), tc.to_np(tmod.weight_v))
    params = {"params": {**wn, "bias": tc.to_np(tmod.bias)}}
    yj = jmod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


def test_wn_conv_transpose1d_matches_torch():
    torch.manual_seed(3)
    tmod = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(16, 8, 4, 2, padding=1))
    x = np.random.default_rng(3).standard_normal((2, 19, 16)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()

    jmod = WNConvTranspose1d(8, 4, 2, padding=1)
    wn = tc.wn_conv_transpose1d(tc.to_np(tmod.weight_g), tc.to_np(tmod.weight_v))
    params = {"params": {**wn, "bias": tc.to_np(tmod.bias)}}
    yj = jmod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


def test_conv2d_matches_torch():
    torch.manual_seed(4)
    tmod = torch.nn.Conv2d(2, 6, (3, 9), stride=(1, 2), padding=(1, 4), dilation=(2, 1))
    x = np.random.default_rng(4).standard_normal((2, 2, 17, 33)).astype(np.float32)
    with torch.no_grad():
        yt = tmod(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    jmod = Conv2d(6, (3, 9), (1, 2), (1, 4), (2, 1))
    params = {
        "params": {
            "kernel": tc.conv2d_kernel(tc.to_np(tmod.weight)),
            "bias": tc.to_np(tmod.bias),
        }
    }
    # channels-last input
    yj = jmod.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5, rtol=1e-5)


def test_wn_init_self_consistent():
    """Fresh WN init must equal the direction*g = v identity (g = ||v||)."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 16, 8)), jnp.float32)
    jmod = WNConv1d(4, 3, padding=1)
    params = _init(jmod, x)
    v = params["params"]["v"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt(np.sum(np.square(np.asarray(v)), axis=(0, 1))), rtol=1e-6
    )
