"""Analytic FLOP counter: known-answer checks incl. the transposed-conv
dilation correction that XLA's cost_analysis over-counts."""
import numpy as np

import jax
import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.utils.flops import count_flops


def test_dot_general_flops():
    a = jnp.zeros((4, 128, 256))
    b = jnp.zeros((256, 512))
    got = count_flops(lambda x, y: x @ y, a, b)
    assert got == 2 * 4 * 128 * 512 * 256


def test_conv_flops():
    x = jnp.zeros((2, 100, 64))  # NWC
    k = jnp.zeros((5, 64, 128))  # WIO
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NWC", "WIO", "NWC"))
    fn = lambda x, k: jax.lax.conv_general_dilated(x, k, (1,), "SAME",
                                                   dimension_numbers=dn)
    got = count_flops(fn, x, k)
    assert got == 2 * (2 * 100 * 128) * 64 * 5


def test_transposed_conv_counts_nonzero_taps_only():
    x = jnp.zeros((2, 100, 64))
    k = jnp.zeros((8, 64, 32))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NWC", "WIO", "NWC"))
    fn = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1,), [(3, 3)], lhs_dilation=(4,), dimension_numbers=dn)
    got = count_flops(fn, x, k)
    out_w = (100 - 1) * 4 + 1 + 6 - 8 + 1
    naive = 2 * (2 * out_w * 32) * 64 * 8
    assert got == naive // 4  # 1/stride of taps are nonzero


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))

    def fn(w):
        def body(c, _):
            return c @ w, ()
        c, _ = jax.lax.scan(body, jnp.zeros((1, 16)), None, length=10)
        return c

    assert count_flops(fn, w) == 10 * 2 * 1 * 16 * 16
