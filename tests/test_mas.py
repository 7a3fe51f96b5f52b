"""MAS tests: JAX scan and native C++ kernel vs a brute-force numpy DP."""
import numpy as np
import pytest

import jax.numpy as jnp

from megatts2_hierspeechpp_tpu.ops.monotonic_align import maximum_path as mas_jax


def brute_force_best_score(value: np.ndarray, t_y: int, t_x: int) -> float:
    """Max-total-score monotonic path from (0, 0) to (t_y-1, t_x-1)."""
    NEG = -1e9
    dp = np.full((t_y, t_x), NEG)
    dp[0, 0] = value[0, 0]
    for y in range(1, t_y):
        for x in range(min(y + 1, t_x)):
            best = dp[y - 1, x]
            if x > 0:
                best = max(best, dp[y - 1, x - 1])
            if best > NEG / 2:
                dp[y, x] = best + value[y, x]
    return dp[t_y - 1, t_x - 1]


def _path_valid(path, t_y, t_x):
    p = path[:t_y, :t_x]
    assert (p.sum(axis=1) == 1).all()  # one phoneme per frame
    xs = p.argmax(axis=1)
    assert xs[0] == 0 and xs[-1] == t_x - 1
    d = np.diff(xs)
    assert ((d == 0) | (d == 1)).all()
    return xs


def test_jax_mas_matches_bruteforce_score():
    rng = np.random.default_rng(0)
    b, t_y, t_x = 3, 14, 6
    value = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    t_ys = np.array([14, 11, 9], np.int32)
    t_xs = np.array([6, 4, 3], np.int32)

    path = np.asarray(mas_jax(jnp.asarray(value), jnp.asarray(t_ys), jnp.asarray(t_xs)))
    for i in range(b):
        xs = _path_valid(path[i], t_ys[i], t_xs[i])
        score = value[i][np.arange(t_ys[i]), xs].sum()
        ref = brute_force_best_score(value[i], t_ys[i], t_xs[i])
        np.testing.assert_allclose(score, ref, rtol=1e-5)
        # nothing outside the valid region
        assert path[i, t_ys[i]:, :].sum() == 0
        assert path[i, :, t_xs[i]:].sum() == 0


def test_native_mas_matches_bruteforce_score():
    from megatts2_hierspeechpp_tpu.ops.mas_native import maximum_path as mas_cpp

    rng = np.random.default_rng(1)
    b, t_y, t_x = 4, 20, 7
    value = rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    t_ys = np.array([20, 16, 12, 8], np.int32)
    t_xs = np.array([7, 5, 4, 2], np.int32)

    path = mas_cpp(value, t_ys, t_xs)
    for i in range(b):
        xs = _path_valid(path[i], t_ys[i], t_xs[i])
        score = value[i][np.arange(t_ys[i]), xs].sum()
        ref = brute_force_best_score(value[i], t_ys[i], t_xs[i])
        np.testing.assert_allclose(score, ref, rtol=1e-5)


def test_jax_and_native_agree_on_durations():
    from megatts2_hierspeechpp_tpu.ops.mas_native import maximum_path as mas_cpp

    rng = np.random.default_rng(2)
    b, t_y, t_x = 2, 30, 8
    # peaked values -> unique optimum
    centers = np.linspace(0, t_x - 1, t_y)
    value = -((np.arange(t_x)[None, :] - centers[:, None]) ** 2).astype(np.float32)
    value = np.tile(value[None], (b, 1, 1)) + 0.01 * rng.standard_normal((b, t_y, t_x)).astype(np.float32)
    t_ys = np.array([30, 24], np.int32)
    t_xs = np.array([8, 6], np.int32)

    p_jax = np.asarray(mas_jax(jnp.asarray(value), jnp.asarray(t_ys), jnp.asarray(t_xs)))
    p_cpp = mas_cpp(value, t_ys, t_xs)
    for i in range(b):
        d_jax = p_jax[i, : t_ys[i], : t_xs[i]].sum(axis=0)
        d_cpp = p_cpp[i, : t_ys[i], : t_xs[i]].sum(axis=0)
        np.testing.assert_array_equal(d_jax, d_cpp)
