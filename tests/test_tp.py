"""PLM tensor-parallel sharding: loss/decode must be invariant under the
model-axis sharding on a 4x2 (data x model) CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from megatts2_hierspeechpp_tpu.models.plm import ProsodyLM, decode
from megatts2_hierspeechpp_tpu.parallel.mesh import make_mesh
from megatts2_hierspeechpp_tpu.parallel.tp import shard_params


@pytest.mark.slow
def test_plm_forward_and_decode_invariant_under_tp():
    mesh = make_mesh(n_data=4, n_model=2)
    plm = ProsodyLM(n_layers=2, p_dropout=0.0)
    rng = np.random.default_rng(0)
    b, t = 4, 16
    tc = jnp.asarray(rng.standard_normal((b, t, 256)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, 1024, (b, t)))
    lens = jnp.full((b,), t, jnp.int32)

    params = plm.init({"params": jax.random.PRNGKey(0)}, tc, codes, lens)["params"]

    ref = plm.apply({"params": params}, tc, codes, lens)
    ref_loss = float(ref["loss"])
    ref_codes = np.asarray(decode(params, tc, n_layers=2))

    with mesh:
        sharded = shard_params(mesh, params)
        # data inputs sharded over 'data'
        ds = NamedSharding(mesh, P("data"))
        tc_s = jax.device_put(tc, ds)
        codes_s = jax.device_put(codes, ds)
        lens_s = jax.device_put(lens, ds)

        fwd = jax.jit(lambda p, a, c, l: plm.apply({"params": p}, a, c, l)["loss"])
        loss_s = float(fwd(sharded, tc_s, codes_s, lens_s))

        dec = jax.jit(lambda p, a: decode(p, a, n_layers=2))
        codes_s_out = np.asarray(dec(sharded, tc_s))

    np.testing.assert_allclose(loss_s, ref_loss, rtol=1e-5)
    np.testing.assert_array_equal(codes_s_out, ref_codes)

    # the big matrices really are sharded over the model axis
    k = sharded["layer_0"]["ff_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
