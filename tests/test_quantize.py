"""RVQ parity vs reference EnCodec-style quantizer."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import torch_ref
from megatts2_hierspeechpp_tpu.nn.quantize import ResidualVectorQuantizer

torch_ref.add_reference_path()


def _ref_rvq(bins=32, dim=8, n_q=1):
    from ttv_v1.quantize import ResidualVectorQuantizer as RefRVQ

    torch.manual_seed(0)
    return RefRVQ(dimension=dim, n_q=n_q, bins=bins)


def _sync_state(tmod, jparams_vq):
    """Copy the torch codebook buffers into the flax 'vq' collection."""
    out = {}
    for i, layer in enumerate(tmod.vq.layers):
        cb = layer._codebook
        out[f"vq_{i}"] = {
            "codebook": {
                "embed": cb.embed.detach().numpy().copy(),
                "embed_avg": cb.embed_avg.detach().numpy().copy(),
                "cluster_size": cb.cluster_size.detach().numpy().copy(),
                "inited": np.array(True),
            }
        }
    return out


def test_rvq_encode_decode_parity():
    tmod = _ref_rvq()
    with torch.no_grad():
        tmod.vq.layers[0]._codebook.embed.normal_()
        tmod.vq.layers[0]._codebook.inited.fill_(1)
    jmod = ResidualVectorQuantizer(dimension=8, n_q=1, bins=32)
    x = np.random.default_rng(0).standard_normal((2, 11, 8)).astype(np.float32)

    vq_state = _sync_state(tmod, None)
    variables = {"vq": vq_state}

    with torch.no_grad():
        codes_t = tmod.encode(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        dec_t = tmod.decode(torch.from_numpy(codes_t)).transpose(1, 2).numpy()

    codes_j = np.asarray(
        jmod.apply(variables, jnp.asarray(x), method=ResidualVectorQuantizer.encode)
    )
    np.testing.assert_array_equal(codes_j, codes_t)
    dec_j = np.asarray(
        jmod.apply(variables, jnp.asarray(codes_j), method=ResidualVectorQuantizer.decode)
    )
    np.testing.assert_allclose(dec_j, dec_t, atol=1e-6)


def test_rvq_ema_update_parity():
    """One training step: EMA stats must match the reference exactly when no
    dead codes expire."""
    tmod = _ref_rvq()
    cb = tmod.vq.layers[0]._codebook
    with torch.no_grad():
        cb.embed.normal_()
        cb.embed_avg.copy_(cb.embed)
        cb.cluster_size.fill_(10.0)  # all alive -> no expiry path
        cb.inited.fill_(1)
    tmod.train()

    jmod = ResidualVectorQuantizer(dimension=8, n_q=1, bins=32)
    x = np.random.default_rng(1).standard_normal((2, 13, 8)).astype(np.float32)
    variables = {"vq": _sync_state(tmod, None)}

    q_t, codes_t, loss_t, _ = tmod(torch.from_numpy(x.transpose(0, 2, 1)), layers=[0])
    q_t = q_t.detach().transpose(1, 2).numpy()

    (q_j, codes_j, loss_j), mutated = jmod.apply(
        variables, jnp.asarray(x), train=True, rng=None, mutable=["vq"]
    )
    np.testing.assert_array_equal(np.asarray(codes_j)[0], codes_t.numpy()[0])
    np.testing.assert_allclose(np.asarray(q_j), q_t, atol=1e-5)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-5)

    cb_after = tmod.vq.layers[0]._codebook
    new = mutated["vq"]["vq_0"]["codebook"]
    np.testing.assert_allclose(
        np.asarray(new["cluster_size"]), cb_after.cluster_size.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new["embed_avg"]), cb_after.embed_avg.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new["embed"]), cb_after.embed.numpy(), atol=1e-5
    )


def test_kmeans_init_clusters():
    from megatts2_hierspeechpp_tpu.ops.kmeans import init_rvq_state

    rng = np.random.default_rng(2)
    centers = rng.standard_normal((4, 8)) * 5
    samples = np.concatenate(
        [centers[i] + 0.05 * rng.standard_normal((50, 8)) for i in range(4)]
    )
    jmod = ResidualVectorQuantizer(dimension=8, n_q=1, bins=4)
    variables = jmod.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 4, 8)))
    new_vq = init_rvq_state(variables["vq"], samples)
    emb = new_vq["vq_0"]["codebook"]["embed"]
    # every true center has a nearby centroid
    d = np.min(((emb[None] - centers[:, None]) ** 2).sum(-1), axis=1)
    assert (d < 0.5).all()
