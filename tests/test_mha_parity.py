"""MultiHeadAttention parity vs torch.nn.MultiheadAttention through the
converter's packed in-proj mapping (the Trav Attention1Dto2D checkpoints
store torch MHA weights, reference DFormer.py:308-339)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dformer_tpu.models.trav import MultiHeadAttention
from dformer_tpu.utils.convert import _store


def test_mha_matches_torch():
    E, nh = 32, 4
    torch.manual_seed(0)
    tm = torch.nn.MultiheadAttention(E, nh, batch_first=True)
    tm.eval()

    rng = np.random.RandomState(0)
    q = rng.randn(2, 5, E).astype(np.float32)
    kv = rng.randn(2, 9, E).astype(np.float32)
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(q), torch.from_numpy(kv),
                     torch.from_numpy(kv))

    mha = MultiHeadAttention(E, nh)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q),
                         jnp.asarray(kv), jnp.asarray(kv))
    params = jax.device_get(variables["params"])
    # map torch weights through the converter's transforms
    _store(params, {}, (), "mha", "in_proj_weight",
           tm.in_proj_weight.detach().numpy())
    _store(params, {}, (), "mha", "in_proj_bias",
           tm.in_proj_bias.detach().numpy())
    _store(params, {}, ("out_proj",), "linear", "weight",
           tm.out_proj.weight.detach().numpy())
    _store(params, {}, ("out_proj",), "linear", "bias",
           tm.out_proj.bias.detach().numpy())

    got = mha.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv),
                    jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5,
                               rtol=1e-4)
