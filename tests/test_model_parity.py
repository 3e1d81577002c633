"""Numerical parity of the flax DFormer stack against the torch oracle
(tests/torch_oracle.py), through the checkpoint converter — covers both the
model math and the torch->flax weight mapping (SURVEY.md §4 golden-tensor
strategy)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dformer_tpu.models.encoder import DFormer, VARIANTS
from dformer_tpu.models.decoders.ham import LightHamHead, nmf2d
from dformer_tpu.utils.convert import (convert_encoder_state,
                                       convert_model_state,
                                       load_into_variables)
from tests.torch_oracle import (OracleDFormer, OracleHamHead, oracle_nmf,
                                randomize_bn_stats)

TINY = dict(dims=(32, 64, 128, 256), depths=(2, 1, 1, 2),
            num_heads=(1, 2, 4, 8), windows=(0, 7, 7, 7),
            mlp_ratios=(8, 8, 4, 4))


def _make_pair(seed=0):
    gen = torch.Generator().manual_seed(seed)
    torch.manual_seed(seed)
    oracle = OracleDFormer(dims=list(TINY["dims"]), depths=list(TINY["depths"]),
                           heads=list(TINY["num_heads"]),
                           windows=list(TINY["windows"]),
                           ratios=list(TINY["mlp_ratios"]))
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()

    model = DFormer(drop_path_rate=0.0, **TINY)
    rgb = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)
    modal = np.random.RandomState(2).randn(2, 64, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                           jnp.asarray(modal))

    # oracle stage key: stages.{i}.{j} comes out as stages.{i}.{j} already
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, stats = convert_encoder_state(sd)
    variables, matched = load_into_variables(variables, params, stats)
    return oracle, model, variables, rgb, modal, matched


def test_encoder_parity():
    oracle, model, variables, rgb, modal, matched = _make_pair()
    n_oracle = len([k for k in oracle.state_dict()
                    if "num_batches" not in k and "running" not in k])
    assert len(matched) == n_oracle, "converter must map every oracle param"

    with torch.no_grad():
        want = oracle(torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
                      torch.from_numpy(modal.transpose(0, 3, 1, 2)))
    got = model.apply(variables, jnp.asarray(rgb), jnp.asarray(modal),
                      train=False)
    assert len(got) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3,
                                   err_msg=f"stage {i}")


def test_nmf2d_parity():
    rng = np.random.RandomState(3)
    B, D, N, R = 2, 32, 48, 8
    x = np.abs(rng.randn(B, D, N)).astype(np.float32)
    bases = np.abs(rng.randn(B, D, R)).astype(np.float32)
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)

    want = oracle_nmf(torch.from_numpy(x), torch.from_numpy(bases), steps=7)
    got = nmf2d(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(bases),
                train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               want.numpy(), atol=1e-3, rtol=1e-2)


def test_ham_head_parity():
    gen = torch.Generator().manual_seed(7)
    torch.manual_seed(7)
    in_ch = [64, 128, 256]
    oracle = OracleHamHead(in_ch, ham=64, classes=11)
    with torch.no_grad():
        randomize_bn_stats(oracle, gen)
    oracle.eval()

    head = LightHamHead(in_index=(1, 2, 3), channels=64, ham_channels=64,
                        num_classes=11)
    rng = np.random.RandomState(5)
    feats_nhwc = [rng.randn(2, s, s, c).astype(np.float32)
                  for s, c in zip((32, 16, 8, 4), (32,) + tuple(in_ch))]
    variables = head.init(jax.random.PRNGKey(0),
                          [jnp.asarray(f) for f in feats_nhwc])

    sd = {k: v.detach().numpy()
          for k, v in oracle.state_dict_reference_keys().items()}
    params, stats = convert_model_state(
        {f"decode_head.{k}": v for k, v in sd.items()})
    variables, matched = load_into_variables(
        variables, params["decode_head"], stats["decode_head"])
    assert len(matched) == 13  # 3 ConvModules (w+bn w,b) + ham_in (w,b) + cls (w,b)

    # identical NMF bases on both sides: flax deterministic_bases uses
    # PRNGKey(0); recompute the same array for the oracle (md_r default 64).
    key = jax.random.PRNGKey(0)
    bases = jax.random.uniform(key, (2, 64, 64), jnp.float32)
    bases = bases / jnp.linalg.norm(bases, axis=1, keepdims=True)

    got = head.apply(variables, [jnp.asarray(f) for f in feats_nhwc],
                     train=False, deterministic_bases=True)
    # oracle consumes NCHW stage-2..4 features and the same bases
    t_feats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_nhwc[1:]]
    with torch.no_grad():
        want = oracle(t_feats, torch.from_numpy(np.asarray(bases)), steps=7)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-2)
