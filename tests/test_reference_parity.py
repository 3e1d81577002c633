"""Parity against the ACTUAL reference code in /root/reference.

Unlike tests/torch_oracle.py (a hand-written restatement of the reference,
kept as a smoke layer), these tests import the reference's own torch modules
(models/encoders/DFormer.py, models/builder.py, models/decoders/ham_head.py,
utils/val_mm.py, utils/metrics_new.py) through tests/ref_stubs.py and drive
them as oracles:

  * full-model fp32 logits parity at Tiny and Large geometry through the
    checkpoint converter (weights randomized, BN stats randomized, NMF bases
    pinned identically on both sides),
  * MSF+flip metric-pipeline parity against the reference's own
    val_mm.evaluate_msf + Metrics,
  * sliding-window logits parity against val_mm.slide_inference.

If the TPU stack diverges from the reference code, these fail.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dformer_tpu.config import load_config
from dformer_tpu.models import build_model
from dformer_tpu.models.decoders import ham as ham_mod
from dformer_tpu.utils.convert import convert_model_state, load_into_variables

import ref_stubs

# one shared basis for every NMF call on both sides (every sample identical,
# so batched-window inference and per-window loops see the same basis)
_BASIS_N = 64


def _fixed_basis(d=512, r=64):
    rng = np.random.RandomState(7)
    b = rng.rand(1, d, r).astype(np.float32)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return np.repeat(b, _BASIS_N, axis=0)


_BASIS = _fixed_basis()


@pytest.fixture()
def pinned_bases(monkeypatch):
    ns = ref_stubs.load_reference()

    def ref_build(self, B, S, D, R, cuda=False):
        assert D == _BASIS.shape[1] and R == _BASIS.shape[2]
        return torch.from_numpy(_BASIS[: B * S].copy())

    import models.decoders.ham_head as ref_ham

    monkeypatch.setattr(ref_ham.NMF2D, "_build_bases", ref_build)
    monkeypatch.setattr(
        ham_mod, "_uniform_bases",
        lambda key, b, d, r: jnp.asarray(_BASIS[:b]))


def _ref_cfg(cfg):
    return types.SimpleNamespace(
        backbone=cfg.backbone, decoder=cfg.decoder,
        num_classes=cfg.num_classes,
        decoder_embed_dim=cfg.decoder_embed_dim,
        drop_path_rate=cfg.drop_path_rate, aux_rate=0.0, device="cpu",
        background=cfg.background, pretrained_model=None,
        bn_eps=cfg.bn_eps, bn_momentum=cfg.bn_momentum,
        eval_crop_size=list(cfg.eval_crop_size),
        eval_stride_rate=cfg.eval_stride_rate,
    )


def _randomize(model, seed=0):
    """Replace every weight/stat with seeded random values so that parity is
    discriminative: layer_scales at O(1) (default 1e-6 would damp the whole
    attention/MLP path below tolerance), BN running stats away from (0, 1)."""
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    new = {}
    for k in sorted(sd.keys()):
        v = sd[k]
        shape = tuple(v.shape)
        if k.endswith("num_batches_tracked"):
            new[k] = v
            continue
        if "running_var" in k:
            arr = rng.uniform(0.5, 2.0, shape)
        elif "running_mean" in k:
            arr = rng.normal(0.0, 0.2, shape)
        elif "layer_scale" in k:
            arr = rng.uniform(0.5, 1.5, shape)
        elif len(shape) <= 1:
            if k.endswith(".bias"):
                arr = rng.normal(0.0, 0.05, shape)
            else:  # norm weights
                arr = rng.uniform(0.8, 1.2, shape)
        else:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0.0, fan_in ** -0.5, shape)
        new[k] = torch.from_numpy(np.ascontiguousarray(arr)).to(v.dtype)
    model.load_state_dict(new)
    return model


def _leaf_count(tree):
    return len(jax.tree.leaves(tree))


def _build_pair(config_name, hw):
    cfg = load_config(config_name)
    ref = ref_stubs.build_reference_model(_ref_cfg(cfg))
    _randomize(ref)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = build_model(cfg, dtype=None, pallas="off")
    rng = jax.random.PRNGKey(0)
    zeros = jnp.zeros((1, hw[0], hw[1], 3))
    variables = jax.jit(model.init)(rng, zeros, zeros)

    params, stats = convert_model_state(sd)
    variables, matched = load_into_variables(
        variables, params, stats)

    n_leaves = _leaf_count(variables["params"])
    assert len(matched) == n_leaves, (
        f"converter covered {len(matched)}/{n_leaves} param leaves — "
        "naming drift between the flax tree and the reference state_dict")
    return cfg, ref, model, variables


def _assert_logits_close(ref_logits_nchw, my_logits_nhwc, tol=1e-4):
    ref_np = ref_logits_nchw.detach().numpy().transpose(0, 2, 3, 1)
    my_np = np.asarray(my_logits_nhwc, np.float32)
    assert ref_np.shape == my_np.shape
    # the test must be discriminative: degenerate (constant) logits would
    # pass trivially
    assert float(np.std(ref_np)) > 1e-2
    diff = np.max(np.abs(ref_np - my_np))
    assert diff < tol, f"max |logits diff| = {diff}"


@pytest.mark.parametrize("config_name,hw", [
    ("local_configs.NYUDepthv2.DFormer_Tiny", (96, 128)),
    ("local_configs.NYUDepthv2.DFormer_Large", (96, 128)),
])
def test_full_model_logits_parity(config_name, hw, pinned_bases):
    cfg, ref, model, variables = _build_pair(config_name, hw)
    rng = np.random.RandomState(1)
    B = 2
    rgb = rng.normal(0, 1, (B, hw[0], hw[1], 3)).astype(np.float32)
    modal = rng.normal(0, 1, (B, hw[0], hw[1], 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
                      torch.from_numpy(modal.transpose(0, 3, 1, 2)))
    my_out = model.apply(variables, jnp.asarray(rgb), jnp.asarray(modal),
                         train=False, deterministic_bases=True)
    _assert_logits_close(ref_out, my_out)


def _synthetic_batches(cfg, hw, n_batches=2, bsz=2, seed=3):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        rgb = rng.normal(0, 1, (bsz, hw[0], hw[1], 3)).astype(np.float32)
        modal = rng.normal(0, 1, (bsz, hw[0], hw[1], 3)).astype(np.float32)
        gt = rng.randint(0, cfg.num_classes, (bsz, hw[0], hw[1]))
        gt = np.where(rng.rand(*gt.shape) < 0.05, cfg.background, gt)
        batches.append(dict(rgb=rgb, modal_x=modal, gt=gt.astype(np.int64)))
    return batches


def test_msf_metric_pipeline_parity(pinned_bases):
    """Drive the reference's own evaluate_msf + Metrics as the oracle for the
    batched TPU MSF evaluator (val_mm.py:324-470 vs eval/evaluate.py)."""
    from dformer_tpu.eval.evaluate import Evaluator

    hw = (96, 128)
    cfg, ref, model, variables = _build_pair(
        "local_configs.NYUDepthv2.DFormer_Tiny", hw)
    ns = ref_stubs.load_reference()
    batches = _synthetic_batches(cfg, hw)
    scales = [0.5, 0.75, 1.0]

    torch_batches = [
        dict(rgb=torch.from_numpy(b["rgb"].transpose(0, 3, 1, 2)),
             modal_x=torch.from_numpy(b["modal_x"].transpose(0, 3, 1, 2)),
             gt=torch.from_numpy(b["gt"]))
        for b in batches
    ]
    engine = types.SimpleNamespace(distributed=False)
    with torch.no_grad():
        ref_metrics = ns.val_mm.evaluate_msf(
            ref, torch_batches, _ref_cfg(cfg), torch.device("cpu"),
            scales, True, engine)
    ref_hist = ref_metrics.hist.numpy()
    ref_miou = ref_metrics.compute_iou()[1]

    ev = Evaluator(model, variables, cfg)
    m = ev.evaluate_msf(batches, scales=scales, flip=True)
    my_hist = np.asarray(m.hist)
    my_miou = m.compute_iou()[1]

    total = ref_hist.sum()
    mismatch = np.abs(ref_hist - my_hist).sum() / 2.0 / total
    assert mismatch < 0.005, f"hist mismatch fraction {mismatch}"
    assert abs(ref_miou - my_miou) < 0.2, (ref_miou, my_miou)


def test_sliding_window_logits_parity(pinned_bases):
    """Batched-window sliding inference vs the reference's python window loop
    (val_mm.py:257-321 vs Evaluator._slide)."""
    from dformer_tpu.eval.evaluate import Evaluator

    hw = (96, 128)
    cfg, ref, model, variables = _build_pair(
        "local_configs.NYUDepthv2.DFormer_Tiny", hw)
    cfg.eval_crop_size = [64, 64]
    cfg.eval_stride_rate = 2 / 3
    ns = ref_stubs.load_reference()

    rng = np.random.RandomState(5)
    rgb = rng.normal(0, 1, (2, hw[0], hw[1], 3)).astype(np.float32)
    modal = rng.normal(0, 1, (2, hw[0], hw[1], 3)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ns.val_mm.slide_inference(
            ref, torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
            torch.from_numpy(modal.transpose(0, 3, 1, 2)), _ref_cfg(cfg))

    ev = Evaluator(model, variables, cfg, sliding=True)
    my_logits = ev._slide(jnp.asarray(rgb), jnp.asarray(modal))
    _assert_logits_close(ref_logits, my_logits)


def test_full_model_gradient_parity(pinned_bases):
    """Backward-pass parity: d(masked-CE loss)/d(inputs) through the ENTIRE
    EncoderDecoder must match torch autograd on the actual reference model
    (builder.py:224-233 loss semantics: per-pixel CE, mean over non-background
    pixels). Input gradients exercise every layer's backward without needing
    a parameter-name mapping."""
    hw = (96, 128)
    cfg, ref, model, variables = _build_pair(
        "local_configs.NYUDepthv2.DFormer_Tiny", hw)
    rng = np.random.RandomState(11)
    B = 2
    rgb = rng.normal(0, 1, (B, hw[0], hw[1], 3)).astype(np.float32)
    modal = rng.normal(0, 1, (B, hw[0], hw[1], 3)).astype(np.float32)
    gt = rng.randint(0, cfg.num_classes, (B, hw[0], hw[1]))
    gt = np.where(rng.rand(*gt.shape) < 0.1, cfg.background, gt)

    t_rgb = torch.from_numpy(rgb.transpose(0, 3, 1, 2)).requires_grad_(True)
    t_mod = torch.from_numpy(modal.transpose(0, 3, 1, 2)).requires_grad_(True)
    ref_loss, _ = ref(t_rgb, t_mod, torch.from_numpy(gt))
    ref_loss.backward()
    ref_g_rgb = t_rgb.grad.numpy().transpose(0, 2, 3, 1)
    ref_g_mod = t_mod.grad.numpy().transpose(0, 2, 3, 1)

    from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean

    def loss_fn(a, b):
        out = model.apply(variables, a, b, train=False,
                          deterministic_bases=True)
        return softmax_cross_entropy_masked_mean(
            out, jnp.asarray(gt), ignore_index=cfg.background)

    my_loss, (my_g_rgb, my_g_mod) = jax.value_and_grad(
        loss_fn, argnums=(0, 1))(jnp.asarray(rgb), jnp.asarray(modal))

    assert abs(float(my_loss) - float(ref_loss)) < 1e-4, \
        (float(my_loss), float(ref_loss))
    for mine, theirs in ((my_g_rgb, ref_g_rgb), (my_g_mod, ref_g_mod)):
        mine = np.asarray(mine, np.float32)
        scale = np.abs(theirs).max()
        assert scale > 0
        diff = np.abs(mine - theirs).max() / scale
        # fp32 accumulation ordering across ~20 layers of backward puts the
        # floor just above 1e-3; a structurally wrong backward lands orders
        # of magnitude higher
        assert diff < 3e-3, f"relative input-grad diff {diff}"


@pytest.mark.parametrize("decoder", ["MLPDecoder", "UPernet", "deeplabv3+",
                                     "nl"])
def test_decoder_parity_against_reference(decoder, pinned_bases):
    """Every wired decoder (builder.py:126-174), driven through the real
    reference EncoderDecoder on a Tiny backbone, must match through the
    converter — this covers the biased-conv-before-BN quirk of the
    reference's hand-rolled Sequential heads and the NL block."""
    hw = (96, 128)
    cfg = load_config("local_configs.NYUDepthv2.DFormer_Tiny")
    cfg.decoder = decoder
    ref = ref_stubs.build_reference_model(_ref_cfg(cfg))
    _randomize(ref)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = build_model(cfg, dtype=None, pallas="off")
    zeros = jnp.zeros((1, hw[0], hw[1], 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    params, stats = convert_model_state(sd)
    variables, matched = load_into_variables(variables, params, stats)
    n_leaves = _leaf_count(variables["params"])
    assert len(matched) == n_leaves, (
        f"converter covered {len(matched)}/{n_leaves} param leaves "
        f"for decoder={decoder}")

    rng = np.random.RandomState(2)
    rgb = rng.normal(0, 1, (2, hw[0], hw[1], 3)).astype(np.float32)
    modal = rng.normal(0, 1, (2, hw[0], hw[1], 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
                      torch.from_numpy(modal.transpose(0, 3, 1, 2)))
    my_out = model.apply(variables, jnp.asarray(rgb), jnp.asarray(modal),
                         train=False, deterministic_bases=True)
    _assert_logits_close(ref_out, my_out)
