"""Multi-step training-trajectory parity vs the ACTUAL torch reference.

SURVEY §7 step 7's exit criterion: train the reference model (torch CPU,
utils/train.py:290-391 semantics) and the TPU stack from converter-identical
init on identical pre-generated batches, and require the loss trajectories
and final parameters to agree. Unlike the one-step gradient parity test
(test_reference_parity.py), a trajectory is sensitive to the *update* math:
AdamW bias correction / eps placement / decoupled weight decay
(utils/train.py:210-225 -> torch.optim.AdamW defaults), the group_weight
decay/no-decay split AND its silent omission of the custom-LayerNorm +
layer_scale params from the optimizer (utils/init_func.py:26-70), the
WarmUpPolyLR per-iter write quirk (utils/train.py:353-357: the LR for iter k
is written AFTER step k, so step 0 runs at the constructor base_lr and step
k>=1 at get_lr(k-1)), and torch BN running-stat momentum semantics
(unbiased batch var into running_var).

Alignment choices (each is a documented intentional divergence bridged
explicitly so the rest of the update math is tested exactly):
  * the torch loop below replicates the reference verbatim (post-step LR
    write); the JAX side passes make_optimizer(schedule=) the equivalent
    shifted schedule,
  * my production optimizer covers LN/layer_scale (README divergence); here
    the JAX side freezes exactly the leaves group_weight skips, via the
    production trainable-mask machinery,
  * NMF runs with full backprop (cfg.nmf_one_step_grad=False) matching the
    fork's commented-out @torch.no_grad (ham_head.py:45), with bases pinned
    identically on both sides,
  * dropout is disabled on both sides (p=0 / identity module) and
    drop_path_rate=0 — framework RNGs cannot be aligned.
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
from dformer_tpu.ops.schedule import warmup_poly_lr
from dformer_tpu.train.loop import TrainState, make_train_step
from dformer_tpu.train.optim import make_optimizer
from dformer_tpu.utils.convert import convert_model_state, load_into_variables

import ref_stubs
from test_reference_parity import (_BASIS, _randomize, _ref_cfg,
                                   pinned_bases)  # noqa: F401 (fixture)

HW = (64, 96)
BS = 2
N_STEPS = 25
BASE_LR = 1e-3
TOTAL_ITERS = 40
WARMUP_ITERS = 10   # steps 1-10 warm up, 11-24 poly-decay: both regimes
LR_POWER = 0.9


class _IdentityDropout:
    """Stands in for models.nn.Dropout inside the ham head: dropout off."""

    def __init__(self, rate, name=None):
        pass

    def __call__(self, x, deterministic=True):
        return x


def _covered_param_names(ref, ns):
    """Parameter names the reference optimizer actually updates: the union of
    group_weight's decay/no-decay groups (utils/init_func.py:26-70). The
    walk's isinstance checks skip DFormer.py's custom LayerNorm and the
    layer_scale nn.Parameters — those stay at init forever."""
    import importlib

    init_func = importlib.import_module("utils.init_func")
    groups = init_func.group_weight([], ref, torch.nn.BatchNorm2d, BASE_LR)
    ids = {id(p) for g in groups for p in g["params"]}
    return [n for n, p in ref.named_parameters() if id(p) in ids]


def _mask_from_matched(params, matched):
    matched = {tuple(p) for p in matched}

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return path in matched
    return walk(params)


def _sched_ref(step):
    """The LR the reference actually applies at optimizer step `step`
    (0-based): the constructor base_lr for step 0 (utils/train.py:311-316 —
    the first get_lr write lands after the first step), then get_lr(step-1)."""
    shifted = warmup_poly_lr(jnp.maximum(step - 1, 0), BASE_LR, TOTAL_ITERS,
                             WARMUP_ITERS, LR_POWER)
    return jnp.where(jnp.asarray(step) == 0, BASE_LR, shifted)


def _ref_lr_policy_value(k):
    """WarmUpPolyLR.get_lr (utils/lr_policy.py:22-34), host-side oracle."""
    if k < WARMUP_ITERS:
        return BASE_LR * (k / WARMUP_ITERS)
    return BASE_LR * (1 - k / TOTAL_ITERS) ** LR_POWER


def test_lr_schedule_matches_reference_policy():
    """My warmup_poly_lr == the reference WarmUpPolyLR.get_lr at every iter
    inside the horizon (the clamp past total_iters is the documented
    divergence; the reference returns NaN there)."""
    for k in range(TOTAL_ITERS):
        mine = float(warmup_poly_lr(k, BASE_LR, TOTAL_ITERS, WARMUP_ITERS,
                                    LR_POWER))
        ref = _ref_lr_policy_value(k)
        # mine is computed in fp32 on device; the reference in python f64
        assert abs(mine - ref) <= 1e-6 * BASE_LR, (k, mine, ref)


def test_training_trajectory_parity(pinned_bases, monkeypatch):
    monkeypatch.setattr(ham_mod, "Dropout", _IdentityDropout)

    cfg = load_config("local_configs.NYUDepthv2.DFormer_Tiny")
    cfg.drop_path_rate = 0.0
    cfg.aux_rate = 0.0
    cfg.nmf_one_step_grad = False
    cfg.lr = BASE_LR
    cfg.weight_decay = 0.01

    ns = ref_stubs.load_reference()
    ref = ref_stubs.build_reference_model(_ref_cfg(cfg))
    _randomize(ref)
    for m in ref.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
    sd0 = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    # --- JAX side: converter-identical init, reference-equivalent optimizer
    model = build_model(cfg, dtype=None, pallas="off")
    zeros = jnp.zeros((1, HW[0], HW[1], 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros)
    params, stats = convert_model_state(
        {k: v.numpy() for k, v in sd0.items()})
    variables, matched = load_into_variables(variables, params, stats)
    n_leaves = len(jax.tree.leaves(variables["params"]))
    assert len(matched) == n_leaves

    covered = _covered_param_names(ref, ns)
    skipped = [n for n, _ in ref.named_parameters() if n not in set(covered)]
    # the quirk must be discriminative: the walk really does skip params,
    # and only the expected kinds (custom-LN affines + layer_scales)
    assert skipped and all(
        "layer_scale" in n or "norm" in n for n in skipped), skipped[:8]
    cov_p, cov_s = convert_model_state(
        {k: sd0[k].numpy() for k in covered})
    _, cov_matched = load_into_variables(
        jax.tree.map(lambda x: x, variables), cov_p, cov_s)
    tmask = _mask_from_matched(variables["params"], cov_matched)

    tx = make_optimizer(cfg, variables["params"], trainable_mask=tmask,
                        schedule=_sched_ref)
    state = TrainState(step=jnp.asarray(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(model, tx, cfg)

    # --- torch side: the reference train loop verbatim (utils/train.py)
    import importlib

    init_func = importlib.import_module("utils.init_func")
    lr_policy_mod = importlib.import_module("utils.lr_policy")
    groups = init_func.group_weight([], ref, torch.nn.BatchNorm2d, BASE_LR)
    opt = torch.optim.AdamW(groups, lr=BASE_LR, betas=(0.9, 0.999),
                            weight_decay=cfg.weight_decay)
    lr_policy = lr_policy_mod.WarmUpPolyLR(BASE_LR, LR_POWER, TOTAL_ITERS,
                                           WARMUP_ITERS)
    ref.train()

    rng = np.random.RandomState(3)
    batches = []
    for _ in range(N_STEPS):
        rgb = rng.normal(0, 1, (BS, HW[0], HW[1], 3)).astype(np.float32)
        modal = rng.normal(0, 1, (BS, HW[0], HW[1], 3)).astype(np.float32)
        gt = rng.randint(0, cfg.num_classes, (BS, HW[0], HW[1]))
        gt = np.where(rng.rand(*gt.shape) < 0.05, cfg.background, gt)
        batches.append((rgb, modal, gt.astype(np.int64)))

    ref_losses = []
    degenerate = []
    for idx, (rgb, modal, gt) in enumerate(batches):
        loss, _ = ref(torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
                      torch.from_numpy(modal.transpose(0, 3, 1, 2)),
                      torch.from_numpy(gt))
        opt.zero_grad()
        loss.backward()
        if idx == 0:
            # structurally-null gradients (conv biases feeding BN: the mean
            # subtraction removes them exactly). Adam normalizes their fp
            # noise to +-lr random walks that CANNOT match across
            # frameworks and do not affect the function — exempt from the
            # strict final-param comparison, bound by the walk length.
            # (Measured: the null leaves — stem/downsample conv biases and
            # last-block fc2 biases whose constant shift dies in the next
            # BN — have |g|max <= 4.4e-8; real leaves are >1e-6.)
            degenerate = [n for n, p in ref.named_parameters()
                          if p.grad is not None
                          and float(p.grad.abs().max()) < 3e-7]
        opt.step()
        lr = lr_policy.get_lr(idx)           # post-step write, as shipped
        for g in opt.param_groups:
            g["lr"] = lr
        ref_losses.append(float(loss.detach()))

    my_losses = []
    key = jax.random.PRNGKey(0)
    for rgb, modal, gt in batches:
        state, loss = step_fn(state, jnp.asarray(rgb), jnp.asarray(gt),
                              jnp.asarray(modal), key)
        my_losses.append(float(loss))

    # --- trajectory agreement. Per-step fp32 drift compounds: the one-step
    # grad floor is ~1e-3 relative (test_reference_parity.py:285); allow a
    # linearly growing envelope on the loss series.
    for k, (a, b) in enumerate(zip(ref_losses, my_losses)):
        tol = 2e-3 + 4e-4 * k
        assert abs(a - b) <= tol * max(1.0, abs(b)), \
            (k, a, b, ref_losses, my_losses)
    # the run must be discriminative: training actually moved the loss
    assert ref_losses[-1] < ref_losses[0] - 0.05, ref_losses

    # --- final parameters: convert the trained torch state and compare
    fin_p, fin_s = convert_model_state(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    ref_vars, _ = load_into_variables(
        jax.jit(model.init)(jax.random.PRNGKey(0), zeros, zeros),
        fin_p, fin_s)

    assert degenerate, "expected conv-bias-into-BN leaves to be null-grad"
    deg_p, deg_s = convert_model_state(
        {k: sd0[k].numpy() for k in degenerate})
    _, deg_matched = load_into_variables(
        jax.tree.map(lambda x: x, variables), deg_p, deg_s)
    deg_paths = {tuple(p) for p in deg_matched}

    # Adam random-walk bound for null-grad leaves: two independent walks of
    # N_STEPS steps at <= base_lr each
    walk_bound = 2 * N_STEPS * BASE_LR * 1.2

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]
    flat_my = jax.tree_util.tree_flatten_with_path(state.params)[0]
    assert len(flat_ref) == len(flat_my)
    for (path_r, vr), (path_m, vm) in zip(flat_ref, flat_my):
        assert path_r == path_m
        vr = np.asarray(vr, np.float32)
        vm = np.asarray(vm, np.float32)
        path_tuple = tuple(getattr(k, "key", k) for k in path_m)
        if path_tuple in deg_paths:
            assert float(np.abs(vr - vm).max()) <= walk_bound, \
                jax.tree_util.keystr(path_m)
            continue
        scale = max(float(np.abs(vr).max()), 1e-3)
        diff = float(np.abs(vr - vm).max()) / scale
        assert diff < 3e-2, (jax.tree_util.keystr(path_m), diff)
    # running stats drifted the same way (BN momentum semantics)
    for (path_r, vr), (path_m, vm) in zip(
            jax.tree_util.tree_flatten_with_path(ref_vars["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]):
        assert path_r == path_m
        vr, vm = np.asarray(vr, np.float32), np.asarray(vm, np.float32)
        scale = max(float(np.abs(vr).max()), 1e-3)
        # 8e-2: running stats integrate ACTIVATIONS, and the leaves right
        # after the NMF hamburger see fp drift amplified by 6 full-backprop
        # multiplicative updates per step (worst measured: align.bn.var at
        # 4.2e-2 after 25 steps; params all <3e-2 and held-out logits match
        # below). Semantics errors stay detectable: swapped torch/flax
        # momentum conventions or a biased-var update would read O(1).
        assert float(np.abs(vr - vm).max()) / scale < 8e-2, \
            jax.tree_util.keystr(path_m)

    # functional agreement of the TRAINED models on held-out inputs (eval
    # mode, running stats — the check the degenerate leaves cannot affect)
    hrng = np.random.RandomState(99)
    h_rgb = hrng.normal(0, 1, (BS, HW[0], HW[1], 3)).astype(np.float32)
    h_mod = hrng.normal(0, 1, (BS, HW[0], HW[1], 3)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        t_out = ref(torch.from_numpy(h_rgb.transpose(0, 3, 1, 2)),
                    torch.from_numpy(h_mod.transpose(0, 3, 1, 2)))
    my_out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(h_rgb), jnp.asarray(h_mod), train=False,
        deterministic_bases=True)
    t_np = t_out.detach().numpy().transpose(0, 2, 3, 1)
    m_np = np.asarray(my_out, np.float32)
    spread = float(np.std(t_np))
    assert spread > 1e-2  # discriminative
    # mean-based bound: the 25-step fp drift (params <3e-2 rel) is amplified
    # by the chaotic 7-iteration NMF ratio updates into large diffs at a FEW
    # pixels (measured max 0.71*std) while the field agrees — the mean is
    # the stable statistic. A wrong update rule shifts the whole field.
    mean_d = float(np.abs(t_np - m_np).mean())
    assert mean_d < 0.15 * spread, (mean_d, spread)
