"""Few-shot episodic training step (reference utils/train_trav_fss_v1.py).

The FSS recipe fine-tunes only the lidar expansion (attn_expand_e), the first
fusion stage, and the decoder (get_trav_trainable_layers,
utils/init_func.py:73-118); everything else is frozen via the optimizer mask.
The loss is masked CE on meta_forward's fused prototype+decoder logits
(models/builder.py:237-310).
"""

import jax
import jax.numpy as jnp

from dformer_tpu.ops.loss import softmax_cross_entropy_masked_mean
from dformer_tpu.train.loop import TrainState


def fss_trainable_mask(params):
    """True for attn_expand_e / body stage-0 blocks / decode_head
    (reference init_func.py:73-118: depth_module + stages[0] + decoder).

    Only valid for the DFormerTrav tree shape (encoder_backbone containing
    attn_expand_e + a nested 'body'); on a stock DFormer tree the walk
    would silently freeze the whole encoder, so assert the shape up front.
    """
    enc = params.get("encoder_backbone", {})
    if not ("attn_expand_e" in enc and "body" in enc):
        raise ValueError(
            "fss_trainable_mask expects a DFormerTrav param tree "
            "(encoder_backbone.{attn_expand_e, body.*}); got encoder keys "
            f"{sorted(enc)[:8]} — on a stock DFormer this mask would freeze "
            "the entire encoder")

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if path[0] == "decode_head" or path[0] == "aux_head":
            return True
        if path[0] == "encoder_backbone":
            sub = path[1:]
            if sub[0] == "attn_expand_e":
                return True
            if sub[0] == "body" and sub[1].startswith("stage_0_"):
                return True
        return False
    return walk(params)


def make_fss_train_step(model, tx, cfg, contrastive_weight: float = 0.0):
    """Episodic FSS step. contrastive_weight > 0 adds the prototype
    InfoNCE term (reference ContrastiveLoss, models/builder.py:61-88) on
    the query top-stage features vs the episode's bg/fg prototypes — the
    class-grouped few-shot recipe's auxiliary loss. Returns
    (state, (ce_loss, contrastive_loss)) in that mode, else (state, loss)."""
    background = cfg.get("background", 255)

    def step_fn(state: TrainState, s_img, s_gt, s_depth, q_img, q_gt, q_depth,
                rng):
        drop_key, nmf_key = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                s_img, s_depth, s_gt, q_img, q_depth,
                train=True, deterministic_bases=False,
                return_episode=contrastive_weight > 0,
                method=model.meta_forward, mutable=["batch_stats"],
                rngs={"dropout": drop_key, "nmf": nmf_key})
            if contrastive_weight > 0:
                logits, ep = out
            else:
                logits, ep = out, None
            ce = softmax_cross_entropy_masked_mean(logits, q_gt, background)
            if ep is None:
                return ce, (new_vars["batch_stats"], jnp.zeros(()))
            from dformer_tpu.models.fewshot import contrastive_loss
            from dformer_tpu.ops.resize import resize_bilinear

            # resize the query mask to the top-stage grid (same rule as the
            # support mask in meta_forward), ignore-label pixels -> bg
            hw = ep["q_top"].shape[1:3]
            qm = jnp.where(q_gt == background, 0, q_gt)
            qm = resize_bilinear(qm[..., None].astype(jnp.float32), hw)[..., 0]
            qm = jnp.round(qm).astype(jnp.int32)
            protos = jnp.stack([ep["bg"], ep["fg"]])  # [K=2, B, C]
            con = contrastive_loss(ep["q_top"].astype(jnp.float32),
                                   protos.astype(jnp.float32), qm)
            return ce + contrastive_weight * con, \
                (new_vars["batch_stats"], con)

        (loss, (new_stats, con)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        if contrastive_weight > 0:
            return new_state, (loss, con)
        return new_state, loss

    return jax.jit(step_fn, donate_argnums=(0,))


def fss_evaluate(model, variables, batches, cfg):
    """Episode eval with confusion-matrix metrics
    (reference val_mm.py:210-254)."""
    from dformer_tpu.ops.metrics import Metrics, confusion_matrix

    metrics = Metrics(cfg.num_classes, cfg.background)

    @jax.jit
    def forward(s_img, s_gt, s_depth, q_img, q_depth):
        return model.apply(variables, s_img, s_depth, s_gt, q_img, q_depth,
                           train=False, deterministic_bases=True,
                           method=model.meta_forward)

    for b in batches:
        logits = forward(b["s_img"], b["s_gt"], b["s_depth"], b["q_img"],
                         b["q_depth"])
        metrics.update(logits, b["q_gt"])
    return metrics
