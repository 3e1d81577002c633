"""PyTorch checkpoint -> flax variable-tree converter.

Handles the reference's released artifacts (SURVEY.md §5.4):
  * encoder pretrains `.pth.tar` with 'state_dict_ema'/'state_dict' and
    optional 'backbone.'/'module.' prefixes (reference DFormer.py:254-271),
  * full train checkpoints with a 'model' dict covering encoder_backbone +
    decode_head (+ aux_head) (reference engine.py:101-130).

Weight-layout transforms: Linear [out,in] -> kernel [in,out]; Conv2d
[out,in/g,kh,kw] -> HWIO [kh,kw,in/g,out]; BatchNorm running_mean/var ->
batch_stats collection; MultiheadAttention packed in_proj [3E,E] -> [E,3E].

Returns (params, batch_stats, matched_paths) where matched_paths records
which flax leaves were loaded — used to reproduce the fork's
freeze-loaded-params behavior (DFormer.py:272-276) via an optax mask.
"""

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_STEM_SLOT = {"0": "conv1", "1": "bn1", "3": "conv2", "4": "bn2"}


def _encoder_key_to_path(key: str):
    """Map a torch backbone key (no prefix) to (flax_path_prefix, kind).

    kind: 'linear' | 'conv' | 'bn' | 'ln' | 'param' | 'mha' | None (skip).
    """
    parts = key.split(".")
    name = parts[0]

    if name in ("downsample_layers", "downsample_layers_e"):
        e = name.endswith("_e")
        idx, slot = parts[1], parts[2]
        leaf = parts[3]
        if idx == "0":
            mod = "stem_e" if e else "stem"
            sub = _STEM_SLOT.get(slot)
            if sub is None:
                return None
            kind = "conv" if sub.startswith("conv") else "bn"
            return (mod, sub), kind, leaf
        mod = f"downsample_e_{idx}" if e else f"downsample_{idx}"
        if slot == "0":
            return (mod, "norm"), "bn", leaf
        return (mod, "conv"), "conv", leaf

    if name == "stages":
        i, j = parts[1], parts[2]
        block = f"stage_{i}_block_{j}"
        rest = parts[3:]
        if rest[0].startswith("layer_scale"):
            return (block, rest[0]), "param", None
        sub, leaf = rest[0], rest[-1]
        inner = rest[1] if len(rest) > 2 else rest[1]
        if sub == "attn":
            if inner in ("conv", "e_conv"):
                kind = "conv"
            elif inner in ("norm", "norm_e"):
                kind = "ln"
            else:
                kind = "linear"
            return (block, "attn", inner), kind, leaf
        if sub in ("mlp", "mlp_e2"):
            if inner == "pos":
                kind = "conv"
            elif inner == "norm":
                kind = "ln"
            else:
                kind = "linear"
            return (block, sub, inner), kind, leaf

    if name in ("stem_e_fc1", "stem_e_fc2"):  # unused fork stubs (DFormer.py:202-203)
        return None

    if name == "attn_expand_e":
        sub = parts[1]
        if sub in ("input_proj", "output_proj"):
            return ("attn_expand_e", sub), "linear", parts[-1]
        if sub in ("query1", "query2"):
            return ("attn_expand_e", sub), "param", None
        if sub in ("attn1", "attn2"):
            if parts[2] == "out_proj":
                return ("attn_expand_e", sub, "out_proj"), "linear", parts[-1]
            return ("attn_expand_e", sub), "mha", parts[2]
    return None


def _head_key_to_path(key: str):
    """Map a torch decode_head/aux_head key to (flax_path, kind, leaf)."""
    parts = key.split(".")
    name = parts[0]
    # ham head (reference ham_head.py:196-240)
    if name in ("squeeze", "align"):
        sub = parts[1]  # conv | bn
        return (name, sub), ("conv" if sub == "conv" else "bn"), parts[-1]
    if name == "hamburger":
        sub = parts[1]
        if sub == "ham_in":
            return ("hamburger", "ham_in"), "conv", parts[-1]
        if sub == "ham_out":
            inner = parts[2]
            return (("hamburger", "ham_out", inner),
                    "conv" if inner == "conv" else "bn", parts[-1])
    if name == "conv_seg":
        return ("conv_seg",), "conv", parts[-1]
    # MLPDecoder (reference MLPDecoder.py:45-57)
    if name.startswith("linear_c"):
        return (name, ), "linear", parts[-1] if parts[1] != "proj" else parts[-1]
    if name == "linear_fuse":
        slot = parts[1]
        return (("linear_fuse", "conv" if slot == "0" else "bn"),
                "conv" if slot == "0" else "bn", parts[-1])
    if name == "linear_pred":
        return ("linear_pred",), "conv", parts[-1]
    # FCN head (fcnhead.py:17-24)
    if name == "conv":
        slot = parts[1]
        return (("conv", "conv" if slot == "0" else "bn"),
                "conv" if slot == "0" else "bn", parts[-1])
    if name == "classifier":
        return ("classifier",), "conv", parts[-1]
    # UPerHead (UPernet.py:22-56; Sequentials are [conv, bn, relu] except
    # psp_modules which lead with the pool: [pool, conv, bn, relu])
    if name == "psp_modules":
        i, slot = parts[1], parts[2]
        return ((f"ppm_{i}", "conv" if slot == "1" else "bn"),
                "conv" if slot == "1" else "bn", parts[-1])
    if name in ("bottleneck", "fpn_bottleneck"):
        slot = parts[1]
        return ((name, "conv" if slot == "0" else "bn"),
                "conv" if slot == "0" else "bn", parts[-1])
    if name in ("lateral_convs", "fpn_convs"):
        i, slot = parts[1], parts[2]
        mod = f"lateral_{i}" if name == "lateral_convs" else f"fpn_{i}"
        return ((mod, "conv" if slot == "0" else "bn"),
                "conv" if slot == "0" else "bn", parts[-1])
    # DeepLabV3+ (deeplabv3plus.py:6-100); flax _ConvBN keeps the conv
    # kernel/bias directly on the module with a nested "bn"
    if name == "aspp":
        sub = parts[1]
        if sub == "project":
            mod, slot = "aspp_project", parts[2]
        elif sub == "b0":
            mod, slot = "aspp_b0", parts[2]
        elif sub in ("b1", "b2", "b3"):
            mod, slot = f"aspp_{sub}", parts[3]  # bN.block.{0,1}
        elif sub == "b4":
            mod = "aspp_pool"                    # b4.gap.{1,2} (0 = pool)
            slot = "0" if parts[3] == "1" else "1"
        else:
            return None
        if slot == "0":
            return (mod,), "conv", parts[-1]
        return ((mod, "bn"), "bn", parts[-1])
    if name == "low_level":
        slot = parts[1]
        if slot == "0":
            return ("low_level",), "conv", parts[-1]
        return (("low_level", "bn"), "bn", parts[-1])
    if name == "block":
        slot = parts[1]
        if slot == "0":
            return ("block_conv",), "conv", parts[-1]
        if slot == "1":
            return (("block_conv", "bn"), "bn", parts[-1])
        if slot == "4":
            return ("block_pred",), "conv", parts[-1]
    # NLHead (nl_head.py:368-428; g/theta/phi are bias'd 1x1 ConvModules,
    # conv_out is conv+BN)
    if name == "nl_block":
        sub = parts[1]
        if sub in ("g", "theta", "phi"):
            return (("nl_block", sub), "conv", parts[-1])
        if sub == "conv_out":
            inner = parts[2]
            return (("nl_block", "conv_out", inner),
                    "conv" if inner == "conv" else "bn", parts[-1])
    return None


def _store(params, stats, path, kind, leaf, tensor):
    arr = np.asarray(tensor, dtype=np.float32)
    if kind == "param":
        _set(params, path, arr)
    elif kind == "linear":
        if leaf == "weight":
            _set(params, path + ("kernel",), arr.T)
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
    elif kind == "conv":
        if leaf == "weight":
            _set(params, path + ("kernel",), arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _set(params, path + ("bias",), arr)
    elif kind == "ln":
        _set(params, path + (leaf,), arr)
    elif kind == "bn":
        if leaf in ("weight", "bias"):
            _set(params, path + (leaf,), arr)
        elif leaf == "running_mean":
            _set(stats, path + ("mean",), arr)
        elif leaf == "running_var":
            _set(stats, path + ("var",), arr)
        # num_batches_tracked: dropped (momentum is fixed, load_utils.py:47-49)
    elif kind == "mha":
        if leaf == "in_proj_weight":
            _set(params, path + ("in_proj_weight",), arr.T)
        elif leaf == "in_proj_bias":
            _set(params, path + ("in_proj_bias",), arr)


def strip_prefixes(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip 'backbone.' and 'module.' prefixes (reference DFormer.py:261-269)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("backbone."):
            k = k[len("backbone."):]
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def convert_encoder_state(state_dict, trav: bool = False):
    """Torch backbone state_dict -> (params, batch_stats) flax subtrees.

    With trav=True the DFormer body nests under 'body' (models/trav.py)."""
    params, stats = {}, {}
    for key, tensor in state_dict.items():
        mapped = _encoder_key_to_path(key)
        if mapped is None:
            continue
        path, kind, leaf = mapped
        if trav and path[0] != "attn_expand_e":
            path = ("body",) + path
        _store(params, stats, path, kind, leaf, tensor)
    return params, stats


def convert_model_state(state_dict):
    """Full EncoderDecoder torch state_dict -> (params, batch_stats)."""
    params, stats = {}, {}
    trav = any(k.startswith("encoder_backbone.attn_expand_e")
               for k in state_dict)
    for key, tensor in state_dict.items():
        if key.startswith("encoder_backbone."):
            sub = key[len("encoder_backbone."):]
            mapped = _encoder_key_to_path(sub)
            if mapped is None:
                continue
            path, kind, leaf = mapped
            if trav and path[0] != "attn_expand_e":
                path = ("body",) + path
            _store(params, stats, ("encoder_backbone",) + path, kind, leaf,
                   tensor)
        elif key.startswith("decode_head.") or key.startswith("aux_head."):
            top, sub = key.split(".", 1)
            mapped = _head_key_to_path(sub)
            if mapped is None:
                continue
            path, kind, leaf = mapped
            _store(params, stats, (top,) + tuple(path), kind, leaf, tensor)
    return params, stats


def _merge(dst: dict, src: dict, path=()):
    """Merge src leaves into dst (must structurally exist); returns matched paths."""
    matched = []
    for k, v in src.items():
        if isinstance(v, dict):
            if k in dst and isinstance(dst[k], dict):
                matched += _merge(dst[k], v, path + (k,))
        else:
            if k in dst:
                want = np.shape(dst[k])
                if tuple(np.shape(v)) == tuple(want):
                    dst[k] = v.astype(np.asarray(dst[k]).dtype) \
                        if hasattr(v, "astype") else v
                    matched.append(path + (k,))
    return matched


def load_into_variables(variables, params, stats):
    """Non-strict merge of converted tensors into an initialized flax
    variable dict (mirrors mmengine load_state_dict(strict=False)).

    Returns (new_variables, matched_param_paths)."""
    import jax

    var = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    var = {k: _to_mutable(v) for k, v in var.items()}
    matched = _merge(var.get("params", {}), params)
    _merge(var.get("batch_stats", {}), stats)
    return var, matched


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path: str):
    """Read a torch checkpoint file into a numpy state dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict_ema" in ckpt:
        sd = ckpt["state_dict_ema"]
    elif "model" in ckpt:
        sd = ckpt["model"]
    elif "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
