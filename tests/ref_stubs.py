"""Import the ACTUAL reference torch code from /root/reference.

The reference depends on mmcv/mmengine, which are not installed in this
image. The handful of symbols its live model path touches are small,
well-specified nn bricks; this module installs faithful stand-ins into
sys.modules before putting /root/reference on sys.path, so that
`models/encoders/DFormer.py`, `models/builder.py`, the decoder heads and
`utils/val_mm.py` run UNMODIFIED as parity oracles.

Stubbed symbols (and their mmcv/mmengine contracts):
  * mmcv.cnn.build_norm_layer(cfg, C) -> ("bn", BatchNorm2d(C)) for
    type BN/SyncBN (SyncBN == BN numerically outside distributed training).
  * mmcv.cnn.ConvModule: conv -> norm -> act in default order, bias="auto"
    (bias iff no norm), norm module registered under attribute name "bn",
    default act ReLU — matches mmcv state_dict keys (conv.*, bn.*).
  * mmcv.cnn.bricks.transformer.build_dropout: DropPath (stochastic depth,
    timm semantics) / Dropout; FFN is imported by DFormer.py but never used.
  * mmengine.model.base_module.BaseModule: nn.Module + init_cfg attr.
  * mmengine.runner.checkpoint.load_state_dict: non-strict delegate.

mmseg resolves to the reference's own vendored copy (only mmseg.ops.resize
is touched, which is pure torch — SURVEY.md §2.8).
"""

import importlib
import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference"


def _norm_from_cfg(norm_cfg, num_features):
    assert norm_cfg["type"] in ("BN", "SyncBN"), norm_cfg
    return nn.BatchNorm2d(num_features)


def build_norm_layer(cfg, num_features):
    return "bn", _norm_from_cfg(cfg, num_features)


class DropPath(nn.Module):
    """Per-sample stochastic depth (mmcv DropPath contract)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = torch.rand(shape, dtype=x.dtype, device=x.device)
        mask = mask.add_(keep).floor_()
        return x / keep * mask


def build_dropout(cfg):
    if cfg is None:
        return nn.Identity()
    if cfg["type"] == "DropPath":
        return DropPath(cfg.get("drop_prob", 0.0))
    if cfg["type"] == "Dropout":
        return nn.Dropout(cfg.get("drop_prob", 0.0))
    raise KeyError(cfg["type"])


class ConvModule(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"), **kwargs):
        super().__init__()
        if bias == "auto":
            bias = norm_cfg is None
        self.norm_cfg = norm_cfg  # mmcv exposes this (read by _NonLocalNd)
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride,
                              padding, dilation, groups, bias=bias)
        self.with_norm = norm_cfg is not None
        if self.with_norm:
            self.bn = _norm_from_cfg(norm_cfg, out_channels)
        self.with_act = act_cfg is not None
        if self.with_act:
            assert act_cfg["type"] == "ReLU", act_cfg
            self.activate = nn.ReLU(inplace=True)

    @property
    def norm(self):
        return self.bn if self.with_norm else None

    def forward(self, x):
        x = self.conv(x)
        if self.with_norm:
            x = self.bn(x)
        if self.with_act:
            x = self.activate(x)
        return x


class FFN(nn.Module):
    """Imported by DFormer.py but never instantiated."""


class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):  # pragma: no cover - runner hook, unused here
        pass


def load_state_dict(module, state_dict, strict=False, logger=None):
    module.load_state_dict(state_dict, strict=strict)


def constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    if "mmcv" in sys.modules:
        return
    mmcv = _mod("mmcv", __version__="1.7.0")
    cnn = _mod("mmcv.cnn", build_norm_layer=build_norm_layer,
               ConvModule=ConvModule)
    bricks = _mod("mmcv.cnn.bricks")
    transformer = _mod("mmcv.cnn.bricks.transformer", FFN=FFN,
                       build_dropout=build_dropout)
    cnn_utils = _mod("mmcv.cnn.utils", constant_init=constant_init,
                     normal_init=normal_init)
    mmcv.cnn = cnn
    cnn.bricks = bricks
    cnn.utils = cnn_utils
    bricks.transformer = transformer

    mmengine = _mod("mmengine")
    model = _mod("mmengine.model")
    base_module = _mod("mmengine.model.base_module", BaseModule=BaseModule)
    runner = _mod("mmengine.runner")
    checkpoint = _mod("mmengine.runner.checkpoint",
                      load_state_dict=load_state_dict)
    mmengine.model = model
    model.base_module = base_module
    mmengine.runner = runner
    runner.checkpoint = checkpoint


_cache = {}


def load_reference():
    """Import the reference's torch modules (cached). Returns a namespace
    with DFormer, builder, val_mm, metrics_new as attributes."""
    if _cache:
        return _cache["ns"]
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    ns = types.SimpleNamespace(
        DFormer=importlib.import_module("models.encoders.DFormer"),
        builder=importlib.import_module("models.builder"),
        val_mm=importlib.import_module("utils.val_mm"),
        metrics_new=importlib.import_module("utils.metrics_new"),
    )
    _cache["ns"] = ns
    return ns


def _unwrap_backbone(model):
    """The fork's DFormer.forward returns `(outs, None)` (DFormer.py:305)
    while every decode head indexes the per-stage feature list directly —
    the stock RGBD path as committed crashes on the tuple.
    (DFormerTrav.forward returns plain `outs`, DFormer.py:457, which is what
    the fork actually runs.) Shadow the bound forward to restore the
    upstream contract so the stock reference model is runnable as an
    oracle; state_dict keys are untouched. The TPU rebuild implements the
    working (list-returning) semantics."""
    orig = model.encoder_backbone.forward

    def fwd(x, x_e):
        out = orig(x, x_e)
        return out[0] if isinstance(out, tuple) else out

    model.encoder_backbone.forward = fwd


def build_reference_model(cfg, unwrap=True):
    """Build the reference EncoderDecoder in eval mode on CPU.

    A criterion is passed (as utils/train.py:180-191 and eval.py:75-86 do)
    so that init_weights runs and sets the head BN eps/momentum to
    cfg.bn_eps/cfg.bn_momentum (builder.py:185-189) — eval parity depends
    on that eps. cfg.pretrained_model must be None (no load)."""
    ns = load_reference()
    model = ns.builder.EncoderDecoder(
        cfg=cfg,
        criterion=nn.CrossEntropyLoss(reduction="none",
                                      ignore_index=cfg.background),
        norm_layer=nn.BatchNorm2d, syncbn=False)
    if unwrap:
        _unwrap_backbone(model)
    model.eval()
    return model
