"""Model assembly: backbone + decode head (+ optional FCN aux head), plus the
few-shot prototype forward (reference models/builder.py:91-320).

The module's `__call__` returns full-resolution logits (bilinearly upsampled
with align_corners=False, reference builder.py:203); the masked-CE loss is a
pure function applied by the train step (ops/loss.py), not baked into the
module. `forward_with_aux` additionally returns the auxiliary head logits for
decoders that attach one (ham with aux_rate!=0; UPernet / deeplabv3+ / nl at
rate 0.4, builder.py:138-169).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from dformer_tpu.models.decoders import (DeepLabV3Plus, FCNHead, LightHamHead,
                                         MLPDecoderHead, NLHead, UPerHead)
from dformer_tpu.models.encoder import VARIANTS, DFormer
from dformer_tpu.models.trav import DFormerTrav
from dformer_tpu.ops.resize import resize_bilinear


class EncoderDecoder(fnn.Module):
    backbone: str = "DFormer-Large"
    decoder: str = "ham"
    num_classes: int = 40
    decoder_embed_dim: int = 512
    drop_path_rate: float = 0.1
    aux_rate: float = 0.0
    bn_eps: float = 1e-3
    bn_momentum: float = 0.1
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None
    # False = full backprop through the unrolled NMF updates, matching the
    # fork's commented-out @torch.no_grad (ham_head.py:45); True = HamNet
    # one-step gradient (documented intentional divergence, README.md)
    nmf_one_step_grad: bool = True
    # FSS fusion knobs (reference builder.py:297-303)
    temperature: float = 1.0
    alpha: float = 0.5
    image_hw: Tuple[int, int] = (480, 640)
    use_pallas: bool = False

    def setup(self):
        if self.backbone == "DFormerTrav-Base":
            self.encoder_backbone = DFormerTrav(
                drop_path_rate=self.drop_path_rate,
                expand_hw=tuple(self.image_hw),
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                use_pallas=self.use_pallas)
        else:
            spec = VARIANTS[self.backbone]
            self.encoder_backbone = DFormer(
                drop_path_rate=self.drop_path_rate,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                use_pallas=self.use_pallas, **spec)

        head_kw = dict(num_classes=self.num_classes, bn_eps=self.bn_eps,
                       bn_momentum=self.bn_momentum,
                       bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        aux = False
        if self.decoder == "ham":
            self.decode_head = LightHamHead(
                in_index=(1, 2, 3), channels=self.decoder_embed_dim,
                one_step_grad=self.nmf_one_step_grad, **head_kw)
            aux = self.aux_rate != 0
        elif self.decoder == "MLPDecoder":
            self.decode_head = MLPDecoderHead(
                embed_dim=self.decoder_embed_dim, **head_kw)
        elif self.decoder == "UPernet":
            self.decode_head = UPerHead(channels=512, **head_kw)
        elif self.decoder == "deeplabv3+":
            self.decode_head = DeepLabV3Plus(**head_kw)
        elif self.decoder == "nl":
            self.decode_head = NLHead(in_index=(1, 2, 3), channels=512, **head_kw)
        else:  # FCN-32s fallback (builder.py:171-174)
            self.decode_head = FCNHead(kernel_size=3, **head_kw)
        if aux or self.decoder in ("UPernet", "deeplabv3+", "nl"):
            self.aux_head = FCNHead(**head_kw)
            self.aux_index = 2
        else:
            self.aux_head = None

    def encode(self, rgb, modal_x, train: bool = False):
        return self.encoder_backbone(rgb, modal_x, train)

    def decode(self, features, out_hw, train: bool = False,
               deterministic_bases: bool = True):
        out = self.decode_head(features, train=train,
                               deterministic_bases=deterministic_bases)
        # bf16 model path: MXU-native one-pass logits upsample (the fp32
        # HIGHEST emulation + its 393 MB f32 intermediate cost ~1 ms/iter
        # at 480x640 bs8); fp32 parity eval keeps the exact form
        return resize_bilinear(out, out_hw, align_corners=False,
                               fast_bf16=self.dtype == jnp.bfloat16)

    def __call__(self, rgb, modal_x, train: bool = False,
                 deterministic_bases: bool = True):
        """rgb: [B,H,W,3]; modal_x: [B,H,W,C] image modality or [B,360] lidar.
        Returns [B,H,W,num_classes] logits at input resolution."""
        features = self.encode(rgb, modal_x, train)
        return self.decode(features, rgb.shape[1:3], train, deterministic_bases)

    def forward_with_aux(self, rgb, modal_x, train: bool = False,
                         deterministic_bases: bool = True):
        features = self.encode(rgb, modal_x, train)
        out = self.decode(features, rgb.shape[1:3], train, deterministic_bases)
        aux = None
        if self.aux_head is not None:
            aux = self.aux_head(features[self.aux_index], train=train)
            aux = resize_bilinear(aux, rgb.shape[1:3], align_corners=False)
        return out, aux

    # ---- Few-shot segmentation (reference builder.py:237-320) ----

    def _masked_proto(self, feat, mask):
        """feat: [N,h,w,C]; mask: [N,h,w] binary -> [N, C] prototypes."""
        m = mask[..., None].astype(feat.dtype)
        return jnp.sum(feat * m, axis=(1, 2)) / (jnp.sum(m, axis=(1, 2)) + 1e-5)

    def meta_forward(self, s_rgb, s_depth, s_mask, q_rgb, q_depth,
                     train: bool = False, deterministic_bases: bool = True,
                     return_episode: bool = False):
        """1-way few-shot episode forward.

        s_rgb: [B,S,H,W,3]; s_depth: [B,S,...] lidar or depth; s_mask: [B,S,H,W];
        q_rgb: [B,H,W,3]; q_depth: [B,...]. Returns fused [B,H,W,2] logits;
        with return_episode=True also the episode internals (query top-stage
        features + bg/fg prototypes) for the contrastive prototype loss
        (reference ContrastiveLoss, builder.py:61-88).
        """
        B, S = s_rgb.shape[0], s_rgb.shape[1]
        H, W = q_rgb.shape[1:3]
        all_rgb = jnp.concatenate(
            [s_rgb.reshape((B * S,) + s_rgb.shape[2:]), q_rgb], axis=0)
        all_depth = jnp.concatenate(
            [s_depth.reshape((B * S,) + s_depth.shape[2:]), q_depth], axis=0)

        feats = self.encode(all_rgb, all_depth, train)
        top_s, top_q = feats[-1][:B * S], feats[-1][B * S:]
        q_feats = [f[B * S:] for f in feats]

        # fg/bg prototypes on a mask resized to the top-stage grid
        hw = top_s.shape[1:3]
        m = resize_bilinear(s_mask.reshape(B * S, *s_mask.shape[2:])[..., None]
                            .astype(jnp.float32), hw)[..., 0]
        fg = self._masked_proto(top_s, (m == 1)).reshape(B, S, -1).mean(axis=1)
        bg = self._masked_proto(top_s, (m == 0)).reshape(B, S, -1).mean(axis=1)

        def cos(feat, proto):  # feat [B,h,w,C], proto [B,C] -> [B,h,w]
            fn = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-8)
            pn = proto / (jnp.linalg.norm(proto, axis=-1, keepdims=True) + 1e-8)
            return jnp.einsum("bhwc,bc->bhw", fn, pn) * 20.0

        sim = jnp.stack([cos(top_q, bg), cos(top_q, fg)], axis=-1)
        sim = jax.nn.softmax(sim / self.temperature, axis=-1)
        sim = resize_bilinear(sim, (H, W), align_corners=False)

        logits = self.decode(q_feats, (H, W), train, deterministic_bases)
        fused = self.alpha * logits + (1.0 - self.alpha) * sim
        if return_episode:
            return fused, dict(q_top=top_q, fg=fg, bg=bg)
        return fused


def build_model(cfg, bn_axis_name=None, dtype=None,
                pallas: str = "auto") -> EncoderDecoder:
    """Construct an EncoderDecoder from a local_configs-style config.

    pallas: 'auto' enables the fused Pallas kernels on TPU backends,
    'on'/'off' force."""
    import jax

    if pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = pallas == "on"
    return EncoderDecoder(
        use_pallas=use_pallas,
        backbone=cfg.backbone,
        decoder=cfg.decoder,
        num_classes=cfg.num_classes,
        decoder_embed_dim=cfg.get("decoder_embed_dim", 512),
        # explicit None check: `or 0.1` silently coerced a configured 0.0
        # (droppath disabled) back to 0.1
        drop_path_rate=(0.1 if cfg.get("drop_path_rate", None) is None
                        else cfg.drop_path_rate),
        aux_rate=cfg.get("aux_rate", 0.0),
        nmf_one_step_grad=cfg.get("nmf_one_step_grad", True),
        bn_eps=cfg.get("bn_eps", 1e-3),
        bn_momentum=cfg.get("bn_momentum", 0.1),
        bn_axis_name=bn_axis_name,
        dtype=dtype,
        temperature=cfg.get("temperature", 1.0),
        alpha=cfg.get("alpha", 0.5),
        image_hw=(cfg.get("image_height", 480), cfg.get("image_width", 640)),
    )
