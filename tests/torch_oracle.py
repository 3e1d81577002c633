"""Functional torch oracle of the reference DFormer semantics, used only by
the parity tests. Re-states the math documented in SURVEY.md §2.3/§2.4
(reference models/encoders/DFormer.py, models/decoders/ham_head.py) with
reference-compatible state_dict key names so dformer_tpu.utils.convert can map
the weights; not imported by the framework itself.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class LN(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):  # channels_last
        return F.layer_norm(x, (x.shape[-1],), self.weight, self.bias, self.eps)


class OracleMLP(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        h = dim * ratio
        self.norm = LN(dim)
        self.fc1 = nn.Linear(dim, h)
        self.pos = nn.Conv2d(h, h, 3, padding=1, groups=h)
        self.fc2 = nn.Linear(h, dim)

    def forward(self, x):  # NHWC
        x = self.fc1(self.norm(x))
        x = (self.pos(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + x)
        return self.fc2(F.gelu(x))


class OracleAttention(nn.Module):
    def __init__(self, dim, num_head, window, drop_depth):
        super().__init__()
        self.num_head, self.window, self.drop_depth = num_head, window, drop_depth
        self.q = nn.Linear(dim, dim)
        self.q_cut = nn.Linear(dim, dim // 2)
        self.a = nn.Linear(dim, dim)
        self.l = nn.Linear(dim, dim)
        self.conv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.e_conv = nn.Conv2d(dim // 2, dim // 2, 7, padding=3, groups=dim // 2)
        self.e_fore = nn.Linear(dim // 2, dim // 2)
        self.e_back = nn.Linear(dim // 2, dim // 2)
        self.norm = LN(dim)
        self.norm_e = LN(dim // 2)
        if window != 0:
            self.short_cut_linear = nn.Linear(dim // 2 * 3, dim // 2)
            self.kv = nn.Linear(dim, dim)
            self.proj = nn.Linear(dim * 2, dim)
            if not drop_depth:
                self.proj_e = nn.Linear(dim * 2, dim // 2)
        else:
            self.proj = nn.Linear(dim // 2 * 3, dim)
            if not drop_depth:
                self.proj_e = nn.Linear(dim // 2 * 3, dim // 2)

    def forward(self, x, x_e):  # NHWC in/out
        B, H, W, C = x.shape
        nh = self.num_head
        hd = C // nh // 2
        x, x_e = self.norm(x), self.norm_e(x_e)
        if self.window != 0:
            sc = torch.cat([x, x_e], dim=3)
        q, cut = self.q(x), self.q_cut(x)
        t = F.gelu(self.l(x))
        a = self.a(self.conv(t.permute(0, 3, 1, 2)).permute(0, 2, 3, 1))
        if self.window != 0:
            kv = self.kv(t).reshape(B, H * W, 2, nh, hd).permute(2, 0, 3, 1, 4)
            k, v = kv.unbind(0)
            m = F.adaptive_avg_pool2d(sc.permute(0, 3, 1, 2), (7, 7))
            m = self.short_cut_linear(m.permute(0, 2, 3, 1))
            m = m.reshape(B, 49, nh, hd).permute(0, 2, 1, 3)
            attn = ((m * hd ** -0.5) @ k.transpose(-2, -1)).softmax(dim=-1)
            gaa = (attn @ v).reshape(B, nh, 7, 7, hd).permute(0, 1, 4, 2, 3)
            gaa = gaa.reshape(B, C // 2, 7, 7)
            gaa = F.interpolate(gaa, (H, W), mode="bilinear",
                                align_corners=False).permute(0, 2, 3, 1)
        x_e = self.e_back(self.e_conv(
            self.e_fore(x_e).permute(0, 3, 1, 2)).permute(0, 2, 3, 1))
        cut = cut * x_e
        x = q * a
        x = torch.cat([x, gaa, cut] if self.window != 0 else [x, cut], dim=3)
        if not self.drop_depth:
            x_e = self.proj_e(x)
        return self.proj(x), x_e


class OracleBlock(nn.Module):
    def __init__(self, dim, num_head, ratio, window, drop_depth):
        super().__init__()
        self.attn = OracleAttention(dim, num_head, window, drop_depth)
        self.mlp = OracleMLP(dim, ratio)
        self.layer_scale_1 = nn.Parameter(1e-6 * torch.ones(dim))
        self.layer_scale_2 = nn.Parameter(1e-6 * torch.ones(dim))
        self.drop_depth = drop_depth
        if not drop_depth:
            self.layer_scale_1_e = nn.Parameter(1e-6 * torch.ones(dim // 2))
            self.layer_scale_2_e = nn.Parameter(1e-6 * torch.ones(dim // 2))
            self.mlp_e2 = OracleMLP(dim // 2, ratio)

    def forward(self, x, x_e):
        rx, re = x, x_e
        x, x_e = self.attn(x, x_e)
        x = rx + self.layer_scale_1 * x
        x = x + self.layer_scale_2 * self.mlp(x)
        if not self.drop_depth:
            x_e = re + self.layer_scale_1_e * x_e
            x_e = x_e + self.layer_scale_2_e * self.mlp_e2(x_e)
        return x, x_e


class OracleDFormer(nn.Module):
    def __init__(self, dims, depths, heads, windows, ratios):
        super().__init__()
        self.downsample_layers = nn.ModuleList([nn.Sequential(
            nn.Conv2d(3, dims[0] // 2, 3, 2, 1), nn.BatchNorm2d(dims[0] // 2),
            nn.GELU(),
            nn.Conv2d(dims[0] // 2, dims[0], 3, 2, 1), nn.BatchNorm2d(dims[0]))])
        self.downsample_layers_e = nn.ModuleList([nn.Sequential(
            nn.Conv2d(1, dims[0] // 4, 3, 2, 1), nn.BatchNorm2d(dims[0] // 4),
            nn.GELU(),
            nn.Conv2d(dims[0] // 4, dims[0] // 2, 3, 2, 1),
            nn.BatchNorm2d(dims[0] // 2))])
        for i in range(3):
            self.downsample_layers.append(nn.Sequential(
                nn.BatchNorm2d(dims[i]), nn.Conv2d(dims[i], dims[i + 1], 3, 2, 1)))
            self.downsample_layers_e.append(nn.Sequential(
                nn.BatchNorm2d(dims[i] // 2),
                nn.Conv2d(dims[i] // 2, dims[i + 1] // 2, 3, 2, 1)))
        self.stages = nn.ModuleList([
            nn.ModuleList([OracleBlock(dims[i], heads[i], ratios[i], windows[i],
                                       (i == 3) and (j == depths[i] - 1))
                           for j in range(depths[i])])
            for i in range(4)])

    def forward(self, x, x_e):  # NCHW inputs like the reference
        x_e = x_e[:, 0:1]
        outs = []
        for i in range(4):
            x = self.downsample_layers[i](x)
            x_e = self.downsample_layers_e[i](x_e)
            x, x_e = x.permute(0, 2, 3, 1), x_e.permute(0, 2, 3, 1)
            for blk in self.stages[i]:
                x, x_e = blk(x, x_e)
            x, x_e = x.permute(0, 3, 1, 2), x_e.permute(0, 3, 1, 2)
            outs.append(x)
        return outs


def oracle_nmf(x, bases, steps):
    """x: [B, D, N]; bases: [B, D, R] (reference ham_head.py:46-57,120-145)."""
    coef = torch.bmm(x.transpose(1, 2), bases).softmax(dim=-1)
    for _ in range(steps):
        numer = torch.bmm(x.transpose(1, 2), bases)
        denom = coef.bmm(bases.transpose(1, 2).bmm(bases))
        coef = coef * numer / (denom + 1e-6)
        numer = torch.bmm(x, coef)
        denom = bases.bmm(coef.transpose(1, 2).bmm(coef))
        bases = bases * numer / (denom + 1e-6)
    numer = torch.bmm(x.transpose(1, 2), bases)
    denom = coef.bmm(bases.transpose(1, 2).bmm(bases))
    coef = coef * numer / (denom + 1e-6)
    return torch.bmm(bases, coef.transpose(1, 2))


class OracleHamHead(nn.Module):
    """squeeze -> ham_in -> NMF(injected bases) -> ham_out -> align -> cls."""

    def __init__(self, in_channels, ham=512, classes=40):
        super().__init__()
        self.squeeze = nn.ModuleDict(dict(
            conv=nn.Conv2d(sum(in_channels), ham, 1, bias=False),
            bn=nn.BatchNorm2d(ham)))
        self.ham_in = nn.Conv2d(ham, ham, 1)
        self.ham_out = nn.ModuleDict(dict(
            conv=nn.Conv2d(ham, ham, 1, bias=False), bn=nn.BatchNorm2d(ham)))
        self.align = nn.ModuleDict(dict(
            conv=nn.Conv2d(ham, ham, 1, bias=False), bn=nn.BatchNorm2d(ham)))
        self.conv_seg = nn.Conv2d(ham, classes, 1)

    def forward(self, feats, bases, steps=7):
        size = feats[0].shape[2:]
        feats = [F.interpolate(f, size, mode="bilinear", align_corners=False)
                 for f in feats]
        x = torch.cat(feats, dim=1)
        x = F.relu(self.squeeze["bn"](self.squeeze["conv"](x)))
        enjoy = F.relu(self.ham_in(x))
        B, D, H, W = enjoy.shape
        rec = oracle_nmf(enjoy.reshape(B, D, H * W), bases, steps)
        enjoy = self.ham_out["bn"](self.ham_out["conv"](rec.reshape(B, D, H, W)))
        x = F.relu(x + enjoy)
        x = F.relu(self.align["bn"](self.align["conv"](x)))
        return self.conv_seg(x)

    def state_dict_reference_keys(self):
        """state_dict with reference-style key names for the converter."""
        sd = {}
        for name, prefix in (("squeeze", "squeeze"),
                             ("ham_out", "hamburger.ham_out"),
                             ("align", "align")):
            mod = getattr(self, name)
            sd[f"{prefix}.conv.weight"] = mod["conv"].weight
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{prefix}.bn.{leaf}"] = getattr(mod["bn"], leaf)
        sd["hamburger.ham_in.conv.weight"] = self.ham_in.weight
        sd["hamburger.ham_in.conv.bias"] = self.ham_in.bias
        sd["conv_seg.weight"] = self.conv_seg.weight
        sd["conv_seg.bias"] = self.conv_seg.bias
        return sd


def randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
