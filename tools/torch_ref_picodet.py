"""Torch oracle for the exact PicoDet layout detector.

Independent PyTorch mirror of PaddleDetection's
``picodet_lcnet_x{s}_layout`` deploy architecture (lcnet.py + csp_pan.py
num_features=4 + pico_head.py PicoFeat/PicoHead share_cls_reg=True),
reusing the LCNet-v1/CSP-PAN blocks already validated by the SLANet
oracle (tools/torch_ref_slanet.py). ``paddle_state_dict`` emits the
deploy attribute paths the conversion map consumes.
"""

from typing import List

import torch
import torch.nn.functional as F
from torch import nn

from tools.torch_ref_slanet import (CSPConvBN, ChannelT, CSPLayer,
                                    DPModule, PPLCNetTable)


class LCNetPico(nn.Module):
    """feature_maps [3,4,5] → blocks4/5/6 outputs (strides 8/16/32)."""

    def __init__(self, scale=1.0):
        super().__init__()
        self.trunk = PPLCNetTable(scale)

    def forward(self, x) -> List[torch.Tensor]:
        return self.trunk(x)[1:]      # drop the blocks3 (stride-4) map


class PicoCSPPAN(nn.Module):
    def __init__(self, in_channels, out_c=128, k=5):
        super().__init__()
        n = len(in_channels)
        self.n = n
        self.conv_t = ChannelT(in_channels, out_c)
        self.top_down_blocks = nn.ModuleList(
            [CSPLayer(2 * out_c, out_c, k) for _ in range(n - 1)])
        self.downsamples = nn.ModuleList(
            [DPModule(out_c, k, stride=2) for _ in range(n - 1)])
        self.bottom_up_blocks = nn.ModuleList(
            [CSPLayer(2 * out_c, out_c, k) for _ in range(n - 1)])
        self.first_top_conv = DPModule(out_c, k, stride=2)
        self.second_top_conv = DPModule(out_c, k, stride=2)

    def forward(self, feats):
        lats = self.conv_t(feats)
        inner = [lats[-1]]
        for idx in range(self.n - 1, 0, -1):
            low = lats[idx - 1]
            up = F.interpolate(inner[0], size=low.shape[2:], mode="nearest")
            inner.insert(0, self.top_down_blocks[self.n - 1 - idx](
                torch.cat([up, low], 1)))
        outs = [inner[0]]
        for idx in range(self.n - 1):
            down = self.downsamples[idx](outs[-1])
            outs.append(self.bottom_up_blocks[idx](
                torch.cat([down, inner[idx + 1]], 1)))
        outs.append(self.first_top_conv(lats[-1])
                    + self.second_top_conv(outs[-1]))
        return outs


class ConvNormLayer(nn.Module):
    def __init__(self, in_c, out_c, k, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, 1, k // 2, groups=groups,
                              bias=False)
        self.norm = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return self.norm(self.conv(x))


class PicoFeat(nn.Module):
    def __init__(self, feat, num_convs, num_levels):
        super().__init__()
        self.num_convs = num_convs
        for s in range(num_levels):
            for i in range(num_convs):
                setattr(self, f"cls_conv_dw{s}.{i}".replace(".", "_DOT_"),
                        ConvNormLayer(feat, feat, 5, groups=feat))
                setattr(self, f"cls_conv_pw{s}.{i}".replace(".", "_DOT_"),
                        ConvNormLayer(feat, feat, 1))

    def forward(self, x, stage):
        for i in range(self.num_convs):
            x = F.hardswish(getattr(
                self, f"cls_conv_dw{stage}_DOT_{i}")(x))
            x = F.hardswish(getattr(
                self, f"cls_conv_pw{stage}_DOT_{i}")(x))
        return x


class PicoDetTorch(nn.Module):
    def __init__(self, num_classes, scale=1.0, neck_feat=128,
                 head_convs=4, reg_max=7, strides=(8, 16, 32, 64),
                 cell_offset=0.5):
        super().__init__()
        self.num_classes = num_classes
        self.reg_max = reg_max
        self.strides = strides
        self.cell_offset = cell_offset
        self.backbone = LCNetPico(scale)
        from tools.torch_ref_slanet import make_divisible

        chans = [make_divisible(c * scale) for c in (128, 256, 512)]
        self.neck = PicoCSPPAN(chans, neck_feat)
        self.conv_feat = PicoFeat(neck_feat, head_convs, len(strides))
        self.head_cls = nn.ModuleList([
            nn.Conv2d(neck_feat, num_classes + 4 * (reg_max + 1), 1)
            for _ in strides])

    def forward(self, x):
        feats = self.neck(self.backbone(x))
        all_scores, all_boxes = [], []
        for level, f in enumerate(feats):
            h = self.conv_feat(f, level)
            out = self.head_cls[level](h)
            cls = out[:, : self.num_classes]
            reg = out[:, self.num_classes:]
            b, _, hh, ww = cls.shape
            stride = self.strides[level]
            scores = torch.sigmoid(cls).permute(0, 2, 3, 1).reshape(
                b, hh * ww, self.num_classes)
            reg = reg.permute(0, 2, 3, 1).reshape(
                b, hh * ww, 4, self.reg_max + 1)
            bins = torch.arange(self.reg_max + 1, dtype=torch.float32)
            ltrb = (reg.softmax(-1) * bins).sum(-1) * stride
            cx = (torch.arange(ww, dtype=torch.float32)
                  + self.cell_offset) * stride
            cy = (torch.arange(hh, dtype=torch.float32)
                  + self.cell_offset) * stride
            gy, gx = torch.meshgrid(cy, cx, indexing="ij")
            centers = torch.stack([gx, gy], -1).reshape(1, hh * ww, 2)
            boxes = torch.cat([centers - ltrb[..., 0:2],
                               centers + ltrb[..., 2:4]], -1)
            all_scores.append(scores)
            all_boxes.append(boxes.expand(b, -1, -1))
        return (torch.cat(all_scores, 1), torch.cat(all_boxes, 1))


def export(model: PicoDetTorch):
    """torch state dict → deploy names: backbone trunk attributes under
    ``backbone.``, neck under ``neck.``, head convs under
    ``head.conv_feat.`` / ``head.head_cls{i}.`` (pico_head.py
    add_sublayer names) — BN running stats as ``._mean``/``._variance``
    per the Paddle convention (tools/torch_ref.paddle_state_dict)."""
    from tools.torch_ref import paddle_state_dict

    out = {}
    for k, v in paddle_state_dict(model).items():
        k = k.replace("backbone.trunk.", "backbone.")
        k = k.replace("_DOT_", ".")
        k = k.replace("conv_feat.", "head.conv_feat.")
        if k.startswith("head_cls."):
            k = "head.head_cls" + k[len("head_cls."):]
        out[k] = v
    return out
