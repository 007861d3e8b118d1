"""Independent torch oracle for exact SLANet golden parity.

Implements the PaddleOCR SLANet topology (PP-LCNet v1 backbone → CSPPAN
neck → SLAHead attention-GRU decoder) in torch with module attribute
names equal to the official Paddle paths, mirroring the reference's
consumed checkpoint (oar-ocr-core/src/models/recognition/slanet.rs runs
the exported ONNX of this exact graph). Used only by
tests/test_slanet_parity.py; NOT a dependency of the package.

Layout/semantics notes:
- torch.nn.GRUCell matches paddle.nn.GRUCell bit-for-bit: parameter names
  (weight_ih/weight_hh/bias_ih/bias_hh), (3H, in) layout, gate order
  (r, z, c), h' = (1−z)·c + z·h — exported without transpose;
- nn.Linear weights transpose to paddle (in, out) via paddle_state_dict;
- upsampling targets the skip's exact size (488 px does not halve evenly
  through the pyramid).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tools.torch_ref import paddle_state_dict, seed_all  # noqa: F401


def make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardsigmoid_paddle(x):
    return torch.clamp(x * 0.2 + 0.5, 0.0, 1.0)


PPLCNET_V1_CONFIG = {
    "blocks2": [(3, 16, 32, 1, False)],
    "blocks3": [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    "blocks4": [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    "blocks5": [(3, 128, 256, 2, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False)],
    "blocks6": [(5, 256, 512, 2, True), (5, 512, 512, 1, True)],
}


class ConvBNHS(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride, k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return F.hardswish(self.bn(self.conv(x)))


class SEModule(nn.Module):
    def __init__(self, c, reduction=4):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c // reduction, 1)
        self.conv2 = nn.Conv2d(c // reduction, c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.relu(self.conv1(s))
        return x * hardsigmoid_paddle(self.conv2(s))


class DepthwiseSeparable(nn.Module):
    def __init__(self, in_c, out_c, k, stride, use_se):
        super().__init__()
        self.dw_conv = ConvBNHS(in_c, in_c, k, stride, groups=in_c)
        if use_se:
            self.se = SEModule(in_c)
        self.use_se = use_se
        self.pw_conv = ConvBNHS(in_c, out_c, 1)

    def forward(self, x):
        x = self.dw_conv(x)
        if self.use_se:
            x = self.se(x)
        return self.pw_conv(x)


class PPLCNetTable(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        ch = lambda c: make_divisible(c * scale)
        self.conv1 = ConvBNHS(3, ch(16), 3, 2)
        for stage, cfg in PPLCNET_V1_CONFIG.items():
            setattr(self, stage, nn.ModuleList([
                DepthwiseSeparable(ch(i), ch(o), k, s, se)
                for (k, i, o, s, se) in cfg]))

    def forward(self, x) -> List[torch.Tensor]:
        x = self.conv1(x)
        feats = []
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5",
                      "blocks6"):
            for blk in getattr(self, stage):
                x = blk(x)
            if stage != "blocks2":
                feats.append(x)
        return feats


class CSPConvBN(nn.Module):
    def __init__(self, in_c, out_c, k=1, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return F.hardswish(self.bn(self.conv(x)))


class DPModule(nn.Module):
    def __init__(self, c, k=3, stride=1):
        super().__init__()
        self.dwconv = nn.Conv2d(c, c, k, stride, k // 2, groups=c,
                                bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.pwconv = nn.Conv2d(c, c, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)

    def forward(self, x):
        x = F.hardswish(self.bn1(self.dwconv(x)))
        return F.hardswish(self.bn2(self.pwconv(x)))


class DarknetBottleneck(nn.Module):
    def __init__(self, c, k=5):
        super().__init__()
        self.conv1 = CSPConvBN(c, c, 1)
        self.conv2 = DPModule(c, k)

    def forward(self, x):
        return x + self.conv2(self.conv1(x))


class CSPLayer(nn.Module):
    def __init__(self, in_c, out_c, k=5, num_blocks=1):
        super().__init__()
        mid = out_c // 2
        self.main_conv = CSPConvBN(in_c, mid, 1)
        self.short_conv = CSPConvBN(in_c, mid, 1)
        self.final_conv = CSPConvBN(2 * mid, out_c, 1)
        self.blocks = nn.Sequential(*[DarknetBottleneck(mid, k)
                                      for _ in range(num_blocks)])

    def forward(self, x):
        short = self.short_conv(x)
        main = self.blocks(self.main_conv(x))
        return self.final_conv(torch.cat([main, short], 1))


class ChannelT(nn.Module):
    def __init__(self, in_channels, out_c):
        super().__init__()
        self.convs = nn.ModuleList(
            [CSPConvBN(c, out_c, 1) for c in in_channels])

    def forward(self, feats):
        return [conv(f) for conv, f in zip(self.convs, feats)]


class CSPPAN(nn.Module):
    def __init__(self, in_channels, out_c=96, k=5):
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

    def forward(self, feats):
        feats = self.conv_t(feats)
        inner = [feats[-1]]
        for idx in range(self.n - 1, 0, -1):
            low = feats[idx - 1]
            up = F.interpolate(inner[0], size=low.shape[2:],
                               mode="nearest")
            inner.insert(0, self.top_down_blocks[self.n - 1 - idx](
                torch.cat([up, low], 1)))
        outs = [inner[0]]
        for idx in range(self.n - 1):
            down = self.downsamples[idx](outs[-1])
            outs.append(self.bottom_up_blocks[idx](
                torch.cat([down, inner[idx + 1]], 1)))
        return outs


class AttentionGRUCell(nn.Module):
    def __init__(self, input_size, hidden_size, num_embeddings):
        super().__init__()
        self.i2h = nn.Linear(input_size, hidden_size, bias=False)
        self.h2h = nn.Linear(hidden_size, hidden_size)
        self.score = nn.Linear(hidden_size, 1, bias=False)
        self.rnn = nn.GRUCell(input_size + num_embeddings, hidden_size)

    def forward(self, prev_hidden, batch_H, char_onehots):
        e = self.score(torch.tanh(
            self.i2h(batch_H) + self.h2h(prev_hidden).unsqueeze(1)))
        alpha = F.softmax(e, dim=1)
        context = (alpha * batch_H).sum(1)
        return self.rnn(torch.cat([context, char_onehots], 1), prev_hidden)


class SLAHead(nn.Module):
    def __init__(self, in_channels, hidden_size, out_channels,
                 max_text_length=500, loc_reg_num=8):
        super().__init__()
        self.hidden_size = hidden_size
        self.out_channels = out_channels
        self.max_text_length = max_text_length
        self.structure_attention_cell = AttentionGRUCell(
            in_channels, hidden_size, out_channels)
        self.structure_generator = nn.Sequential(
            nn.Linear(hidden_size, hidden_size),
            nn.Linear(hidden_size, out_channels))
        self.loc_generator = nn.Sequential(
            nn.Linear(hidden_size, hidden_size),
            nn.Linear(hidden_size, loc_reg_num))

    def forward(self, fea):
        b, c = fea.shape[0], fea.shape[1]
        fea = fea.reshape(b, c, -1).permute(0, 2, 1)      # B, L, C
        hidden = fea.new_zeros((b, self.hidden_size))
        chars = torch.zeros(b, dtype=torch.long)          # SOS = 0
        structs, locs = [], []
        for _ in range(self.max_text_length + 1):
            onehot = F.one_hot(chars, self.out_channels).to(fea.dtype)
            hidden = self.structure_attention_cell(hidden, fea, onehot)
            s = self.structure_generator(hidden)
            locs.append(torch.sigmoid(self.loc_generator(hidden)))
            structs.append(s)
            chars = s.argmax(-1)
        return torch.stack(structs, 1), torch.stack(locs, 1)


class SLANet(nn.Module):
    def __init__(self, vocab_size=50, scale=1.0, neck_channels=96,
                 hidden_size=256, max_text_length=500, loc_reg_num=8):
        super().__init__()
        ch = lambda c: make_divisible(c * scale)
        self.backbone = PPLCNetTable(scale)
        self.neck = CSPPAN([ch(64), ch(128), ch(256), ch(512)],
                           neck_channels)
        self.head = SLAHead(neck_channels, hidden_size, vocab_size,
                            max_text_length, loc_reg_num)

    def forward(self, x):
        outs = self.neck(self.backbone(x))
        return self.head(outs[-1])


def export(model: nn.Module) -> Dict[str, np.ndarray]:
    return paddle_state_dict(model)


class PPLCNetCls(nn.Module):
    """PaddleClas PULC classifier head on the v1 trunk (doc/textline
    orientation, table cls — pp_lcnet.rs's consumed checkpoints)."""

    def __init__(self, class_num, scale=1.0, class_expand=1280):
        super().__init__()
        ch = lambda c: make_divisible(c * scale)
        self.conv1 = ConvBNHS(3, ch(16), 3, 2)
        for stage, cfg in PPLCNET_V1_CONFIG.items():
            setattr(self, stage, nn.ModuleList([
                DepthwiseSeparable(ch(i), ch(o), k, s, se)
                for (k, i, o, s, se) in cfg]))
        self.last_conv = nn.Conv2d(ch(512), class_expand, 1, bias=False)
        self.fc = nn.Linear(class_expand, class_num)

    def forward(self, x):
        x = self.conv1(x)
        for stage in ("blocks2", "blocks3", "blocks4", "blocks5",
                      "blocks6"):
            for blk in getattr(self, stage):
                x = blk(x)
        x = x.mean((2, 3), keepdim=True)
        x = F.hardswish(self.last_conv(x))
        return self.fc(x.flatten(1))
