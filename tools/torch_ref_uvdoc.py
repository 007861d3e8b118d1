"""Torch oracle for the UVDoc rectification network.

Independent PyTorch mirror of the public UVDoc architecture
(tanguymagne/UVDoc / DDCP lineage — see
oar_ocr_tpu/models/rectification/uvdoc_exact.py): 5×5 head, dilated
residual encoder to stride 16, six dilated bridge branches, dual point
heads.
"""

import torch
import torch.nn.functional as F
from torch import nn

BRIDGE_DILATIONS = ((1,), (2,), (5,), (8, 3, 2), (12, 7, 4), (18, 12, 6))


class ConvBNRelu(nn.Module):
    def __init__(self, in_c, out_c, k=5, stride=1, dilation=1):
        super().__init__()
        p = dilation * (k // 2)
        self.conv = nn.Conv2d(in_c, out_c, k, stride, p, dilation=dilation)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class ResidualBlock(nn.Module):
    def __init__(self, in_c, out_c, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, out_c, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_c)
        self.conv2 = nn.Conv2d(out_c, out_c, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_c)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_c, out_c, 1, stride, bias=False),
                nn.BatchNorm2d(out_c))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        s = self.downsample(x) if self.downsample is not None else x
        return F.relu(s + h)


class PointHead(nn.Module):
    def __init__(self, in_c, mid, out_c):
        super().__init__()
        self.conv = ConvBNRelu(in_c, mid, 3)
        self.proj = nn.Conv2d(mid, out_c, 3, 1, 1)

    def forward(self, x):
        return self.proj(self.conv(x))


class UVDocTorch(nn.Module):
    def __init__(self, num_filter=32, block_nums=(3, 4)):
        super().__init__()
        nf = num_filter
        self.head0 = ConvBNRelu(3, nf, 5, 2)
        self.head1 = ConvBNRelu(nf, nf, 5, 1)
        self.head2 = ConvBNRelu(nf, nf * 2, 5, 2)
        self.layer1 = nn.ModuleList(
            [ResidualBlock(nf * 2 if i == 0 else nf * 4, nf * 4,
                           2 if i == 0 else 1)
             for i in range(block_nums[0])])
        self.layer2 = nn.ModuleList(
            [ResidualBlock(nf * 4 if i == 0 else nf * 8, nf * 8,
                           2 if i == 0 else 1)
             for i in range(block_nums[1])])
        self.bridges = nn.ModuleList()
        for dils in BRIDGE_DILATIONS:
            mods = []
            c = nf * 8
            for d in dils:
                mods.append(ConvBNRelu(c, nf * 8, 3, 1, d))
                c = nf * 8
            self.bridges.append(nn.Sequential(*mods))
        self.bridge_concat = ConvBNRelu(6 * nf * 8, nf * 8, 1)
        self.head2d = PointHead(nf * 8, nf * 4, 2)
        self.head3d = PointHead(nf * 8, nf * 4, 3)

    def forward(self, x):
        x = self.head2(self.head1(self.head0(x)))
        for blk in self.layer1:
            x = blk(x)
        for blk in self.layer2:
            x = blk(x)
        x = torch.cat([b(x) for b in self.bridges], 1)
        x = self.bridge_concat(x)
        return (self.head2d(x).clamp(-1.0, 1.0), self.head3d(x))


def export(model: UVDocTorch):
    """torch state dict → the flax attribute paths of UVDocNetExact."""
    ren = {
        "head0.": "resnet_head.0.",
        "head1.": "resnet_head.1.",
        "head2.": "resnet_head.2.",
        "layer1.": "resnet_down.layer1.",
        "layer2.": "resnet_down.layer2.",
        "bridge_concat.": "bridge_concat.",
        "head2d.": "out_point_positions2D.",
        "head3d.": "out_point_positions3D.",
    }
    out = {}
    for k, v in model.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        for i in range(6):
            k = k.replace(f"bridges.{i}.", f"bridge_{i + 1}.")
        for a, b in ren.items():
            if k.startswith(a):
                k = b + k[len(a):]
                break
        k = k.replace("downsample.0.", "downsample.conv.")
        k = k.replace("downsample.1.", "downsample.bn.")
        k = k.replace("running_mean", "_mean").replace(
            "running_var", "_variance")
        out[k] = v.detach().numpy()
    return out
