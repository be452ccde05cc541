"""Compact torch oracle models for parity testing.

These implement the *published architectures* (simple-baselines PoseResNet and
V2V-PoseNet U-Net) with torch layers, producing state dicts whose names match
the reference checkpoints, so converter + flax model can be validated
end-to-end against a live torch forward pass.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=0.1)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes, momentum=0.1)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, momentum=0.1)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout, momentum=0.1),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class TorchPoseResNet(nn.Module):
    """ResNet-50 + 3 deconv + final 1x1, state-dict-compatible with the
    reference checkpoints."""

    def __init__(self, num_joints=15, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, momentum=0.1)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for si, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
            layers = []
            for b in range(n):
                stride = (1 if si == 0 else 2) if b == 0 else 1
                layers.append(TorchBottleneck(cin, planes, stride))
                cin = planes * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*layers))
        deconvs = []
        for _ in range(3):
            deconvs += [
                nn.ConvTranspose2d(cin, 256, 4, 2, 1, bias=False),
                nn.BatchNorm2d(256, momentum=0.1),
                nn.ReLU(inplace=True),
            ]
            cin = 256
        self.deconv_layers = nn.Sequential(*deconvs)
        self.final_layer = nn.Conv2d(256, num_joints, 1)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.final_layer(self.deconv_layers(x))


def _res3d(cin, cout):
    m = nn.Module()
    m.res_branch = nn.Sequential(
        nn.Conv3d(cin, cout, 3, 1, 1),
        nn.BatchNorm3d(cout),
        nn.ReLU(True),
        nn.Conv3d(cout, cout, 3, 1, 1),
        nn.BatchNorm3d(cout),
    )
    m.skip_con = (
        nn.Sequential()
        if cin == cout
        else nn.Sequential(nn.Conv3d(cin, cout, 1), nn.BatchNorm3d(cout))
    )
    m.forward = lambda x: F.relu(m.res_branch(x) + (m.skip_con(x) if len(m.skip_con) else x))
    return m


def _up3d(cin, cout):
    m = nn.Module()
    m.block = nn.Sequential(
        nn.ConvTranspose3d(cin, cout, 2, 2, 0), nn.BatchNorm3d(cout), nn.ReLU(True)
    )
    m.forward = lambda x: m.block(x)
    return m


class TorchV2V(nn.Module):
    """V2V-PoseNet U-Net, state-dict-compatible with reference checkpoints."""

    def __init__(self, cin, cout):
        super().__init__()
        basic = nn.Module()
        basic.block = nn.Sequential(
            nn.Conv3d(cin, 16, 7, 1, 3), nn.BatchNorm3d(16), nn.ReLU(True)
        )
        basic.forward = lambda x: basic.block(x)
        self.front_layers = nn.Sequential(basic, _res3d(16, 32))
        ed = nn.Module()
        ed.skip_res1 = _res3d(32, 32)
        ed.encoder_res1 = _res3d(32, 64)
        ed.skip_res2 = _res3d(64, 64)
        ed.encoder_res2 = _res3d(64, 128)
        ed.mid_res = _res3d(128, 128)
        ed.decoder_res2 = _res3d(128, 128)
        ed.decoder_upsample2 = _up3d(128, 64)
        ed.decoder_res1 = _res3d(64, 64)
        ed.decoder_upsample1 = _up3d(64, 32)

        def ed_forward(x):
            s1 = ed.skip_res1(x)
            x = ed.encoder_res1(F.max_pool3d(x, 2))
            s2 = ed.skip_res2(x)
            x = ed.encoder_res2(F.max_pool3d(x, 2))
            x = ed.decoder_res2(ed.mid_res(x))
            x = ed.decoder_upsample2(x) + s2
            x = ed.decoder_res1(x)
            return ed.decoder_upsample1(x) + s1

        ed.forward = ed_forward
        self.encoder_decoder = ed
        self.output_layer = nn.Conv3d(32, cout, 1)

    def forward(self, x):
        return self.output_layer(self.encoder_decoder(self.front_layers(x)))
