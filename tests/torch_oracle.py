"""Compact PyTorch oracle of the reference network topology, for parity
tests only (torchvision is not available in this image, so the reference
model cannot be imported directly).

Built from torch primitives per the documented architecture (SURVEY.md
§2.4): ResNet34-OS8 backbone (stem + layer1 + layer2 + dilated 256x6 d2 +
512x3 d4 stages, skip taps) and the DeepLab ASPP decoder with two deconv
upsample stages. Module attribute names are chosen so state_dict() keys
match the reference checkpoints' layout exactly
(net.resnet.resnet.{0,1,4,5}..., net.resnet.layer{4,5}...,
net.aspp.conv_1x1_*, net.aspp.upsample_{1,2}.{0,1,3,4,6,7}, ...), which is
what `convert_reference_state_dict` consumes.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Block(nn.Module):
    """Canonical ResNet BasicBlock with dilation support."""

    def __init__(self, cin, cout, stride=1, dil=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, dil, dil, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, dil, dil, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = nn.Sequential()

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + self.downsample(x))


def _stage(cin, cout, n, stride=1, dil=1):
    mods = [Block(cin, cout, stride, dil)]
    mods += [Block(cout, cout, 1, dil) for _ in range(n - 1)]
    return nn.Sequential(*mods)


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),   # 0
            nn.BatchNorm2d(64),                       # 1
            nn.ReLU(inplace=True),                    # 2
            nn.MaxPool2d(3, 2, 1),                    # 3
            _stage(64, 64, 3),                        # 4 = layer1
            _stage(64, 128, 4, stride=2),             # 5 = layer2
        )
        # concat_decoder=True registers the SAME modules a second time
        # as skip-tap Sequentials (reference model/resnet.py:195-199) —
        # the state_dict therefore carries duplicate resnet_layer_*
        # key families, and a strict load demands them.
        ch = list(self.resnet.children())
        self.resnet_layer_1 = nn.Sequential(*ch[:3])
        self.resnet_layer_2 = nn.Sequential(*ch[3:5])
        self.resnet_layer_3 = nn.Sequential(*ch[5:6])
        self.layer4 = _stage(128, 256, 6, dil=2)
        self.layer5 = _stage(256, 512, 3, dil=4)

    def forward(self, x):
        x_128 = self.resnet[2](self.resnet[1](self.resnet[0](x)))
        x_64 = self.resnet[4](self.resnet[3](x_128))
        x_32 = self.resnet[5](x_64)
        x_16 = self.layer4(x_32)
        return self.layer5(x_16), x_128, x_64, x_32, x_16


def _up(cin):
    return nn.Sequential(
        nn.ConvTranspose2d(cin, 256, 3, 2, 1, 1, bias=False),
        nn.BatchNorm2d(256), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, 1, 1, bias=False),
        nn.BatchNorm2d(256), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, 1, 1, bias=False),
        nn.BatchNorm2d(256), nn.ReLU(inplace=True))


class Decoder(nn.Module):
    """ASPP decoder (5 branches), concat mode, output_kernel_size=1."""

    def __init__(self, n_out):
        super().__init__()
        for name, (k, d) in {"conv_1x1_1": (1, 1), "conv_3x3_1": (3, 6),
                             "conv_3x3_2": (3, 12),
                             "conv_3x3_3": (3, 18)}.items():
            setattr(self, name, nn.Conv2d(512, 256, k, 1, d if k == 3
                                          else 0, d))
            setattr(self, "bn_" + name, nn.BatchNorm2d(256))
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.conv_1x1_2 = nn.Conv2d(512, 256, 1)
        self.bn_conv_1x1_2 = nn.BatchNorm2d(256)
        self.conv_1x1_3 = nn.Conv2d(1280, 256, 1)
        self.bn_conv_1x1_3 = nn.BatchNorm2d(256)
        self.upsample_1 = _up(256)
        self.upsample_2 = _up(256 + 64)
        self.conv_1x1_4 = nn.Conv2d(256 + 64, n_out, 1)

    def trunk(self, xh, branches):
        outs = [F.relu(getattr(self, "bn_" + n)(getattr(self, n)(xh)))
                for n in branches]
        g = F.relu(self.bn_conv_1x1_2(self.conv_1x1_2(self.avg_pool(xh))))
        outs.append(F.interpolate(g, size=xh.shape[2:], mode="bilinear"))
        return outs

    def forward(self, xh, x_128, x_64):
        outs = self.trunk(xh, ["conv_1x1_1", "conv_3x3_1", "conv_3x3_2",
                               "conv_3x3_3"])
        y = F.relu(self.bn_conv_1x1_3(self.conv_1x1_3(torch.cat(outs, 1))))
        y = self.upsample_1(y)
        y = self.upsample_2(torch.cat([y, x_64], 1))
        return self.conv_1x1_4(torch.cat([y, x_128], 1))


class DecoderV3(Decoder):
    """Mask-conditioned second decoder (4 branches + mask concats)."""

    def __init__(self):
        super().__init__(1)
        del self.conv_3x3_3, self.bn_conv_3x3_3
        self.conv_1x1_3 = nn.Conv2d(1025, 256, 1)
        self.upsample_2 = _up(256 + 64 + 1)
        self.conv_1x1_4 = nn.Conv2d(256 + 64 + 1, 1, 1)

    def forward(self, mask, xh, x_128, x_64):
        outs = self.trunk(xh, ["conv_1x1_1", "conv_3x3_1", "conv_3x3_2"])
        outs.append(F.interpolate(mask, size=xh.shape[2:], mode="bilinear"))
        y = F.relu(self.bn_conv_1x1_3(self.conv_1x1_3(torch.cat(outs, 1))))
        y = self.upsample_1(y)
        m64 = F.interpolate(mask, size=(y.shape[2], y.shape[3]),
                            mode="bilinear")
        y = self.upsample_2(torch.cat([y, x_64, m64], 1))
        return self.conv_1x1_4(torch.cat([y, x_128, mask], 1))


class _Inner(nn.Module):
    def __init__(self, variant, code_len):
        super().__init__()
        heads = {"v1": 1, "v2": 2, "v3": 1}[variant]
        self.variant = variant
        self.resnet = Backbone()
        self.aspp = Decoder(code_len + heads)
        if variant == "v3":
            self.aspp_v3 = DecoderV3()

    def forward(self, x):
        xh, x_128, x_64, _, _ = self.resnet(x)
        out = self.aspp(xh, x_128, x_64)
        if self.variant == "v1":
            return out[:, :1], out[:, 1:]
        if self.variant == "v2":
            return out[:, :1], out[:, 1:2], out[:, 2:]
        mask, code = out[:, :1], out[:, 1:]
        return mask, self.aspp_v3(mask, xh, x_128, x_64), code


class ReferenceNet(nn.Module):
    """Key-compatible stand-in for BinaryCodeNet_Deeplab_v{1,2,3}."""

    def __init__(self, variant="v2", code_len=16):
        super().__init__()
        self.net = _Inner(variant, code_len)

    def forward(self, x):
        return self.net(x)


class BlockB(nn.Module):
    """Canonical ResNet Bottleneck with dilation support."""

    def __init__(self, cin, cmid, stride=1, dil=1):
        super().__init__()
        cout = 4 * cmid
        self.conv1 = nn.Conv2d(cin, cmid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, stride, dil, dil, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = nn.Sequential()

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + self.downsample(x))


def _bstage(cin, cmid, n, stride=1):
    mods = [BlockB(cin, cmid, stride)]
    mods += [BlockB(4 * cmid, cmid) for _ in range(n - 1)]
    return nn.Sequential(*mods)


class Backbone50(nn.Module):
    """ResNet50-OS8 per the reference's 50-layer branch."""

    def __init__(self):
        super().__init__()
        self.resnet = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1),
            _bstage(64, 64, 3),                 # 4 = layer1 (256 out)
            _bstage(256, 128, 4, stride=2),     # 5 = layer2 (512 out)
        )
        ch = list(self.resnet.children())       # concat skip-tap aliases
        self.resnet_layer_1 = nn.Sequential(*ch[:3])
        self.resnet_layer_2 = nn.Sequential(*ch[3:5])
        self.resnet_layer_3 = nn.Sequential(*ch[5:6])
        self.layer4 = _stage(512, 1024, 6, dil=2)
        self.layer5 = _stage(1024, 2048, 3, dil=4)

    def forward(self, x):
        x_128 = self.resnet[2](self.resnet[1](self.resnet[0](x)))
        x_64 = self.resnet[4](self.resnet[3](x_128))
        x_32 = self.resnet[5](x_64)
        return self.layer5(self.layer4(x_32)), x_128, x_64, x_32, None


class Decoder50(Decoder):
    def __init__(self, n_out):
        super().__init__(n_out)
        for name in ("conv_1x1_1", "conv_3x3_1", "conv_3x3_2",
                     "conv_3x3_3"):
            old = getattr(self, name)
            setattr(self, name, nn.Conv2d(
                2048, 256, old.kernel_size[0], 1, old.padding[0],
                old.dilation[0]))
        self.conv_1x1_2 = nn.Conv2d(2048, 256, 1)
        self.upsample_2 = _up(256 + 256)


class ReferenceNet50(nn.Module):
    def __init__(self, code_len=16):
        super().__init__()

        class Inner(nn.Module):
            def __init__(self):
                super().__init__()
                self.resnet = Backbone50()
                self.aspp = Decoder50(code_len + 2)

            def forward(self, x):
                xh, x_128, x_64, _, _ = self.resnet(x)
                out = self.aspp(xh, x_128, x_64)
                return out[:, :1], out[:, 1:2], out[:, 2:]

        self.net = Inner()

    def forward(self, x):
        return self.net(x)


def fake_torchvision_resnet34_state_dict():
    """Random state dict with torchvision resnet34 key layout/shapes
    (conv1, bn1, layer1.x, layer2.x — the part the reference loads
    pretrained)."""
    class TV(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.layer1 = _stage(64, 64, 3)
            self.layer2 = _stage(64, 128, 4, stride=2)

    sd = TV().state_dict()
    # torchvision names downsample convs "downsample.0/1" — Block already
    # matches; nothing to rename.
    return sd
