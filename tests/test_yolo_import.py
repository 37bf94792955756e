"""Ultralytics YOLO checkpoint import parity.

The ultralytics package is not installed in this image and the reference
repo ships no ``.pt`` files (they are downloaded at train time:
`BscanBased/yolo5s_retrain.py:4-17`, `yolo_seg_train.py:5-19`), so the
oracle is a torch REPLICA of the Ultralytics module tree: identical
state-dict key grammar (``model.{idx}.cv1.conv.weight`` ...) and forward
math (Conv+BN(eps 1e-3)+SiLU, C2f/C3 split-concat, SPPF, nearest
upsample PAN, decoupled DFL head, Segment proto/coeff branches). The
converter maps the replica's state dict into the JAX YOLO; per-level raw
outputs must match to float tolerance for v8n, v5su-style (v5 flavour,
s scale), and v8n-seg.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pautdx.compat.yolo_import import convert_yolo_state_dict  # noqa: E402
from pautdx.models.vision.yolo import YOLO, YoloConfig  # noqa: E402

IMG = 64


class TConv(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(c1, c2, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return tnn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True, k1=3):
        super().__init__()
        self.cv1 = TConv(c, c, k1)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(TBottleneck(self.c, shortcut)
                                for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TC3(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TBottleneck(c_, shortcut, k1=1)
                                  for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.mp = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.mp(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * reg_max)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f))
                for i, f in enumerate(feats)]


class TProto(tnn.Module):
    def __init__(self, c1, c_, nm):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = tnn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, nm, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegment(TDetect):
    def __init__(self, nc, ch, nm=32, npr=64, reg_max=16):
        super().__init__(nc, ch, reg_max)
        self.proto = TProto(ch[0], npr, nm)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c4, 3), TConv(c4, c4, 3),
                           tnn.Conv2d(c4, nm, 1)) for x in ch)


class TRepConvN(tnn.Module):
    """RepConvN train form: 3x3 conv+bn + 1x1 conv+bn, summed, SiLU."""

    def __init__(self, c1, c2):
        super().__init__()
        self.conv1 = TConvNoAct(c1, c2, 3)
        self.conv2 = TConvNoAct(c1, c2, 1)

    def forward(self, x):
        return tnn.functional.silu(self.conv1(x) + self.conv2(x))


class TConvNoAct(tnn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = tnn.Conv2d(c1, c2, k, s, p, groups=g, bias=False)
        self.bn = tnn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return self.bn(self.conv(x))


class TRepNBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TRepConvN(c, c)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TRepNCSP(tnn.Module):
    def __init__(self, c1, c2, n=1):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TRepNBottleneck(c_) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TRepNCSPELAN4(tnn.Module):
    def __init__(self, c1, c2, c3, c4, n=1):
        super().__init__()
        self.c = c3 // 2
        self.cv1 = TConv(c1, c3, 1)
        self.cv2 = tnn.Sequential(TRepNCSP(c3 // 2, c4, n), TConv(c4, c4, 3))
        self.cv3 = tnn.Sequential(TRepNCSP(c4, c4, n), TConv(c4, c4, 3))
        self.cv4 = TConv(c3 + 2 * c4, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in (self.cv2, self.cv3))
        return self.cv4(torch.cat(y, 1))


class TADown(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1 // 2, self.c, 3, 2, 1)
        self.cv2 = TConv(c1 // 2, self.c, 1, 1, 0)

    def forward(self, x):
        x = tnn.functional.avg_pool2d(x, 2, 1, 0, False, True)
        x1, x2 = x.chunk(2, 1)
        x1 = self.cv1(x1)
        x2 = tnn.functional.max_pool2d(x2, 3, 2, 1)
        x2 = self.cv2(x2)
        return torch.cat((x1, x2), 1)


class TSPPELAN(tnn.Module):
    def __init__(self, c1, c2, c3):
        super().__init__()
        self.cv1 = TConv(c1, c3, 1)
        self.cv5 = TConv(4 * c3, c2, 1)
        self.mp = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.mp(y[-1]))
        return self.cv5(torch.cat(y, 1))


class TBottleneckE(tnn.Module):
    """Ultralytics Bottleneck with e=0.5 (C3k2 plain inner block)."""

    def __init__(self, c, shortcut=True):
        super().__init__()
        c_ = int(c * 0.5)
        self.cv1 = TConv(c, c_, 3)
        self.cv2 = TConv(c_, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3k(tnn.Module):
    def __init__(self, c1, c2, n=2, shortcut=True):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c1, c_, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tnn.Sequential(*(TBottleneck(c_, shortcut, k1=3)
                                  for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TC3k2(tnn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut) if c3k
            else TBottleneckE(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TAttention(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * 0.5)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = TConvNoAct(dim, h, 1)
        self.proj = TConvNoAct(dim, dim, 1)
        self.pe = TConvNoAct(dim, dim, 3, g=dim)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N).split(
            [self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + \
            self.pe(v.reshape(B, C, H, W))
        return self.proj(x)


class TPSABlock(tnn.Module):
    def __init__(self, c, num_heads):
        super().__init__()
        self.attn = TAttention(c, num_heads)
        self.ffn = tnn.Sequential(TConv(c, c * 2, 1), TConvNoAct(c * 2, c, 1))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class TC2PSA(tnn.Module):
    def __init__(self, c1, c2, n=1):
        super().__init__()
        self.c = c1 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv(2 * self.c, c1, 1)
        self.m = tnn.Sequential(*(TPSABlock(self.c, max(1, self.c // 64))
                                  for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        return self.cv2(torch.cat((a, self.m(b)), 1))


class TDWConv(TConv):
    def __init__(self, c1, c2, k=3):
        super().__init__(c1, c2, k)
        self.conv = tnn.Conv2d(c1, c2, k, 1, k // 2, groups=c1, bias=False)


class TDetectV11(tnn.Module):
    """Detect(legacy=False): DWConv cls branch (yolo11)."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, 4 * reg_max)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(
                tnn.Sequential(TDWConv(x, x, 3), TConv(x, c3, 1)),
                tnn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                tnn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f))
                for i, f in enumerate(feats)]


class TYoloV9C(tnn.Module):
    """yolov9c(-seg).yaml replica: GELAN backbone + ADown + SPPELAN."""

    def __init__(self, cfg: YoloConfig, nc: int):
        super().__init__()
        lay = [TConv(3, 64, 3, 2),                                     # 0
               TConv(64, 128, 3, 2),                                   # 1
               TRepNCSPELAN4(128, 256, 128, 64),                       # 2
               TADown(256, 256),                                       # 3
               TRepNCSPELAN4(256, 512, 256, 128),                      # 4
               TADown(512, 512),                                       # 5
               TRepNCSPELAN4(512, 512, 512, 256),                      # 6
               TADown(512, 512),                                       # 7
               TRepNCSPELAN4(512, 512, 512, 256),                      # 8
               TSPPELAN(512, 512, 256),                                # 9
               tnn.Identity(), tnn.Identity(),                         # 10,11
               TRepNCSPELAN4(1024, 512, 512, 256),                     # 12
               tnn.Identity(), tnn.Identity(),                         # 13,14
               TRepNCSPELAN4(1024, 256, 256, 128),                     # 15
               TADown(256, 256),                                       # 16
               tnn.Identity(),                                         # 17
               TRepNCSPELAN4(768, 512, 512, 256),                      # 18
               TADown(512, 512),                                       # 19
               tnn.Identity(),                                         # 20
               TRepNCSPELAN4(1024, 512, 512, 256)]                     # 21
        head_ch = (256, 512, 512)
        if cfg.seg:
            lay.append(TSegment(nc, head_ch, nm=cfg.num_protos,
                                npr=cfg.proto_channels, reg_max=cfg.reg_max))
        else:
            lay.append(TDetect(nc, head_ch, reg_max=cfg.reg_max))
        self.model = tnn.Sequential(*lay)
        self.seg = cfg.seg

    def forward(self, x):
        m = self.model
        up = tnn.functional.interpolate
        x = m[1](m[0](x))
        x = m[3](m[2](x))
        p3 = m[4](x)
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        h4 = m[12](torch.cat([up(p5, scale_factor=2), p4], 1))
        h3 = m[15](torch.cat([up(h4, scale_factor=2), p3], 1))
        n4 = m[18](torch.cat([m[16](h3), h4], 1))
        n5 = m[21](torch.cat([m[19](n4), p5], 1))
        head = m[22]
        feats = [h3, n4, n5]
        out = {"levels": head(feats)}
        if self.seg:
            out["protos"] = head.proto(h3)
            out["coeffs"] = [head.cv4[i](f) for i, f in enumerate(feats)]
        return out


class TYoloV11(tnn.Module):
    """yolo11.yaml replica (n/s scales: c3k False in the marked stages)."""

    def __init__(self, cfg: YoloConfig, nc: int):
        super().__init__()
        w, d = cfg.width, cfg.depth
        c3k = cfg.c3k
        lay = [TConv(3, w(64), 3, 2),                                  # 0
               TConv(w(64), w(128), 3, 2),                             # 1
               TC3k2(w(128), w(256), d(2), c3k, 0.25),                 # 2
               TConv(w(256), w(256), 3, 2),                            # 3
               TC3k2(w(256), w(512), d(2), c3k, 0.25),                 # 4
               TConv(w(512), w(512), 3, 2),                            # 5
               TC3k2(w(512), w(512), d(2), True),                      # 6
               TConv(w(512), w(1024), 3, 2),                           # 7
               TC3k2(w(1024), w(1024), d(2), True),                    # 8
               TSPPF(w(1024), w(1024)),                                # 9
               TC2PSA(w(1024), w(1024), d(2)),                         # 10
               tnn.Identity(), tnn.Identity(),                         # 11,12
               TC3k2(w(1024) + w(512), w(512), d(2), c3k),             # 13
               tnn.Identity(), tnn.Identity(),                         # 14,15
               TC3k2(w(512) + w(512), w(256), d(2), c3k),              # 16
               TConv(w(256), w(256), 3, 2),                            # 17
               tnn.Identity(),                                         # 18
               TC3k2(w(256) + w(512), w(512), d(2), c3k),              # 19
               TConv(w(512), w(512), 3, 2),                            # 20
               tnn.Identity(),                                         # 21
               TC3k2(w(512) + w(1024), w(1024), d(2), True),           # 22
               TDetectV11(nc, (w(256), w(512), w(1024)),
                          reg_max=cfg.reg_max)]                        # 23
        self.model = tnn.Sequential(*lay)

    def forward(self, x):
        m = self.model
        up = tnn.functional.interpolate
        x = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[10](m[9](m[8](m[7](p4))))
        h4 = m[13](torch.cat([up(p5, scale_factor=2), p4], 1))
        h3 = m[16](torch.cat([up(h4, scale_factor=2), p3], 1))
        n4 = m[19](torch.cat([m[17](h3), h4], 1))
        n5 = m[22](torch.cat([m[20](n4), p5], 1))
        return {"levels": m[23]([h3, n4, n5])}


class TYolo(tnn.Module):
    """Ultralytics DetectionModel replica: layers registered as
    ``model.{idx}`` with Identity placeholders at Upsample/Concat
    positions so state-dict indices match the yaml."""

    def __init__(self, cfg: YoloConfig, nc: int):
        super().__init__()
        w, d = cfg.width, cfg.depth
        d1, d2, d3, d4 = cfg.stage_depths
        B = TC2f if cfg.flavour == "v8" else TC3
        lay = []
        if cfg.flavour == "v8":
            lay.append(TConv(3, w(64), 3, 2))                          # 0
        else:
            lay.append(TConv(3, w(64), 6, 2, 2))                       # 0
        lay += [TConv(w(64), w(128), 3, 2),                            # 1
                B(w(128), w(128), d(d1)),                              # 2
                TConv(w(128), w(256), 3, 2),                           # 3
                B(w(256), w(256), d(d2)),                              # 4
                TConv(w(256), w(512), 3, 2),                           # 5
                B(w(512), w(512), d(d3)),                              # 6
                TConv(w(512), w(1024), 3, 2),                          # 7
                B(w(1024), w(1024), d(d4)),                            # 8
                TSPPF(w(1024), w(1024))]                               # 9
        if cfg.flavour == "v8":
            lay += [tnn.Identity(),                                    # 10 up
                    tnn.Identity(),                                    # 11 cat
                    B(w(1024) + w(512), w(512), d(3), False),          # 12
                    tnn.Identity(), tnn.Identity(),                    # 13,14
                    B(w(512) + w(256), w(256), d(3), False),           # 15
                    TConv(w(256), w(256), 3, 2),                       # 16
                    tnn.Identity(),                                    # 17
                    B(w(256) + w(512), w(512), d(3), False),           # 18
                    TConv(w(512), w(512), 3, 2),                       # 19
                    tnn.Identity(),                                    # 20
                    B(w(512) + w(1024), w(1024), d(3), False)]         # 21
            head_ch = (w(256), w(512), w(1024))
        else:
            lay += [TConv(w(1024), w(512), 1),                         # 10
                    tnn.Identity(), tnn.Identity(),                    # 11,12
                    B(w(512) + w(512), w(512), d(3), False),           # 13
                    TConv(w(512), w(256), 1),                          # 14
                    tnn.Identity(), tnn.Identity(),                    # 15,16
                    B(w(256) + w(256), w(256), d(3), False),           # 17
                    TConv(w(256), w(256), 3, 2),                       # 18
                    tnn.Identity(),                                    # 19
                    B(w(256) + w(256), w(512), d(3), False),           # 20
                    TConv(w(512), w(512), 3, 2),                       # 21
                    tnn.Identity(),                                    # 22
                    B(w(512) + w(512), w(1024), d(3), False)]          # 23
            head_ch = (w(256), w(512), w(1024))
        if cfg.seg:
            lay.append(TSegment(nc, head_ch, nm=cfg.num_protos,
                                npr=cfg.proto_channels, reg_max=cfg.reg_max))
        else:
            lay.append(TDetect(nc, head_ch, reg_max=cfg.reg_max))
        self.model = tnn.Sequential(*lay)
        self.flavour = cfg.flavour
        self.seg = cfg.seg

    def forward(self, x):
        m = self.model
        up = tnn.functional.interpolate
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        if self.flavour == "v8":
            h4 = m[12](torch.cat([up(p5, scale_factor=2), p4], 1))
            h3 = m[15](torch.cat([up(h4, scale_factor=2), p3], 1))
            n4 = m[18](torch.cat([m[16](h3), h4], 1))
            n5 = m[21](torch.cat([m[19](n4), p5], 1))
            head = m[22]
        else:
            l5 = m[10](p5)
            h4 = m[13](torch.cat([up(l5, scale_factor=2), p4], 1))
            l4 = m[14](h4)
            h3 = m[17](torch.cat([up(l4, scale_factor=2), p3], 1))
            n4 = m[20](torch.cat([m[18](h3), l4], 1))
            n5 = m[23](torch.cat([m[21](n4), l5], 1))
            head = m[24]
        feats = [h3, n4, n5]
        out = {"levels": head(feats)}
        if self.seg:
            out["protos"] = head.proto(h3)
            out["coeffs"] = [head.cv4[i](f) for i, f in enumerate(feats)]
        return out


def _randomize(tm: tnn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.12, 0.12, generator=g)
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.1, 0.1, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)


def _roundtrip(cfg: YoloConfig, nc: int, seed=0):
    replica = {"v9c": TYoloV9C, "v11": TYoloV11}.get(cfg.flavour, TYolo)
    tm = replica(cfg, nc).eval()
    _randomize(tm, seed)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    jm = YOLO(cfg)
    x = np.random.default_rng(seed).normal(
        size=(1, 3, IMG, IMG)).astype(np.float32)
    target = jm.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    variables, unused = convert_yolo_state_dict(sd, target, cfg.flavour)
    assert unused == [], unused
    with torch.no_grad():
        tout = tm(torch.from_numpy(x))
    jout = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    train=False)
    return tout, jout


def _check_levels(tout, jout):
    for (tb, tc), jlvl in zip(tout["levels"], jout["levels"]):
        np.testing.assert_allclose(
            np.asarray(jlvl["box"]).transpose(0, 3, 1, 2), tb.numpy(),
            atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(jlvl["cls"]).transpose(0, 3, 1, 2), tc.numpy(),
            atol=2e-4, rtol=1e-3)


def test_v8n_detect_import_parity():
    cfg = YoloConfig(num_classes=3, scale="n", flavour="v8")
    tout, jout = _roundtrip(cfg, 3)
    _check_levels(tout, jout)


def test_v5su_detect_import_parity():
    """yolov5su = v5u layout at s scale (`yolo5s_retrain.py:4-17`)."""
    cfg = YoloConfig(num_classes=1, scale="s", flavour="v5")
    tout, jout = _roundtrip(cfg, 1, seed=2)
    _check_levels(tout, jout)


def test_v8n_seg_import_parity():
    cfg = YoloConfig(num_classes=2, scale="n", flavour="v8", seg=True)
    tout, jout = _roundtrip(cfg, 2, seed=3)
    _check_levels(tout, jout)
    np.testing.assert_allclose(
        np.asarray(jout["protos"]).transpose(0, 3, 1, 2),
        tout["protos"].numpy(), atol=2e-4, rtol=1e-3)
    for tcf, jcf in zip(tout["coeffs"], jout["mask_coeffs"]):
        np.testing.assert_allclose(
            np.asarray(jcf).transpose(0, 3, 1, 2), tcf.numpy(),
            atol=2e-4, rtol=1e-3)


def test_v9c_seg_import_parity():
    """yolov9c-seg (`yolo_seg_train.py:5-19`): GELAN + Segment head."""
    cfg = YoloConfig(num_classes=2, flavour="v9c", seg=True)
    tout, jout = _roundtrip(cfg, 2, seed=4)
    _check_levels(tout, jout)
    # looser than v8n-seg: the GELAN backbone is ~3x deeper, so conv-order
    # float drift accumulates (~8e-4 max over the 8k proto elements)
    np.testing.assert_allclose(
        np.asarray(jout["protos"]).transpose(0, 3, 1, 2),
        tout["protos"].numpy(), atol=2e-3, rtol=5e-3)
    for tcf, jcf in zip(tout["coeffs"], jout["mask_coeffs"]):
        np.testing.assert_allclose(
            np.asarray(jcf).transpose(0, 3, 1, 2), tcf.numpy(),
            atol=2e-3, rtol=5e-3)


def test_v11n_detect_import_parity():
    """yolo11n (`yolo/yolo_bbox_retrain.py:6-18`): C3k2 + C2PSA +
    DWConv cls branch."""
    cfg = YoloConfig(num_classes=3, scale="n", flavour="v11")
    tout, jout = _roundtrip(cfg, 3, seed=5)
    _check_levels(tout, jout)


def test_unknown_flavour_rejected():
    with pytest.raises(ValueError, match="v9'"):
        convert_yolo_state_dict({}, {"params": {}}, "v9")
