"""Full-model numerical parity: a torch MobileNetV2+SSD with the
reference's module naming (MobileNetV2.py:122-218 graph) is randomly
initialised, saved as a state_dict, imported through
``import_mobilenet_v2_pth``, and must produce the same predictions as our
NHWC model — validating the model graph, the BN semantics, and the
checkpoint importer end to end."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tpgan_tpu.models.mobilenet_v2 import (
    INVERTED_RESIDUAL_SETTING,
    MobileNetV2,
    SSD_SCALES,
)
from tpgan_tpu.train.checkpoint import import_mobilenet_v2_pth


def _torch_inverted_residual(inp, oup, stride, t):
    mid = inp * t
    return tnn.Sequential(
        tnn.Conv2d(inp, mid, 1, 1, 0, bias=False),
        tnn.BatchNorm2d(mid),
        tnn.ReLU6(inplace=True),
        tnn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
        tnn.BatchNorm2d(mid),
        tnn.ReLU6(inplace=True),
        tnn.Conv2d(mid, oup, 1, 1, 0, bias=False),
        tnn.BatchNorm2d(oup),
    )


class _TorchRef(tnn.Module):
    """Minimal torch mirror producing the reference's state-dict naming
    and forward dataflow (taps at bottleneck 12, conv2, extras 1/3/4/6)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False),
            tnn.BatchNorm2d(32),
            tnn.ReLU6(inplace=True),
        )
        blocks = []
        self.skips = []
        cin = 32
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for rep in range(n):
                stride = s if rep == 0 else 1
                m = tnn.Module()
                m.conv = _torch_inverted_residual(cin, c, stride, t)
                m.use_res = stride == 1 and cin == c
                blocks.append(m)
                cin = c
        self.bottlenecks = tnn.ModuleList(blocks)
        self.conv2 = tnn.Sequential(
            tnn.Conv2d(320, 1280, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(1280),
            tnn.ReLU6(inplace=True),
        )
        self.extra_layers = tnn.ModuleList([
            tnn.Conv2d(1280, 512, 1),
            tnn.Conv2d(512, 512, 3, 2, 1),
            tnn.Conv2d(512, 256, 1),
            tnn.Conv2d(256, 256, 3, 2, 1),
            tnn.Conv2d(256, 256, 3, 2, 1),
            tnn.Conv2d(256, 128, 1),
            tnn.Conv2d(128, 128, 3, 2, 1),
        ])
        head = tnn.Module()
        head.location_layer = tnn.ModuleList(
            [tnn.Conv2d(cin, a * 2, 3, padding=1) for cin, a in SSD_SCALES]
        )
        head.classification_layer = tnn.ModuleList(
            [tnn.Conv2d(cin, a * 5, 3, padding=1) for cin, a in SSD_SCALES]
        )
        self.ssd_head = head

    def forward(self, x):
        feats = []
        x = self.conv1(x)
        for i, m in enumerate(self.bottlenecks):
            x = x + m.conv(x) if m.use_res else m.conv(x)
            if i == 12:
                feats.append(x)
        x = self.conv2(x)
        feats.append(x)
        for i, m in enumerate(self.extra_layers):
            x = m(x)
            if i in (1, 3, 4, 6):
                feats.append(x)
        locs, clss = [], []
        for i, f in enumerate(feats):
            l = self.ssd_head.location_layer[i](f)
            l = l.permute(0, 2, 3, 1).reshape(f.shape[0], -1, 2)
            locs.append(torch.relu(l))
            c = self.ssd_head.classification_layer[i](f)
            clss.append(c.permute(0, 2, 3, 1).reshape(f.shape[0], -1, 5))
        return torch.cat(locs, 1), torch.cat(clss, 1)


def test_full_mobilenet_parity_via_pth_import(tmp_path):
    torch.manual_seed(0)
    ref = _TorchRef().eval()
    # exercise non-trivial BN stats
    with torch.no_grad():
        ref.train()
        ref(torch.randn(2, 3, 128, 128))
        ref.eval()

    path = str(tmp_path / "model_epoch_0.pth")
    torch.save(ref.state_dict(), path)

    variables = import_mobilenet_v2_pth(path)
    ours = MobileNetV2()

    rng = np.random.RandomState(0)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        want_loc, want_cls = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    got_loc, got_cls = jax.jit(ours.apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_loc), want_loc.numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_cls), want_cls.numpy(), rtol=5e-3, atol=5e-4
    )
