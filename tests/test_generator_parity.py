"""Composed-module numerical parity against torch mirrors with
transferred weights: LocalPathway (full U-Net with skip concats,
D_and_G_model.py:18-110) and the PatchGAN Discriminator (:409-435).
Layer-level goldens live in test_blocks.py; these pin the composition
(skip ordering, activation placement, residual wiring)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpgan_tpu.models.discriminator import Discriminator
from tpgan_tpu.models.local_pathway import LocalPathway

SLOPE = 0.01


def hwio(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def deconv_ours(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 0, 1))


def bias(b):
    return jnp.asarray(b.detach().numpy())


def conv_p(tc):
    return {"kernel": hwio(tc.weight), "bias": bias(tc.bias)}


def deconv_p(td):
    return {"kernel": deconv_ours(td.weight), "bias": bias(td.bias)}


class TRes(tnn.Module):
    """act(conv1(act(conv0(x))) + x) — the reference ResidualBlock with
    in == out, stride 1 (ModificationLayer.py:292-301)."""

    def __init__(self, c, k=3):
        super().__init__()
        p = (k - 1) // 2
        self.c0 = tnn.Conv2d(c, c, k, 1, p)
        self.c1 = tnn.Conv2d(c, c, k, 1, p)

    def forward(self, x):
        h = F.leaky_relu(self.c0(x), SLOPE)
        return F.leaky_relu(self.c1(h) + x, SLOPE)

    def params(self):
        return {"conv0": {"conv": conv_p(self.c0)},
                "conv1": {"conv": conv_p(self.c1)}}


def test_local_pathway_parity():
    torch.manual_seed(0)

    enc_ch = [3, 64, 128, 256, 512]
    enc_convs, enc_res = [], []
    for i in range(4):
        enc_convs.append(tnn.Conv2d(enc_ch[i], enc_ch[i + 1], 3,
                                    1 if i == 0 else 2, 1))
        enc_res.append(TRes(enc_ch[i + 1]))
    dec = [(512, 256), (256, 128), (128, 64)]
    deconvs = [tnn.ConvTranspose2d(i, o, 3, 2, 1, 1) for i, o in dec]
    sel_in = [256 + 256, 128 + 128, 64 + 64]
    sel_convs = [tnn.Conv2d(si, o, 3, 1, 1) for si, (_, o) in zip(sel_in, dec)]
    sel_res = [TRes(o) for _, o in dec]
    head = tnn.Conv2d(64, 3, 1)

    def torch_forward(x):
        skips = []
        h = x
        for c, r in zip(enc_convs, enc_res):
            h = r(F.leaky_relu(c(h), SLOPE))
            skips.append(h)
        feat = None
        for j, (d, sc, sr) in enumerate(zip(deconvs, sel_convs, sel_res)):
            h = F.relu(d(h))
            if j == 2:
                feat = h
            h = torch.cat([h, skips[2 - j]], 1)
            h = sr(F.leaky_relu(sc(h), SLOPE))
        return head(h), feat

    params = {}
    for i in range(4):
        params[f"conv{i}_conv"] = {"conv": conv_p(enc_convs[i])}
        params[f"conv{i}_res"] = enc_res[i].params()
    for j in range(3):
        params[f"dec{j}_deconv"] = {"deconv": deconv_p(deconvs[j])}
        params[f"dec{j}_select_conv"] = {"conv": conv_p(sel_convs[j])}
        params[f"dec{j}_select_res"] = sel_res[j].params()
    params["local_img"] = {"conv": conv_p(head)}

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 40, 40).astype(np.float32)
    with torch.no_grad():
        want_img, want_feat = torch_forward(torch.from_numpy(x))

    ours = LocalPathway(use_batchnorm=False)
    got_img, got_feat = jax.jit(ours.apply)(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_img), (0, 3, 1, 2)), want_img.numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_feat), (0, 3, 1, 2)), want_feat.numpy(),
        rtol=2e-3, atol=2e-4,
    )


def test_discriminator_parity():
    torch.manual_seed(1)
    chans = [3, 64, 128, 256, 512, 512]
    convs = [tnn.Conv2d(chans[i], chans[i + 1], 3, 2, 1) for i in range(5)]
    res = {3: TRes(512), 4: TRes(512)}
    head = tnn.Conv2d(512, 1, 3, 1, 1)

    def torch_forward(x):
        h = x
        for i, c in enumerate(convs):
            h = F.leaky_relu(c(h), SLOPE)
            if i in res:
                h = res[i](h)
        return head(h)

    params = {}
    for i, c in enumerate(convs):
        params[f"conv{i}"] = {"conv": conv_p(c)}
    for i, r in res.items():
        params[f"res{i}"] = r.params()
    params["head"] = {"conv": conv_p(head)}

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = torch_forward(torch.from_numpy(x))

    ours = Discriminator(use_batchnorm=False)
    got = jax.jit(ours.apply)(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=2e-3, atol=2e-4,
    )
