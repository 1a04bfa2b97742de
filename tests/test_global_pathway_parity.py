"""GlobalPathway full numerical parity against a torch mirror with
transferred weights (reference graph: D_and_G_model.py:161-329, with the
documented 75-channel fix at scale 128).

Covers the hard cases of SURVEY.md §7.3: ConvTranspose2d parity
(k8-from-1x1 trunk head, stride-4 deconv_32), asymmetric ReflectionPad +
k2 residual blocks at 8x8, the bottleneck pairwise-max pool, and the
NHWC-vs-NCHW flatten-order permutation of fc1."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpgan_tpu.models.global_pathway import GlobalPathway

SLOPE = 0.01


def hwio(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def deconv_ours(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 0, 1))


def conv_p(tc):
    return {"kernel": hwio(tc.weight), "bias": jnp.asarray(tc.bias.detach().numpy())}


def deconv_p(td):
    return {"kernel": deconv_ours(td.weight),
            "bias": jnp.asarray(td.bias.detach().numpy())}


class TRes(tnn.Module):
    """Reference ResidualBlock, in == out, stride 1; optional k2 with
    ReflectionPad2d((1,0,1,0)) (ModificationLayer.py:91-96,292-301)."""

    def __init__(self, c, k=3, reflect=False):
        super().__init__()
        self.reflect = reflect
        p = 0 if reflect else (k - 1) // 2
        self.c0 = tnn.Conv2d(c, c, k, 1, p)
        self.c1 = tnn.Conv2d(c, c, k, 1, p)

    def _conv(self, conv, x):
        if self.reflect:
            x = F.pad(x, (1, 0, 1, 0), mode="reflect")
        return conv(x)

    def forward(self, x):
        h = F.leaky_relu(self._conv(self.c0, x), SLOPE)
        return F.leaky_relu(self._conv(self.c1, h) + x, SLOPE)

    def params(self):
        return {"conv0": {"conv": conv_p(self.c0)},
                "conv1": {"conv": conv_p(self.c1)}}


def test_global_pathway_parity():
    torch.manual_seed(0)
    zdim = 64

    # ---- encoder ----
    enc_spec = [(3, 64, 7, 1, 3), (64, 64, 5, 2, 2), (64, 128, 3, 2, 1),
                (128, 256, 3, 2, 1), (256, 512, 3, 2, 1)]
    enc_convs = [tnn.Conv2d(i, o, k, s, p) for i, o, k, s, p in enc_spec]
    enc_res = [[TRes(64, 7)], [TRes(64, 5)], [TRes(128)], [TRes(256)],
               [TRes(512) for _ in range(4)]]
    fc1 = tnn.Linear(512 * 8 * 8, 512)

    # ---- decoder trunk ----
    d8 = tnn.ConvTranspose2d(256 + zdim, 64, 8, 1, 0)
    d32 = tnn.ConvTranspose2d(64, 32, 3, 4, 0, 1)
    d64 = tnn.ConvTranspose2d(32, 16, 3, 2, 1, 1)
    d128 = tnn.ConvTranspose2d(16, 8, 3, 2, 1, 1)

    add8 = TRes(576, 2, reflect=True)
    enh8 = [TRes(576, 2, reflect=True) for _ in range(2)]
    u16 = tnn.ConvTranspose2d(576, 512, 3, 2, 1, 1)
    add16 = TRes(256)
    enh16 = [TRes(768) for _ in range(2)]
    u32 = tnn.ConvTranspose2d(768, 256, 3, 2, 1, 1)
    add32 = TRes(160)
    enh32 = [TRes(416) for _ in range(2)]
    u64 = tnn.ConvTranspose2d(416, 128, 3, 2, 1, 1)
    add64 = TRes(80, 5)
    enh64 = [TRes(208) for _ in range(2)]
    u128 = tnn.ConvTranspose2d(208, 64, 3, 2, 1, 1)
    add128 = TRes(75, 7)
    enh128 = TRes(206, 5)
    conv5 = tnn.Conv2d(206, 64, 5, 1, 2)
    conv5_res = TRes(64)
    conv6 = tnn.Conv2d(64, 32, 3, 1, 1)
    head = tnn.Conv2d(32, 3, 3, 1, 1)

    def torch_forward(x, local_img, local_feat, z):
        skips = []
        h = x
        for c, rs in zip(enc_convs, enc_res):
            h = F.leaky_relu(c(h), SLOPE)
            for r in rs:
                h = r(h)
            skips.append(h)
        f1 = fc1(h.flatten(1))
        f2 = f1.view(-1, 256, 2).max(-1).values
        t = torch.cat([f2, z], 1)[:, :, None, None]
        t8 = F.relu(d8(t))
        t32 = F.relu(d32(t8))
        t64 = F.relu(d64(t32))
        t128 = F.relu(d128(t64))

        h = add8(torch.cat([t8, skips[4]], 1))
        for r in enh8:
            h = r(h)
        h = F.relu(u16(h))
        h = torch.cat([h, add16(skips[3])], 1)
        for r in enh16:
            h = r(h)
        h = F.relu(u32(h))
        h = torch.cat([h, add32(torch.cat([t32, skips[2]], 1))], 1)
        for r in enh32:
            h = r(h)
        h = F.relu(u64(h))
        h = torch.cat([h, add64(torch.cat([t64, skips[1]], 1))], 1)
        for r in enh64:
            h = r(h)
        h = F.relu(u128(h))
        a = add128(torch.cat([t128, skips[0], x], 1))
        h = enh128(torch.cat([h, a, local_feat, local_img], 1))
        h = F.leaky_relu(conv5(h), SLOPE)
        h = conv5_res(h)
        h = F.leaky_relu(conv6(h), SLOPE)
        return head(h), f2

    # ---- transfer weights into our parameter tree ----
    params = {}
    for i, (c, rs) in enumerate(zip(enc_convs, enc_res)):
        params[f"conv{i}_conv"] = {"conv": conv_p(c)}
        for j, r in enumerate(rs):
            params[f"conv{i}_res{j}"] = r.params()

    # fc1: torch flattens CHW, we flatten HWC -> permute input rows
    w = fc1.weight.detach().numpy()  # (512, 512*8*8), input idx = c*64+h*8+w
    w_chw = w.reshape(512, 512, 8, 8)
    w_hwc = np.transpose(w_chw, (0, 2, 3, 1)).reshape(512, 512 * 8 * 8)
    params["fc1"] = {
        "kernel": jnp.asarray(w_hwc.T),
        "bias": jnp.asarray(fc1.bias.detach().numpy()),
    }

    params["deconv_8"] = {"deconv": deconv_p(d8)}
    params["deconv_32"] = {"deconv": deconv_p(d32)}
    params["deconv_64"] = {"deconv": deconv_p(d64)}
    params["deconv_128"] = {"deconv": deconv_p(d128)}
    params["add_8"] = add8.params()
    for j, r in enumerate(enh8):
        params[f"enhance_8_{j}"] = r.params()
    params["upsample_16"] = {"deconv": deconv_p(u16)}
    params["add_16"] = add16.params()
    for j, r in enumerate(enh16):
        params[f"enhance_16_{j}"] = r.params()
    params["upsample_32"] = {"deconv": deconv_p(u32)}
    params["add_32"] = add32.params()
    for j, r in enumerate(enh32):
        params[f"enhance_32_{j}"] = r.params()
    params["upsample_64"] = {"deconv": deconv_p(u64)}
    params["add_64"] = add64.params()
    for j, r in enumerate(enh64):
        params[f"enhance_64_{j}"] = r.params()
    params["upsample_128"] = {"deconv": deconv_p(u128)}
    params["add_128"] = add128.params()
    params["enhance_128"] = enh128.params()
    params["conv5_conv"] = {"conv": conv_p(conv5)}
    params["conv5_res"] = conv5_res.params()
    params["conv6"] = {"conv": conv_p(conv6)}
    params["decoded_img128"] = {"conv": conv_p(head)}

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 128, 128).astype(np.float32) * 0.5
    li = rng.randn(1, 3, 128, 128).astype(np.float32) * 0.5
    lf = rng.randn(1, 64, 128, 128).astype(np.float32) * 0.5
    z = rng.randn(1, zdim).astype(np.float32)

    with torch.no_grad():
        want_img, want_fc2 = torch_forward(
            torch.from_numpy(x), torch.from_numpy(li),
            torch.from_numpy(lf), torch.from_numpy(z),
        )

    ours = GlobalPathway(zdim=zdim, use_batchnorm=False)
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    got_img, got_fc2 = jax.jit(ours.apply)(
        {"params": params}, nhwc(x), nhwc(li), nhwc(lf), jnp.asarray(z)
    )
    np.testing.assert_allclose(
        np.asarray(got_fc2), want_fc2.numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_img), (0, 3, 1, 2)), want_img.numpy(),
        rtol=5e-3, atol=5e-4,
    )
