"""Reference-checkpoint import validation.

Builds torch module trees whose state_dict naming matches the reference's
Generator/Discriminator (D_and_G_model.py, GAN config: no BN), saves them,
imports via import_generator_pth / import_discriminator_pth, and checks:

* the imported tree has exactly the structure+shapes of our models' init
  trees (every parameter mapped, nothing missing);
* forward parity where the reference graph can actually run (LocalPathway,
  Discriminator);
* the 72->75 zero-extension healed add_conv_and_deconv_128 correctly
  (I128's channels are ignored, dead outputs are zero).
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.models.discriminator import Discriminator
from tpgan_tpu.models.local_pathway import LocalPathway
from tpgan_tpu.train.checkpoint import (
    import_discriminator_pth,
    import_generator_pth,
)
from tpgan_tpu.train.gan_trainer import build_models, example_batch

SLOPE = 0.01


def conv_seq(cin, cout, k, s=1, p=0, reflect=False, act=True):
    layers = []
    if reflect:
        layers.append(tnn.ReflectionPad2d((1, 0, 1, 0)))
        p = 0
    layers.append(tnn.Conv2d(cin, cout, k, s, p))
    if act:
        layers.append(tnn.LeakyReLU(SLOPE))
    return tnn.Sequential(*layers)


class RB(tnn.Module):
    def __init__(self, c, k=3, reflect=False):
        super().__init__()
        p = (k - 1) // 2 if not reflect else 0
        self.layers = tnn.Sequential(
            conv_seq(c, c, k, 1, p, reflect=reflect),
            conv_seq(c, c, k, 1, p, reflect=reflect, act=False),
        )
        self.shortcut = tnn.Sequential()

    def forward(self, x):
        return F.leaky_relu(self.layers(x) + x, SLOPE)


def deconv_seq(cin, cout, k, s, p, op):
    return tnn.Sequential(
        tnn.ConvTranspose2d(cin, cout, k, s, p, output_padding=op), tnn.ReLU()
    )


class RefLocalPathway(tnn.Module):
    def __init__(self):
        super().__init__()
        ch = [3, 64, 128, 256, 512]
        for i in range(4):
            setattr(self, f"conv{i}", tnn.Sequential(
                conv_seq(ch[i], ch[i + 1], 3, 1 if i == 0 else 2, 1),
                RB(ch[i + 1]),
            ))
        dec = [(512, 256, 256), (256, 128, 128), (128, 64, 64)]
        for j, (cin, cout, skip) in enumerate(dec):
            setattr(self, f"deconv{j}", deconv_seq(cin, cout, 3, 2, 1, 1))
            setattr(self, f"after_select{j}", tnn.Sequential(
                conv_seq(cout + skip, cout, 3, 1, 1), RB(cout)
            ))
        self.local_img = conv_seq(64, 3, 1, 1, 0, act=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        d0 = self.deconv0(c3)
        a0 = self.after_select0(torch.cat([d0, c2], 1))
        d1 = self.deconv1(a0)
        a1 = self.after_select1(torch.cat([d1, c1], 1))
        d2 = self.deconv2(a1)
        a2 = self.after_select2(torch.cat([d2, c0], 1))
        return self.local_img(a2), d2


class RefGlobalPathway(tnn.Module):
    """Reference-built GlobalPathway: constructible, forward NOT runnable
    (the 72-channel add_conv_and_deconv_128)."""

    def __init__(self, zdim=64):
        super().__init__()
        enc = [(3, 64, 7, 1, 3, 1), (64, 64, 5, 2, 2, 1),
               (64, 128, 3, 2, 1, 1), (128, 256, 3, 2, 1, 1),
               (256, 512, 3, 2, 1, 4)]
        for i, (ci, co, k, s, p, nres) in enumerate(enc):
            mods = [conv_seq(ci, co, k, s, p)] + [RB(co, k) for _ in range(nres)]
            setattr(self, f"conv{i}", tnn.Sequential(*mods))
        self.fc1 = tnn.Linear(512 * 8 * 8, 512)
        self.deconv_8 = deconv_seq(256 + zdim, 64, 8, 1, 0, 0)
        self.deconv_32 = deconv_seq(64, 32, 3, 4, 0, 1)
        self.deconv_64 = deconv_seq(32, 16, 3, 2, 1, 1)
        self.deconv_128 = deconv_seq(16, 8, 3, 2, 1, 1)
        self.add_conv_and_deconv_8 = RB(576, 2, reflect=True)
        self.enhance_features_8 = tnn.Sequential(
            *[RB(576, 2, reflect=True) for _ in range(2)]
        )
        self.upsample_16 = deconv_seq(576, 512, 3, 2, 1, 1)
        self.add_conv_and_deconv_16 = RB(256)
        self.enhance_features_16 = tnn.Sequential(*[RB(768) for _ in range(2)])
        self.upsample_32 = deconv_seq(768, 256, 3, 2, 1, 1)
        self.add_conv_and_deconv_32 = RB(160)
        self.enhance_features_32 = tnn.Sequential(*[RB(416) for _ in range(2)])
        self.upsample_64 = deconv_seq(416, 128, 3, 2, 1, 1)
        self.add_conv_and_deconv_64 = RB(80, 5)
        self.enhance_features_64 = tnn.Sequential(*[RB(208) for _ in range(2)])
        self.upsample_128 = deconv_seq(208, 64, 3, 2, 1, 1)
        self.add_conv_and_deconv_128 = RB(72, 7)      # the reference's 72
        self.enhance_features_128 = tnn.Sequential(RB(64 + 72 + 64 + 3, 5))
        self.conv5 = tnn.Sequential(conv_seq(203, 64, 5, 1, 2), RB(64))
        self.conv6 = conv_seq(64, 32, 3, 1, 1)
        self.decoded_img128 = conv_seq(32, 3, 3, 1, 1, act=False)


class RefFeaturePredict(tnn.Module):
    def __init__(self, num_classes=347):
        super().__init__()
        self.fc = tnn.Linear(256, num_classes)


class RefGenerator(tnn.Module):
    def __init__(self):
        super().__init__()
        self.local_pathway_left_eye = RefLocalPathway()
        self.local_pathway_right_eye = RefLocalPathway()
        self.local_pathway_nose = RefLocalPathway()
        self.local_pathway_mouth = RefLocalPathway()
        self.global_pathway = RefGlobalPathway()
        self.feature_predict = RefFeaturePredict()


class RefDiscriminator(tnn.Module):
    def __init__(self):
        super().__init__()
        ch = [3, 64, 128, 256, 512, 512]
        mods = []
        for i in range(5):
            mods.append(conv_seq(ch[i], ch[i + 1], 3, 2, 1))
            if i >= 3:
                mods.append(RB(ch[i + 1]))
        mods.append(conv_seq(512, 1, 3, 1, 1, act=False))
        self.model = tnn.Sequential(*mods)

    def forward(self, x):
        return self.model(x)


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_generator_import_structure_and_parity(tmp_path):
    torch.manual_seed(0)
    ref = RefGenerator()
    path = str(tmp_path / "gen.pth")
    torch.save(ref.state_dict(), path)

    imported = import_generator_pth(path)

    cfg = make_config({"compute_dtype": "float32"})
    gen, _ = build_models(cfg)
    batch = example_batch(1)
    want_vars = jax.eval_shape(
        gen.init, jax.random.PRNGKey(0),
        batch["img"], batch["left_eye"], batch["right_eye"],
        batch["nose"], batch["mouth"], jnp.zeros((1, 64)),
    )
    # exact structure + shape match: every parameter accounted for
    assert _tree_shapes(imported["params"]) == _tree_shapes(want_vars["params"])

    # the zero-extension healed the 72->75 defect: I128's input channels
    # and the 3 extra outputs of add_128 are dead
    a128 = imported["params"]["global_pathway"]["add_128"]["conv0"]["conv"]
    np.testing.assert_array_equal(np.asarray(a128["kernel"][:, :, 72:75, :]), 0)
    np.testing.assert_array_equal(np.asarray(a128["kernel"][:, :, :, 72:75]), 0)

    # forward parity where the reference graph runs: LocalPathway
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 40, 40).astype(np.float32)
    with torch.no_grad():
        want_img, want_feat = ref.local_pathway_left_eye(torch.from_numpy(x))
    ours = LocalPathway(use_batchnorm=False)
    got_img, got_feat = jax.jit(ours.apply)(
        {"params": imported["params"]["local_left_eye"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_img), (0, 3, 1, 2)), want_img.numpy(),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got_feat), (0, 3, 1, 2)), want_feat.numpy(),
        rtol=2e-3, atol=2e-4,
    )

    # the imported full generator runs and is finite
    out = jax.jit(gen.apply)(
        {"params": imported["params"]},
        jnp.asarray(np.transpose(rng.randn(1, 3, 128, 128).astype(np.float32) * 0.3, (0, 2, 3, 1))),
        jnp.asarray(rng.randn(1, 40, 40, 3).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(1, 40, 40, 3).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(1, 32, 40, 3).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32) * 0.3),
        jnp.zeros((1, 64)),
    )
    assert np.isfinite(np.asarray(out.img128_fake)).all()


def test_discriminator_import_and_forward_parity(tmp_path):
    torch.manual_seed(1)
    ref = RefDiscriminator()
    path = str(tmp_path / "disc.pth")
    torch.save(ref.state_dict(), path)

    imported = import_discriminator_pth(path)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    ours = Discriminator(use_batchnorm=False)
    got = jax.jit(ours.apply)(
        {"params": imported["params"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(),
        rtol=2e-3, atol=2e-4,
    )
