"""Model-graph tests: shapes, fuser geometry golden vs torch, full
Generator/Discriminator forward (BASELINE configs 1 & 2)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpgan_tpu.models import (
    Discriminator,
    Generator,
    GlobalPathway,
    LocalPathway,
    fuse_parts,
)
from tpgan_tpu.models.local_fuser import extract_parts


def test_local_fuser_matches_torch_pad_max():
    """Golden: our static placement must equal the reference's F.pad
    arithmetic (D_and_G_model.py:148-157) followed by stacked max."""
    rng = np.random.RandomState(0)
    c = 5
    le = rng.randn(2, c, 40, 40).astype(np.float32)
    re = rng.randn(2, c, 40, 40).astype(np.float32)
    no = rng.randn(2, c, 32, 40).astype(np.float32)
    mo = rng.randn(2, c, 32, 48).astype(np.float32)

    IMG = 128
    EW = EH = 40
    NW, NH = 40, 32
    MW, MH = 48, 32
    tle = F.pad(torch.from_numpy(le), (39 - EW // 2 - 1, IMG - (39 + EW // 2 - 1), 40 - EH // 2 - 1, IMG - (40 + EH // 2 - 1)))
    tre = F.pad(torch.from_numpy(re), (86 - EW // 2 - 1, IMG - (86 + EW // 2 - 1), 39 - EH // 2 - 1, IMG - (39 + EH // 2 - 1)))
    tno = F.pad(torch.from_numpy(no), (64 - NW // 2 - 1, IMG - (64 + NW // 2 - 1), 64 - NH // 2 - 1, IMG - (64 + NH // 2 - 1)))
    tmo = F.pad(torch.from_numpy(mo), (65 - MW // 2 - 1, IMG - (65 + MW // 2 - 1), 89 - MH // 2 - 1, IMG - (89 + MH // 2 - 1)))
    want = torch.max(torch.stack([tle, tre, tno, tmo], dim=0), dim=0)[0].numpy()

    def nhwc(x):
        return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    got = fuse_parts(nhwc(le), nhwc(re), nhwc(no), nhwc(mo))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-6, atol=1e-6
    )


def test_extract_parts_roundtrip():
    """Each part's slot round-trips when it is the only non-zero part
    (slots overlap — eyes/nose/mouth share canvas pixels, so the max
    blends where they meet)."""
    rng = np.random.RandomState(1)
    shapes = {
        "left_eye": (1, 40, 40, 3),
        "right_eye": (1, 40, 40, 3),
        "nose": (1, 32, 40, 3),
        "mouth": (1, 32, 48, 3),
    }
    names = list(shapes)
    for active in names:
        parts = {
            k: (
                jnp.asarray(rng.rand(*s).astype(np.float32)) + 1.0
                if k == active
                else jnp.zeros(s, jnp.float32)
            )
            for k, s in shapes.items()
        }
        canvas = fuse_parts(
            parts["left_eye"], parts["right_eye"], parts["nose"], parts["mouth"]
        )
        back = extract_parts(canvas)
        np.testing.assert_allclose(np.asarray(back[active]), np.asarray(parts[active]))


def test_local_pathway_shapes():
    mod = LocalPathway(use_batchnorm=False, fm_multiplier=0.25)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 3)))
    img, feat = jax.jit(mod.apply)(v, jnp.ones((2, 40, 40, 3)))
    assert img.shape == (2, 40, 40, 3)
    assert feat.shape == (2, 40, 40, 64)
    # also on the non-square mouth patch (48x32 WxH => 32x48 HxW)
    img2, feat2 = jax.jit(mod.apply)(v, jnp.ones((2, 32, 48, 3)))
    assert img2.shape == (2, 32, 48, 3)


def test_global_pathway_shapes():
    # fm_multiplier-scaled for CPU test speed; the full-size graph is
    # exercised by the driver's __graft_entry__ compile check on TPU.
    mod = GlobalPathway(zdim=64, use_batchnorm=False, fm_multiplier=0.25,
                        local_feature_layer_dim=16)
    x = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(mod.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 16)), jnp.zeros((1, 64)),
    )
    img, fc2 = jax.jit(mod.apply)(
        v, jnp.ones((2, 128, 128, 3)), jnp.ones((2, 128, 128, 3)),
        jnp.ones((2, 128, 128, 16)), jnp.ones((2, 64)),
    )
    assert img.shape == (2, 128, 128, 3)
    assert fc2.shape == (2, 256)


def test_generator_full_forward():
    """BASELINE config 1+2: full two-pathway synthesis forward."""
    mod = Generator(zdim=64, num_classes=347, use_batchnorm=False,
                    fm_multiplier=0.25, local_feature_layer_dim=16)
    args = dict(
        i128=jnp.zeros((1, 128, 128, 3)),
        left_eye=jnp.zeros((1, 40, 40, 3)),
        right_eye=jnp.zeros((1, 40, 40, 3)),
        nose=jnp.zeros((1, 32, 40, 3)),
        mouth=jnp.zeros((1, 32, 48, 3)),
        z=jnp.zeros((1, 64)),
    )
    v = jax.jit(lambda k: mod.init(k, **args))(jax.random.PRNGKey(0))
    out = jax.jit(lambda v: mod.apply(v, **args))(v)
    assert out.img128_fake.shape == (1, 128, 128, 3)
    assert out.encoder_predict.shape == (1, 347)
    assert out.local_fake.shape == (1, 128, 128, 3)
    assert out.left_eye_fake.shape == (1, 40, 40, 3)
    assert out.nose_fake.shape == (1, 32, 40, 3)
    assert out.mouth_fake.shape == (1, 32, 48, 3)
    assert out.local_origin.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out.img128_fake)).all()


def test_generator_dropout_rng():
    mod = Generator(zdim=64, num_classes=10, use_batchnorm=False,
                    fm_multiplier=0.25, local_feature_layer_dim=16)
    args = dict(
        i128=jnp.zeros((1, 128, 128, 3)),
        left_eye=jnp.zeros((1, 40, 40, 3)),
        right_eye=jnp.zeros((1, 40, 40, 3)),
        nose=jnp.zeros((1, 32, 40, 3)),
        mouth=jnp.zeros((1, 32, 48, 3)),
        z=jnp.zeros((1, 64)),
    )
    v = jax.jit(lambda k: mod.init(k, **args))(jax.random.PRNGKey(0))
    out = jax.jit(
        lambda v, k: mod.apply(v, **args, use_dropout=True, rngs={"dropout": k})
    )(v, jax.random.PRNGKey(1))
    assert out.encoder_predict.shape == (1, 10)


def test_discriminator_patchgan_output():
    """4x4 local realism map on 128x128 input (D_and_G_model.py:430)."""
    mod = Discriminator(use_batchnorm=False, fm_multiplier=0.25)
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    y = jax.jit(mod.apply)(v, jnp.ones((3, 128, 128, 3)))
    assert y.shape == (3, 4, 4, 1)


def test_generator_jit_compiles():
    mod = Generator(zdim=64, num_classes=347, use_batchnorm=False,
                    fm_multiplier=0.25, local_feature_layer_dim=16)
    args = (
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 40, 40, 3)),
        jnp.zeros((1, 40, 40, 3)),
        jnp.zeros((1, 32, 40, 3)),
        jnp.zeros((1, 32, 48, 3)),
        jnp.zeros((1, 64)),
    )
    v = jax.jit(lambda k: mod.init(k, *args))(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(params, *a):
        return mod.apply(params, *a).img128_fake

    y = fwd(v, *args)
    assert y.shape == (1, 128, 128, 3)
