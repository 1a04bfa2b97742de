"""Golden-value tests: our NHWC blocks must match torch's NCHW semantics
bit-for-bit (up to float tolerance) for conv, deconv, reflection padding,
BatchNorm, linear, and the ResidualBlock composition.

Strategy: build the torch layer, copy its weights into our pytree layout,
run both on the same input, compare. This pins the semantics the models
depend on (reference: ModificationLayer.py) without copying reference code.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tpgan_tpu.ops import activations as act_lib
from tpgan_tpu.ops.blocks import (
    BatchNorm2d,
    Conv2d,
    ConvBlock,
    ConvTranspose2d,
    DeconvBlock,
    LinearBlock,
    ResidualBlock,
    reflect_pad,
)

TOL = dict(rtol=1e-4, atol=1e-4)


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 3, 1, 2))


def conv_w_to_hwio(w: torch.Tensor) -> np.ndarray:
    # torch (out,in,kh,kw) -> HWIO (kh,kw,in,out)
    return w.detach().numpy().transpose(2, 3, 1, 0)


def deconv_w_to_ours(w: torch.Tensor) -> np.ndarray:
    # torch ConvTranspose2d (in,out,kh,kw) -> ours (kh,kw,in,out), unflipped
    return w.detach().numpy().transpose(2, 3, 0, 1)


def rand_nchw(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,s,p", [(3, 8, 3, 1, 1), (8, 16, 3, 2, 1), (4, 6, 7, 1, 3), (5, 7, 5, 2, 2)]
)
def test_conv2d_matches_torch(cin, cout, k, s, p):
    x = rand_nchw(2, cin, 16, 16, seed=k + s)
    tconv = tnn.Conv2d(cin, cout, k, s, p, bias=True)
    want = tconv(torch.from_numpy(x)).detach().numpy()

    mod = Conv2d(cin, cout, k, s, p)
    params = {
        "params": {
            "kernel": jnp.asarray(conv_w_to_hwio(tconv.weight)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = mod.apply(params, jnp.asarray(nchw_to_nhwc(x)))
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


@pytest.mark.parametrize("algorithm", ["dilated", "subpixel"])
@pytest.mark.parametrize(
    "cin,cout,k,s,p,op,hw",
    [
        (4, 8, 3, 2, 1, 1, 8),   # the LocalPathway/GlobalPathway upsamplers
        (6, 4, 8, 1, 0, 0, 1),   # deconv_8: k8 from 1x1 (D_and_G_model.py:218)
        (4, 4, 3, 4, 0, 1, 8),   # deconv_32: stride 4 (D_and_G_model.py:220)
        (3, 5, 5, 2, 2, 1, 7),
        (3, 5, 4, 2, 1, 0, 6),   # negative-offset phase (needs low pad)
        (2, 3, 3, 2, 0, 0, 5),   # out_len % s != 0 -> subpixel falls back
    ],
)
def test_conv_transpose2d_matches_torch(cin, cout, k, s, p, op, hw, algorithm):
    x = rand_nchw(2, cin, hw, hw, seed=k * 7 + s)
    tdeconv = tnn.ConvTranspose2d(cin, cout, k, s, p, output_padding=op, bias=True)
    want = tdeconv(torch.from_numpy(x)).detach().numpy()

    mod = ConvTranspose2d(cin, cout, k, s, p, op, algorithm=algorithm)
    params = {
        "params": {
            "kernel": jnp.asarray(deconv_w_to_ours(tdeconv.weight)),
            "bias": jnp.asarray(tdeconv.bias.detach().numpy()),
        }
    }
    got = mod.apply(params, jnp.asarray(nchw_to_nhwc(x)))
    assert got.shape[1] == want.shape[2], (got.shape, want.shape)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_reflection_pad_matches_torch():
    # the asymmetric [1,0,1,0] pattern used by the 8x8 fusion blocks
    # (D_and_G_model.py:235-237)
    x = rand_nchw(1, 3, 8, 8, seed=3)
    want = tnn.ReflectionPad2d((1, 0, 1, 0))(torch.from_numpy(x)).numpy()
    got = reflect_pad(jnp.asarray(nchw_to_nhwc(x)), (1, 0, 1, 0))
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_conv_with_reflect_padding_list():
    # conv factory with 4-list padding => reflection pad + unpadded conv
    # (ModificationLayer.py:83-96)
    x = rand_nchw(2, 4, 8, 8, seed=5)
    tconv = tnn.Conv2d(4, 4, 2, 1, 0, bias=True)
    tpad = tnn.ReflectionPad2d((1, 0, 1, 0))
    want = tconv(tpad(torch.from_numpy(x))).detach().numpy()

    mod = Conv2d(4, 4, 2, 1, (1, 0, 1, 0))
    params = {
        "params": {
            "kernel": jnp.asarray(conv_w_to_hwio(tconv.weight)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = mod.apply(params, jnp.asarray(nchw_to_nhwc(x)))
    assert got.shape[1:3] == (8, 8)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_batchnorm_train_and_eval_match_torch():
    c = 6
    x1 = rand_nchw(4, c, 5, 5, seed=11)
    x2 = rand_nchw(4, c, 5, 5, seed=12)

    tbn = tnn.BatchNorm2d(c)
    tbn.train()
    want1 = tbn(torch.from_numpy(x1)).detach().numpy()
    want2 = tbn(torch.from_numpy(x2)).detach().numpy()
    tbn.eval()
    want_eval = tbn(torch.from_numpy(x1)).detach().numpy()

    mod = BatchNorm2d(c)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x1)))
    params = {
        "params": {
            "scale": jnp.asarray(tnn.BatchNorm2d(c).weight.detach().numpy()),
            "bias": jnp.zeros((c,)),
        },
        "batch_stats": variables["batch_stats"],
    }
    got1, mut = mod.apply(
        params, jnp.asarray(nchw_to_nhwc(x1)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got1)), want1, **TOL)
    params2 = {"params": params["params"], "batch_stats": mut["batch_stats"]}
    got2, mut2 = mod.apply(
        params2, jnp.asarray(nchw_to_nhwc(x2)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got2)), want2, **TOL)
    # running stats after two steps must match torch's
    np.testing.assert_allclose(
        np.asarray(mut2["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        **TOL,
    )
    np.testing.assert_allclose(
        np.asarray(mut2["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        **TOL,
    )
    params_eval = {"params": params["params"], "batch_stats": mut2["batch_stats"]}
    got_eval = mod.apply(params_eval, jnp.asarray(nchw_to_nhwc(x1)), train=False)
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got_eval)), want_eval, **TOL)


def test_convblock_bn_ordering_saturating_vs_not():
    """Sigmoid => act-then-BN; LeakyReLU => BN-then-act
    (ModificationLayer.py:141-151)."""
    cin, cout = 3, 5
    x = rand_nchw(4, cin, 6, 6, seed=21)
    tconv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
    tbn = tnn.BatchNorm2d(cout)
    tbn.train()

    tx = torch.from_numpy(x)
    want_sig = tbn(torch.sigmoid(tconv(tx))).detach().numpy()

    mod = ConvBlock(
        cin, cout, 3, 1, 1, weight_init="kaiming",
        activation=act_lib.SIGMOID, use_batchnorm=True,
    )
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x)))
    variables["params"]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(tconv.weight))
    got, _ = mod.apply(
        variables, jnp.asarray(nchw_to_nhwc(x)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want_sig, **TOL)

    tbn2 = tnn.BatchNorm2d(cout)
    tbn2.train()
    want_lrelu = (
        torch.nn.functional.leaky_relu(tbn2(tconv(tx)), 0.01).detach().numpy()
    )
    mod2 = ConvBlock(
        cin, cout, 3, 1, 1, weight_init="kaiming",
        activation=act_lib.LEAKY_RELU, use_batchnorm=True,
    )
    variables2 = mod2.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x)))
    variables2["params"]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(tconv.weight))
    got2, _ = mod2.apply(
        variables2, jnp.asarray(nchw_to_nhwc(x)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got2)), want_lrelu, **TOL)


def test_convblock_bias_iff_no_batchnorm():
    mod = ConvBlock(3, 4, 3, use_batchnorm=True)
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert "bias" not in v["params"]["conv"]
    mod2 = ConvBlock(3, 4, 3, use_batchnorm=False)
    v2 = mod2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert "bias" in v2["params"]["conv"]


def test_residual_block_matches_hand_computation():
    """ResidualBlock(in==out, k3, s1): act(conv1(act(conv0(x))) + x)."""
    c = 4
    x = rand_nchw(2, c, 8, 8, seed=31)
    t0 = tnn.Conv2d(c, c, 3, 1, 1, bias=True)
    t1 = tnn.Conv2d(c, c, 3, 1, 1, bias=True)
    tx = torch.from_numpy(x)
    want = torch.nn.functional.leaky_relu(
        t1(torch.nn.functional.leaky_relu(t0(tx), 0.01)) + tx, 0.01
    ).detach().numpy()

    mod = ResidualBlock(c, activation=act_lib.LEAKY_RELU)
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, c)))
    v["params"]["conv0"]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(t0.weight))
    v["params"]["conv0"]["conv"]["bias"] = jnp.asarray(t0.bias.detach().numpy())
    v["params"]["conv1"]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(t1.weight))
    v["params"]["conv1"]["conv"]["bias"] = jnp.asarray(t1.bias.detach().numpy())
    got = mod.apply(v, jnp.asarray(nchw_to_nhwc(x)))
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_residual_block_k2_reflect_preserves_shape():
    """The 8x8 fusion blocks: k2 + ReflectionPad [1,0,1,0] keep spatial
    size (D_and_G_model.py:235-237)."""
    mod = ResidualBlock(
        8, 8, kernel_size=2, padding=(1, 0, 1, 0), activation=act_lib.LEAKY_RELU
    )
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
    y = mod.apply(v, jnp.ones((2, 8, 8, 8)))
    assert y.shape == (2, 8, 8, 8)


def test_residual_block_bottleneck_shapes():
    mod = ResidualBlock(
        16, 16, kernel_size=3, is_bottleneck=True, activation=act_lib.LEAKY_RELU
    )
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))
    y = mod.apply(v, jnp.ones((2, 8, 8, 16)))
    assert y.shape == (2, 8, 8, 16)


def test_residual_block_rejects_invalid_identity():
    with pytest.raises(ValueError):
        mod = ResidualBlock(16, 8)
        mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))


def test_residual_block_scaling_factor():
    c = 4
    x = jnp.ones((1, 4, 4, c))
    mod = ResidualBlock(c, scaling_factor=0.0, activation=None)
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)
    # scaling 0 => pure main path (no shortcut contribution)
    mod_main = ResidualBlock(c, scaling_factor=1.0, activation=None)
    got_full = mod_main.apply(v, x)
    np.testing.assert_allclose(np.asarray(got_full - got), np.ones_like(got), rtol=1e-5)


def test_linear_block_matches_torch():
    fin, fout = 12, 7
    x = rand_nchw(3, fin, 1, 1, seed=41)[:, :, 0, 0]
    tlin = tnn.Linear(fin, fout)
    want = tlin(torch.from_numpy(x)).detach().numpy()
    mod = LinearBlock(fin, fout)
    params = {
        "params": {
            "kernel": jnp.asarray(tlin.weight.detach().numpy().T),
            "bias": jnp.asarray(tlin.bias.detach().numpy()),
        }
    }
    got = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_kaiming_init_statistics():
    """Init distribution parity: std of kaiming-normal kernels matches
    torch's gain/sqrt(fan_in)."""
    from tpgan_tpu.ops import initializers as init_lib

    k = init_lib.kaiming_normal_conv(0.01)(
        jax.random.PRNGKey(0), (3, 3, 64, 64), jnp.float32
    )
    fan_in = 3 * 3 * 64
    expected_std = np.sqrt(2.0 / (1 + 0.01**2)) / np.sqrt(fan_in)
    assert abs(float(jnp.std(k)) - expected_std) / expected_std < 0.05

    kd = init_lib.kaiming_normal_deconv(0.0)(
        jax.random.PRNGKey(0), (3, 3, 32, 128), jnp.float32
    )
    expected_std_d = np.sqrt(2.0) / np.sqrt(128 * 9)
    assert abs(float(jnp.std(kd)) - expected_std_d) / expected_std_d < 0.05


def test_convblock_pre_activation_matches_torch():
    """pre_activation moves the BN/act packaging before the conv, sized
    by in_channels (ModificationLayer.py:116-119)."""
    cin, cout = 4, 6
    x = rand_nchw(3, cin, 6, 6, seed=51)
    tconv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
    tbn = tnn.BatchNorm2d(cin)
    tbn.train()
    tx = torch.from_numpy(x)
    want = tconv(torch.nn.functional.leaky_relu(tbn(tx), 0.01)).detach().numpy()

    mod = ConvBlock(
        cin, cout, 3, 1, 1, weight_init="kaiming",
        activation=act_lib.LEAKY_RELU, use_batchnorm=True, pre_activation=True,
    )
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x)))
    v["params"]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(tconv.weight))
    got, _ = mod.apply(
        v, jnp.asarray(nchw_to_nhwc(x)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_residual_block_bottleneck_matches_torch():
    """Bottleneck: act(c2(act(c1(act(c0(x))))) + x) with 1x1 -> kxk -> 1x1
    and halved mid channels (ModificationLayer.py:286-290)."""
    c = 8
    x = rand_nchw(2, c, 8, 8, seed=61)
    t0 = tnn.Conv2d(c, c // 2, 1, 1, 0)
    t1 = tnn.Conv2d(c // 2, c // 2, 3, 1, 1)
    t2 = tnn.Conv2d(c // 2, c, 1, 1, 0)
    tx = torch.from_numpy(x)
    lr = lambda t: torch.nn.functional.leaky_relu(t, 0.01)
    want = lr(t2(lr(t1(lr(t0(tx))))) + tx).detach().numpy()

    mod = ResidualBlock(
        c, c, kernel_size=3, is_bottleneck=True, activation=act_lib.LEAKY_RELU
    )
    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, c)))
    for name, t in (("conv0", t0), ("conv1", t1), ("conv2", t2)):
        v["params"][name]["conv"]["kernel"] = jnp.asarray(conv_w_to_hwio(t.weight))
        v["params"][name]["conv"]["bias"] = jnp.asarray(t.bias.detach().numpy())
    got = mod.apply(v, jnp.asarray(nchw_to_nhwc(x)))
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_deconvblock_bn_ordering():
    """DeconvBlock with BN: deconv -> BN -> ReLU, bias omitted
    (ModificationLayer.py:187-198)."""
    cin, cout = 4, 6
    x = rand_nchw(3, cin, 5, 5, seed=71)
    td = tnn.ConvTranspose2d(cin, cout, 3, 2, 1, output_padding=1, bias=False)
    tbn = tnn.BatchNorm2d(cout)
    tbn.train()
    want = torch.relu(tbn(td(torch.from_numpy(x)))).detach().numpy()

    mod = DeconvBlock(
        cin, cout, 3, 2, 1, 1, weight_init="kaiming",
        activation=("relu", 0.0), use_batchnorm=True,
    )
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(nchw_to_nhwc(x)))
    assert "bias" not in v["params"]["deconv"]
    v["params"]["deconv"]["kernel"] = jnp.asarray(deconv_w_to_ours(td.weight))
    got, _ = mod.apply(
        v, jnp.asarray(nchw_to_nhwc(x)), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(nhwc_to_nchw(np.asarray(got)), want, **TOL)


def test_linear_block_with_bn():
    """LinearBlock with BN: no bias, BN over features, then activation."""
    fin, fout = 6, 5
    x = rand_nchw(4, fin, 1, 1, seed=81)[:, :, 0, 0]
    tlin = tnn.Linear(fin, fout, bias=False)
    tbn = tnn.BatchNorm1d(fout)
    tbn.train()
    want = torch.relu(tbn(tlin(torch.from_numpy(x)))).detach().numpy()

    mod = LinearBlock(fin, fout, activation=("relu", 0.0), use_batchnorm=True)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "bias" not in v["params"]
    v["params"]["kernel"] = jnp.asarray(tlin.weight.detach().numpy().T)
    got, _ = mod.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_pad_in_multiple_semantics_preserving():
    """Channel padding (VERDICT r1 item 3): the padded-conv output equals
    the unpadded conv EXACTLY when the real kernel rows agree — the extra
    rows only ever multiply zeros. The half-tile guard skips narrow
    inputs."""
    from tpgan_tpu.ops.blocks import Conv2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 75).astype(np.float32))

    ref = Conv2d(75, 32, 3, padding=1, accum_f32=False)
    pad = Conv2d(75, 32, 3, padding=1, accum_f32=False, pad_in_multiple=128)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_pad = pad.init(jax.random.PRNGKey(1), x)
    assert v_pad["params"]["kernel"].shape == (3, 3, 128, 32)

    # surgery: copy the real rows + bias, leave the extra rows random
    k = np.asarray(v_pad["params"]["kernel"]).copy()
    k[:, :, :75, :] = np.asarray(v_ref["params"]["kernel"])
    v_pad = {"params": {"kernel": jnp.asarray(k), "bias": v_ref["params"]["bias"]}}

    want = ref.apply(v_ref, x)
    got = pad.apply(v_pad, x)
    # mathematically identical (zeros contribute +0); only the reduction
    # ORDER differs between a 75- and a 128-wide contraction, so compare
    # to float accumulation tolerance rather than bitwise
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    # guard: narrow inputs (<= multiple//2) are never padded
    narrow = Conv2d(3, 16, 3, padding=1, pad_in_multiple=128)
    v = narrow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    assert v["params"]["kernel"].shape == (3, 3, 3, 16)

    # gradients to the padding rows are exactly zero -> training parity
    def loss(kernel):
        return jnp.sum(
            pad.apply({"params": {"kernel": kernel,
                                  "bias": v_pad["params"]["bias"]}}, x) ** 2
        )

    g = jax.grad(loss)(v_pad["params"]["kernel"])
    np.testing.assert_array_equal(np.asarray(g[:, :, 75:, :]), 0.0)


def test_pad_channel_multiple_generator_traces():
    """The padded full-size generator traces with widened kernels on the
    off-tile blocks only."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import build_models

    cfg = make_config({"G": {"pad_channel_multiple": 128},
                       "compute_dtype": "float32"})
    gen, _ = build_models(cfg)
    b = 2
    args = (
        jnp.zeros((b, 128, 128, 3)), jnp.zeros((b, 40, 40, 3)),
        jnp.zeros((b, 40, 40, 3)), jnp.zeros((b, 32, 40, 3)),
        jnp.zeros((b, 32, 48, 3)), jnp.zeros((b, 64)),
    )
    variables = jax.eval_shape(gen.init, jax.random.PRNGKey(0), *args)
    gp = variables["params"]["global_pathway"]
    # add_128: 75 -> 128 on both convs' input dim
    assert gp["add_128"]["conv0"]["conv"]["kernel"].shape[2] == 128
    # enhance_128: 206 -> 256
    assert gp["enhance_128"]["conv0"]["conv"]["kernel"].shape[2] == 256
    # encoder stem untouched (RGB input)
    assert gp["conv0_conv"]["conv"]["kernel"].shape[2] == 3
    out = jax.eval_shape(gen.apply, variables, *args)
    assert out.img128_fake.shape == (b, 128, 128, 3)


def test_generator_subpixel_mode_matches_deconv():
    """G.upsample_mode="subpixel" is the SAME generator (identical param
    tree — checkpoints interchange) computed via the phase-decomposed
    deconvs; the full forward must match the dilated reference path to
    float tolerance on every output."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import create_gan_state, example_batch

    small = {
        "G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
        "D": {"fm_multiplier": 0.25},
        "compute_dtype": "float32",
    }
    cfg_a = make_config({**small, "G": {**small["G"], "upsample_mode": "deconv"}})
    cfg_b = make_config({**small, "G": {**small["G"], "upsample_mode": "subpixel"}})
    state, gen_a, *_ = create_gan_state(cfg_a, jax.random.PRNGKey(0))
    _, gen_b, *_ = create_gan_state(cfg_b, jax.random.PRNGKey(0))

    batch = example_batch(2)
    z = jnp.zeros((2, cfg_a.G.zdim), jnp.float32)
    kw = dict(use_dropout=False)
    out_a = gen_a.apply(
        {"params": state.g_params}, batch["img"], batch["left_eye"],
        batch["right_eye"], batch["nose"], batch["mouth"], z, **kw)
    out_b = gen_b.apply(
        {"params": state.g_params}, batch["img"], batch["left_eye"],
        batch["right_eye"], batch["nose"], batch["mouth"], z, **kw)
    for name, a, b in zip(out_a._fields, out_a, out_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
