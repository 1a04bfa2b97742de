"""The GAN train step — the piece the reference configures but never
implements (SURVEY.md §3.3: loss weights config.py:71-82, train params
config.py:50-57, ``set_requires_grad`` UtilityMethods.py:43-56, the
Generator 8-tuple D_and_G_model.py:407, and the 4x4 PatchGAN critic
D_and_G_model.py:430-431).

TPU-native design:

* One jitted step performs the full D-then-G alternation. Gradient
  isolation uses ``stop_gradient`` / separate ``jax.grad`` calls instead
  of requires_grad toggling.
* Data parallelism is pure GSPMD: the step is jitted with the batch
  sharded over the mesh's ``data`` axis and parameters replicated; the
  mean-reduction in every loss makes XLA insert the gradient all-reduce
  over ICI by itself. No pmap, no axis_name plumbing.
* Buffers are donated: the previous state's memory is reused in-place.
* The G step sees the *updated* critic (a strictly more on-policy
  alternation than two separate un-fused steps, and it keeps everything
  in one XLA program so the generator forward for the D step and the
  G step can share layout decisions).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpgan_tpu.config import Config
from tpgan_tpu.losses.composite import (
    generator_loss_components,
    total_generator_loss,
)
from tpgan_tpu.losses.gan import discriminator_loss, gradient_penalty
from tpgan_tpu.models.discriminator import Discriminator
from tpgan_tpu.models.generator import Generator
from tpgan_tpu.models.local_fuser import fuse_parts
from tpgan_tpu.train.optim import adam_wgan

Batch = Mapping[str, jnp.ndarray]
IdentityEmbedFn = Callable[[jnp.ndarray], jnp.ndarray]


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    # BatchNorm running statistics (empty dicts when use_batchnorm=False,
    # the reference GAN config default, config.py:62,68)
    g_batch_stats: Any = flax.struct.field(default_factory=dict)
    d_batch_stats: Any = flax.struct.field(default_factory=dict)
    # EMA of the generator weights (empty dict when train.ema_decay=0;
    # empty subtrees carry no leaves, so old checkpoints restore cleanly)
    g_ema_params: Any = flax.struct.field(default_factory=dict)


def eval_g_params(state: "GANTrainState", select: str = "auto"):
    """The generator weights inference/eval should use.

    ``select='auto'`` (default): the EMA copy when one is being tracked
    (train.ema_decay > 0), else the live weights. ``'ema'`` / ``'live'``
    force one side — needed e.g. for EMA-vs-live A/Bs, where 'auto'
    would silently score the EMA arm twice now that ema_decay defaults
    on (the round-4 eval_ema_ab_ema_live regression)."""
    if select == "live":
        return state.g_params
    if select == "ema":
        if not state.g_ema_params:
            raise ValueError(
                "checkpoint tracks no EMA weights (train.ema_decay=0)"
            )
        return state.g_ema_params
    if select != "auto":
        raise ValueError(f"select must be auto|ema|live, got {select!r}")
    return state.g_ema_params if state.g_ema_params else state.g_params


def build_models(cfg: Config, dtype=None) -> Tuple[Generator, Discriminator]:
    import jax.numpy as jnp  # local to avoid shadowing

    dtype = dtype or jnp.dtype(cfg.compute_dtype)
    # accum_f32=False: training differentiates every conv (incl. twice
    # through the critic for WGAN-GP); f32-emitting convs break jax's conv
    # transpose rule under bf16. Inference paths clone with accum_f32=True
    # for the ~30% faster MXU f32-emit kernels.
    gen = Generator(
        zdim=cfg.G.zdim,
        num_classes=cfg.G.num_classes,
        use_batchnorm=cfg.G.use_batchnorm,
        use_residual_block=cfg.G.use_residual_block,
        fm_multiplier=cfg.G.fm_multiplier,
        local_feature_layer_dim=cfg.G.local_feature_layer_dim,
        dtype=dtype,
        accum_f32=False,
        pad_channel_multiple=cfg.G.pad_channel_multiple,
        upsample_mode=cfg.G.upsample_mode,
    )
    disc = Discriminator(
        use_batchnorm=cfg.D.use_batchnorm,
        fm_multiplier=cfg.D.fm_multiplier,
        dtype=dtype,
        accum_f32=False,
    )
    return gen, disc


def example_batch(batch_size: int = 1, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """A zeros batch with the TrainDataset tensor contract
    (reference: DataAndDataset.py:200-227): profile image + frontal GT at
    three scales + 4 profile patches + 4 frontal patches + subject label."""
    b = batch_size
    z = lambda *s: jnp.zeros(s, dtype)
    batch = {
        "img": z(b, 128, 128, 3),
        "img64": z(b, 64, 64, 3),
        "img32": z(b, 32, 32, 3),
        "img_frontal": z(b, 128, 128, 3),
        "img64_frontal": z(b, 64, 64, 3),
        "img32_frontal": z(b, 32, 32, 3),
        "left_eye": z(b, 40, 40, 3),
        "right_eye": z(b, 40, 40, 3),
        "nose": z(b, 32, 40, 3),
        "mouth": z(b, 32, 48, 3),
        "left_eye_frontal": z(b, 40, 40, 3),
        "right_eye_frontal": z(b, 40, 40, 3),
        "nose_frontal": z(b, 32, 40, 3),
        "mouth_frontal": z(b, 32, 48, 3),
        "label": jnp.zeros((b,), jnp.int32),
    }
    return batch


def create_gan_state(
    cfg: Config, rng: jax.Array, dtype=None
) -> Tuple[GANTrainState, Generator, Discriminator, optax.GradientTransformation, optax.GradientTransformation]:
    gen, disc = build_models(cfg, dtype)
    g_rng, d_rng = jax.random.split(rng)
    batch = example_batch(1, jnp.float32)
    # jit the inits: one fused XLA program instead of per-op eager
    # compilation (hundreds of convs otherwise compile one by one)
    g_vars = jax.jit(gen.init)(
        g_rng,
        batch["img"], batch["left_eye"], batch["right_eye"],
        batch["nose"], batch["mouth"], jnp.zeros((1, cfg.G.zdim)),
    )
    d_vars = jax.jit(disc.init)(d_rng, batch["img"])
    g_tx = adam_wgan(cfg.train.learning_rate, cfg.train.beta1, cfg.train.beta2)
    d_tx = adam_wgan(cfg.train.learning_rate, cfg.train.beta1, cfg.train.beta2)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        g_opt_state=g_tx.init(g_vars["params"]),
        d_opt_state=d_tx.init(d_vars["params"]),
        g_batch_stats=dict(g_vars.get("batch_stats", {})),
        d_batch_stats=dict(d_vars.get("batch_stats", {})),
        g_ema_params=(
            jax.tree.map(jnp.copy, g_vars["params"])
            if float(getattr(cfg.train, "ema_decay", 0.0) or 0.0) > 0
            else {}
        ),
    )
    return state, gen, disc, g_tx, d_tx


def decode_u8_batch(batch: Batch) -> Batch:
    """On-device uint8 -> [-1, 1] decode (endpoint-exact, matching the
    native host kernel). Ships 4x less data over host->HBM (and the axon
    tunnel) than float32 batches; XLA fuses the conversion into the first
    consumers. Non-uint8 leaves pass through, so float pipelines are
    unaffected."""

    def dec(x):
        if x.dtype == jnp.uint8:
            return (2.0 * x.astype(jnp.float32) - 255.0) / 255.0
        return x

    return {k: dec(v) for k, v in batch.items()}


def make_gan_train_step(
    cfg: Config,
    gen: Generator,
    disc: Discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    identity_embed: Optional[IdentityEmbedFn] = None,
):
    """Build the fused D+G train step. Jit it (optionally with shardings)
    via ``jax.jit(step, donate_argnums=0)``."""
    loss_cfg = cfg.loss
    zdim = cfg.G.zdim
    ema_decay = float(getattr(cfg.train, "ema_decay", 0.0) or 0.0)

    def ema_update(ema, new_params):
        """Lerp the EMA weights toward the freshly updated generator
        (no-op pytree when EMA tracking is off)."""
        if ema_decay <= 0.0:
            return ema
        return jax.tree.map(
            lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
            ema, new_params,
        )
    # Measured (v5e, b=128, same session): using the f32-emitting conv
    # variant for the stop-gradient D-step G forward LOWERS whole-step
    # throughput (184 vs 206 imgs/s) — the mixed conv flavours defeat
    # XLA's sharing/fusion between the two generator forwards. The fused
    # step therefore keeps one uniform grad-safe generator.

    def _g_forward_with(module, g_params, g_stats, batch: Batch, z, drop_rng):
        """Generator forward in train mode. Returns (out, new batch
        stats); with BN disabled the stats are empty dicts throughout."""
        out, mutated = module.apply(
            {"params": g_params, "batch_stats": g_stats},
            batch["img"], batch["left_eye"], batch["right_eye"],
            batch["nose"], batch["mouth"], z,
            use_dropout=True,
            train=True,
            rngs={"dropout": drop_rng},
            mutable=["batch_stats"],
        )
        return out, dict(mutated.get("batch_stats", {}))

    def g_forward(g_params, g_stats, batch: Batch, z, drop_rng):
        return _g_forward_with(gen, g_params, g_stats, batch, z, drop_rng)

    remat_scope = str(
        getattr(cfg.train, "remat_scope", "generator") or "generator"
    )
    if cfg.train.remat and remat_scope not in ("generator", "critic", "both"):
        raise ValueError(
            f"train.remat_scope={remat_scope!r}: expected "
            "'generator' | 'critic' | 'both'"
        )
    if cfg.train.remat and remat_scope in ("generator", "both"):
        # rematerialise the generator forward during backward: activations
        # are recomputed instead of held in HBM (jax.checkpoint), letting
        # the per-chip batch grow past the activation-memory wall
        g_forward = jax.checkpoint(g_forward)
    remat_critic = bool(cfg.train.remat) and remat_scope in ("critic", "both")

    def _critic_core(d_params_, stats, x):
        """One critic apply as a pure function of (params, stats, input)
        so ``jax.checkpoint`` can rematerialise it — this covers the
        WGAN-GP double backward (grad w.r.t. d_params of grad w.r.t. x),
        whose saved intermediates are the measured per-chip HBM wall
        (docs/BENCHMARKS.md)."""
        out, mutated = disc.apply(
            {"params": d_params_, "batch_stats": stats},
            x, train=True, mutable=["batch_stats"],
        )
        return out, dict(mutated.get("batch_stats", {}))

    if remat_critic:
        _critic_core = jax.checkpoint(_critic_core)

    def d_phase(g_params, g_stats_in, d_params, d_base_stats,
                batch: Batch, z, gp_rng, drop_rng):
        """Critic phase on one (micro)batch: stop-gradient G forward +
        WGAN-GP critic loss and its grads w.r.t. ``d_params``. Pure in
        all inputs so it serves both the plain step and the
        grad-accumulation ``lax.scan`` body."""
        real = batch["img_frontal"]
        g_out_d, g_stats = g_forward(g_params, g_stats_in, batch, z, drop_rng)
        fake_for_d = jax.lax.stop_gradient(g_out_d.img128_fake)

        def d_loss_fn(d_params_):
            # train-mode critic; running stats persist from the
            # real-images pass only (the fake/GP passes normalise with
            # their own batch stats but don't advance the running ones —
            # output-equivalent to torch's sequential updates)
            real_scores, d_stats = _critic_core(d_params_, d_base_stats, real)
            fake_scores, _ = _critic_core(d_params_, d_base_stats, fake_for_d)
            gp = gradient_penalty(
                lambda x: _critic_core(d_params_, d_base_stats, x)[0],
                real, fake_for_d, gp_rng,
            )
            w_loss = discriminator_loss(real_scores, fake_scores)
            loss = w_loss + loss_cfg.weight_gradient_penalty * gp
            return loss, ({
                "d_wasserstein": w_loss,
                "d_gradient_penalty": gp,
                "d_real_mean": jnp.mean(real_scores),
                "d_fake_mean": jnp.mean(fake_scores),
            }, d_stats)

        (d_loss, (d_aux, d_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_params)
        return d_loss, d_aux, d_stats, d_grads, g_stats

    def g_phase(g_params, g_stats_in, d_params, d_stats,
                batch: Batch, z, drop_rng):
        """Generator phase on one (micro)batch against the (already
        updated) critic: all weighted loss terms and grads w.r.t.
        ``g_params``."""
        fused_frontal = fuse_parts(
            batch["left_eye_frontal"], batch["right_eye_frontal"],
            batch["nose_frontal"], batch["mouth_frontal"],
        )

        def g_loss_fn(g_params_):
            out, new_g_stats = g_forward(
                g_params_, g_stats_in, batch, z, drop_rng
            )
            fake_scores, _ = _critic_core(d_params, d_stats, out.img128_fake)
            comps = generator_loss_components(
                fake128=out.img128_fake,
                fake_scores=fake_scores,
                encoder_predict=out.encoder_predict,
                fused_local_fake=out.local_fake,
                fused_local_frontal=fused_frontal,
                gt128=batch["img_frontal"],
                gt64=batch["img64_frontal"],
                gt32=batch["img32_frontal"],
                labels=batch["label"],
                cfg=loss_cfg,
                identity_embed=identity_embed,
            )
            return total_generator_loss(comps, loss_cfg), (comps, new_g_stats)

        (g_loss, (g_comps, g_stats_new)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params)
        return g_loss, g_comps, g_stats_new, g_grads

    def train_step(
        state: GANTrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        batch = decode_u8_batch(batch)
        b = batch["img"].shape[0]
        z_rng, gp_rng, drop_rng, drop_rng2 = jax.random.split(rng, 4)
        z = jax.random.normal(z_rng, (b, zdim), jnp.float32)

        # ---------------- critic update (WGAN-GP) ----------------
        d_loss, d_aux, d_stats, d_grads, g_stats = d_phase(
            state.g_params, state.g_batch_stats, state.d_params,
            state.d_batch_stats, batch, z, gp_rng, drop_rng,
        )
        d_updates, d_opt_state = d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- generator update ----------------
        g_loss, g_comps, g_stats_new, g_grads = g_phase(
            state.g_params, g_stats, d_params, d_stats, batch, z, drop_rng2
        )
        g_updates, g_opt_state = g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {"d_loss": d_loss, "g_loss": g_loss, **d_aux}
        metrics.update({f"g_{k}": v for k, v in g_comps.items()})
        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            g_batch_stats=g_stats_new,
            d_batch_stats=d_stats,
            g_ema_params=ema_update(state.g_ema_params, g_params),
        )
        return new_state, metrics

    accum = max(int(getattr(cfg.train, "grad_accum_steps", 1) or 1), 1)
    if accum == 1:
        return train_step

    def accum_train_step(
        state: GANTrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """Grad-accumulation variant: the batch is split into ``accum``
        sequential microbatches inside the jitted step (lax.scan); grads
        are averaged before each optimizer update, so the critic/GP
        activation peak — the per-chip HBM wall past b=128
        (docs/BENCHMARKS.md) — scales with the microbatch while the
        optimizer sees the full-batch gradient. Each microbatch draws its
        own z/GP/dropout randomness; BatchNorm running stats (when
        enabled) advance sequentially through the scan, exactly like
        torch-style sequential microbatching."""
        batch = decode_u8_batch(batch)
        b = batch["img"].shape[0]
        if b % accum:
            raise ValueError(
                f"train.grad_accum_steps={accum} must divide the batch "
                f"size {b}"
            )
        micro = b // accum
        mbatch = {
            k: v.reshape((accum, micro) + v.shape[1:])
            for k, v in batch.items()
        }
        z_rng, gp_rng, drop_rng, drop_rng2 = jax.random.split(rng, 4)
        z = jax.random.normal(z_rng, (accum, micro, zdim), jnp.float32)
        gp_rngs = jax.random.split(gp_rng, accum)
        d1_rngs = jax.random.split(drop_rng, accum)
        d2_rngs = jax.random.split(drop_rng2, accum)

        # ---------------- critic update (WGAN-GP) ----------------
        zero_like_f32 = lambda tree: jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), tree
        )

        def d_body(carry, inp):
            g_stats_c, d_stats_c, grads_acc = carry
            mb, z_i, gp_i, dr_i = inp
            d_loss, d_aux, d_stats_c, d_grads, g_stats_c = d_phase(
                state.g_params, g_stats_c, state.d_params, d_stats_c,
                mb, z_i, gp_i, dr_i,
            )
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grads_acc, d_grads
            )
            return (g_stats_c, d_stats_c, grads_acc), (d_loss, d_aux)

        (g_stats, d_stats, d_grads_sum), (d_losses, d_auxes) = jax.lax.scan(
            d_body,
            (state.g_batch_stats, state.d_batch_stats,
             zero_like_f32(state.d_params)),
            (mbatch, z, gp_rngs, d1_rngs),
        )
        d_grads = jax.tree.map(
            lambda a, p: (a / accum).astype(p.dtype),
            d_grads_sum, state.d_params,
        )
        d_updates, d_opt_state = d_tx.update(
            d_grads, state.d_opt_state, state.d_params
        )
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- generator update ----------------
        def g_body(carry, inp):
            g_stats_c, grads_acc = carry
            mb, z_i, dr_i = inp
            g_loss, g_comps, g_stats_c, g_grads = g_phase(
                state.g_params, g_stats_c, d_params, d_stats, mb, z_i, dr_i
            )
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grads_acc, g_grads
            )
            return (g_stats_c, grads_acc), (g_loss, g_comps)

        (g_stats_new, g_grads_sum), (g_losses, g_compses) = jax.lax.scan(
            g_body,
            (g_stats, zero_like_f32(state.g_params)),
            (mbatch, z, d2_rngs),
        )
        g_grads = jax.tree.map(
            lambda a, p: (a / accum).astype(p.dtype),
            g_grads_sum, state.g_params,
        )
        g_updates, g_opt_state = g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)

        mean = lambda t: jax.tree.map(lambda x: jnp.mean(x, axis=0), t)
        metrics = {
            "d_loss": jnp.mean(d_losses),
            "g_loss": jnp.mean(g_losses),
            **mean(d_auxes),
        }
        metrics.update({f"g_{k}": v for k, v in mean(g_compses).items()})
        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            g_batch_stats=g_stats_new,
            d_batch_stats=d_stats,
            g_ema_params=ema_update(state.g_ema_params, g_params),
        )
        return new_state, metrics

    return accum_train_step


def make_multi_step(train_step, num_steps: int):
    """Wrap a train step into a ``lax.scan`` over ``num_steps`` so one
    host dispatch executes K optimizer steps back to back on-device.

    The wrapped function takes a super-batch pytree whose arrays carry a
    leading (num_steps, ...) axis and returns (final state, metrics
    stacked over steps). This amortises host->device dispatch latency —
    decisive when the host is remote from the chip (PJRT proxies) or slow
    relative to the step time, and harmless otherwise."""

    def multi_step(state, super_batch: Batch, rng: jax.Array):
        def body(carry, inputs):
            st, r = carry
            batch, = inputs
            r, sr = jax.random.split(r)
            st, metrics = train_step(st, batch, sr)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), (super_batch,), length=num_steps
        )
        return state, metrics

    return multi_step


def make_synthesize_fn(cfg: Config, gen: Generator):
    """Inference: profile image + patches + noise -> frontalized face.
    Jit-compile the returned function for serving. Uses the fast
    f32-emitting conv variant (same parameters, different compiled
    kernels — no grads on this path)."""
    gen = gen.clone(accum_f32=True)

    def synthesize(
        g_params, batch: Batch, z: jnp.ndarray, batch_stats=None
    ) -> jnp.ndarray:
        variables = {"params": g_params}
        if batch_stats:  # BN generators: eval-mode running statistics
            variables["batch_stats"] = batch_stats
        out = gen.apply(
            variables,
            batch["img"], batch["left_eye"], batch["right_eye"],
            batch["nose"], batch["mouth"], z,
            use_dropout=False,
        )
        return out.img128_fake

    return synthesize
