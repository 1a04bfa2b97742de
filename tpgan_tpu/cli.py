"""Command-line entry points: ``pretrain``, ``train``, ``synthesize``
(the reference exposes only bare scripts with no CLI — Pretrain.py run as
__main__, all knobs from config.py; SURVEY.md §1 L5).

Usage::

    python -m tpgan_tpu.cli pretrain  --set pretrain.batch_size=32
    python -m tpgan_tpu.cli train     --set train.batch_size=8 --steps 1000
    python -m tpgan_tpu.cli synthesize --image probe.png --landmarks lm.txt \
        --checkpoint ckpts --output out.png

Every ``--set a.b=value`` overrides the typed config tree
(tpgan_tpu.config mirrors every reference config.py key).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np

# Honour an explicit JAX_PLATFORMS request: this host's sitecustomize
# force-registers the tunneled-TPU plugin via jax.config, which SILENTLY
# overrides the env var — `JAX_PLATFORMS=cpu cli export` would otherwise
# run (and pin its artifact) on the TPU backend. The config value wins
# over the env var, so mirror it back before any backend initialises
# (same workaround as __graft_entry__.py / tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _enable_compile_cache() -> None:
    """Point every CLI run at the persistent XLA compilation cache.

    Without this each ``cli train``/``eval`` invocation re-compiles its
    programs from scratch — on the tunneled backend the fused GAN step
    costs minutes (the b=512 grad-accum step burned a full 1500 s
    experiment budget in compile alone, runs/accum_q_ab.log). Shares
    bench.py's cache dir so CLI runs and bench warm each other.
    Override with TPGAN_COMPILE_CACHE; set it empty to disable."""
    cache = os.environ.get("TPGAN_COMPILE_CACHE", "/tmp/jax_cache_bench")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_config(args):
    from tpgan_tpu.config import flat_override, make_config

    cfg = make_config()
    if args.set:
        cfg = flat_override(cfg, args.set)
    return cfg


def _nose_prior_for(args):
    """The serving nose plausibility gate's shape prior (fit at pretrain
    time, shipped in the checkpoint's detector_meta.json) — or None when
    the sidecar predates round 5 or ``--no-nose-gate`` asks for the
    ungated control arm."""
    if getattr(args, "no_nose_gate", False):
        return None
    from tpgan_tpu.train.pretrain import load_nose_prior

    return load_nose_prior(args.detector_checkpoint)


def cmd_pretrain(args) -> int:
    import jax

    from tpgan_tpu.data.celeba import CelebALandmarkDataset
    from tpgan_tpu.data.pipeline import batch_iterator
    from tpgan_tpu.train.metrics import MetricWriter
    from tpgan_tpu.train.pretrain import run_pretrain

    cfg = _build_config(args)
    p = cfg.pretrain
    ds = CelebALandmarkDataset(
        p.txt_name, p.data_root_dir, p.image_size, buckets=p.image_buckets
    )
    train_idx, val_idx, _ = ds.split(p.train_data_ratio, p.validation_data_ratio)
    steps_per_epoch = max(len(train_idx) // p.batch_size, 1)

    # serving-decode shape prior from the TRAIN-split annotations only
    # (the val split stays untouched for the error analyses); ships in
    # detector_meta.json next to head_mode
    from tpgan_tpu.train.pretrain import fit_nose_prior

    nose_prior = fit_nose_prior(np.stack([
        ds.labels[os.path.basename(ds.image_paths[i])] for i in train_idx
    ]))

    if getattr(args, "device_data", False):
        # whole dataset HBM-resident (per-bucket uint8 stacks), batches
        # gathered on device by index — the pretrain twin of
        # `train --device-data`, and the fix for the remoted-PJRT
        # per-device_put host buffer leak that OOM-killed the 1024-bucket
        # smoke (data/packing.py:load_pretrain_to_device)
        from tpgan_tpu.data.packing import (
            device_bucketed_batch_iterator,
            device_bucketed_eval_batches,
            load_pretrain_to_device,
            pixel_budget_batches,
        )

        train_groups = load_pretrain_to_device(ds, train_idx)
        val_groups = load_pretrain_to_device(ds, val_idx) if val_idx else {}
        # multi-bucket: hold pixels/step constant instead of images/step
        # (b=16 at 1024px needs 16x the activation HBM of b=16 at 256px)
        # computed over the union of train+val shapes so a bucket that
        # only appears in the val split still gets the scaled batch
        batch_for = (
            pixel_budget_batches({**val_groups, **train_groups},
                                 p.batch_size)
            if p.image_buckets else None
        )
        if batch_for:
            steps_per_epoch = max(1, int(sum(
                int(g["img"].shape[0]) / batch_for[k]
                for k, g in train_groups.items()
            )))
        train_it = device_bucketed_batch_iterator(
            train_groups, p.batch_size, seed=cfg.train.seed,
            batch_for=batch_for,
        )

        def val_batches():
            return device_bucketed_eval_batches(
                val_groups, p.batch_size, batch_for=batch_for
            )
    else:
        make_iter = batch_iterator
        if p.image_buckets:
            from tpgan_tpu.data.pipeline import bucketed_batch_iterator

            make_iter = bucketed_batch_iterator

        train_it = make_iter(
            ds, p.batch_size, shuffle=True, indices=train_idx, epochs=None
        )

        def val_batches():
            return make_iter(
                ds, p.batch_size, shuffle=False, indices=val_idx, epochs=1,
                drop_last=False,
            )

    writer = MetricWriter(os.path.join(p.log_root_dir, p.model_name))
    run_pretrain(
        cfg,
        train_it,
        val_batches_fn=val_batches if val_idx else None,
        steps_per_epoch=steps_per_epoch,
        writer=writer,
        checkpoint_dir=args.checkpoint or cfg.train.checkpoint_dir,
        resume=args.resume,
        nose_prior=nose_prior,
    )
    writer.close()
    return 0


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)

    from tpgan_tpu.data.multipie import TrainDataset
    from tpgan_tpu.data.pipeline import batch_iterator, prefetch_to_device
    from tpgan_tpu.train.loop import run_gan_training
    from tpgan_tpu.train.metrics import MetricWriter

    cfg = _build_config(args)
    if args.packed:
        # packed memmap shards: no per-item PIL decodes on the hot path
        # (data/packing.py) — the production input format. Batches stay
        # uint8 through host->HBM (4x less tunnel/PCIe traffic); the
        # jitted train step decodes on device.
        from tpgan_tpu.data.packing import PackedDataset

        ds = PackedDataset(args.packed, to_float=False)
    else:
        with open(cfg.train.img_list) as f:
            img_list = [line.strip() for line in f if line.strip()]
        ds = TrainDataset(img_list)

    identity_embed = None
    if args.identity_checkpoint:
        from tpgan_tpu.models.feature_extract import (
            FeatureExtractModel,
            make_identity_embed_fn,
        )
        from tpgan_tpu.train.checkpoint import (
        restore_checkpoint,
        restore_gan_checkpoint,
    )

        # opt-in bf16 embedder forward: the identity loss only needs the
        # feature DIRECTION (cosine/L1 scale), not f32 precision, and the
        # frozen embedder is ~1/3 of G-step FLOPs — bf16 halves its MXU
        # cost. Params stay f32 in the checkpoint; casting happens in
        # the conv compute dtype (accum_f32 keeps reductions stable).
        fx_dtype = (
            jnp.bfloat16 if args.identity_embed_dtype == "bfloat16"
            else jnp.float32
        )
        fx = FeatureExtractModel(
            base_model_name=cfg.feature_extract_model.base_model_name,
            num_of_output_classes=cfg.feature_extract_model.num_of_output_classes,
            dtype=fx_dtype,
            # the embedder is differentiated (identity loss backprops into
            # G); f32 preferred_element_type is incompatible with conv
            # VJPs under bf16 (ops/blocks.py:92-96)
            accum_f32=(fx_dtype == jnp.float32),
        )
        fx_vars = jax.jit(fx.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        fx_vars = restore_checkpoint(args.identity_checkpoint, fx_vars)
        if fx_dtype == jnp.bfloat16:
            # store the frozen params in bf16 outright: flax's dtype=
            # bf16 would otherwise re-cast every f32 param on every
            # step (a fusion boundary per conv — the suspected cost
            # behind the round-4 probe's -6%, docs/BENCHMARKS.md).
            # The checkpoint on disk stays f32; this cast is load-time.
            fx_vars = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                fx_vars,
            )
        identity_embed = make_identity_embed_fn(fx, fx_vars)

    steps_total = args.steps or cfg.train.num_epochs * max(
        len(ds) // cfg.train.batch_size, 1
    )
    if args.device_data:
        if not args.packed:
            raise SystemExit("--device-data requires --packed shards")
        from tpgan_tpu.data.packing import (
            device_batch_iterator,
            load_packed_to_device,
        )

        # whole dataset lives in HBM; batches gathered on device by
        # index — ~zero H2D per step (see packing.load_packed_to_device)
        print("[train] loading packed dataset to device...", file=sys.stderr)
        data_dev = load_packed_to_device(args.packed)
        jax.block_until_ready(data_dev)
        print("[train] dataset resident in HBM", file=sys.stderr)
        sample_weights = None
        if cfg.train.yaw_weight_gamma > 0:
            # per-item sampling weight from the camera token's yaw
            # (see config.train.yaw_weight_gamma); items whose camera
            # token is unknown (e.g. non-Multi-PIE names) weigh 1.0
            from tpgan_tpu.data.multipie import camera_token
            from tpgan_tpu.data.synthetic_faces import ALL_CAMERA_YAWS

            gamma = float(cfg.train.yaw_weight_gamma)
            names = ds.names if hasattr(ds, "names") else [
                os.path.basename(p) for p in ds.img_list
            ]
            if names is None:
                raise SystemExit(
                    "train.yaw_weight_gamma needs per-item camera tokens"
                    " but the packed index records no names and no"
                    " sibling img.list matches — repack with the"
                    " current pack_dataset"
                )
            yaws = np.asarray([
                abs(ALL_CAMERA_YAWS.get(camera_token(n), 0.0))
                for n in names
            ])
            sample_weights = 1.0 + gamma * (yaws / 90.0) ** 2
            print(
                f"[train] yaw-weighted sampling gamma={gamma}: "
                f"max/min weight "
                f"{sample_weights.max():.2f}/{sample_weights.min():.2f}",
                file=sys.stderr,
            )
        batches = device_batch_iterator(
            data_dev, cfg.train.batch_size, seed=cfg.train.seed,
            weights=sample_weights,
        )
    else:
        batches = prefetch_to_device(
            batch_iterator(ds, cfg.train.batch_size, shuffle=True, epochs=None),
            size=2,
        )
    sample_fn = None
    if args.sample_dir:
        from tpgan_tpu.train.gan_trainer import create_gan_state
        from tpgan_tpu.train.sampling import make_sample_fn

        _, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
        sample_fn = make_sample_fn(cfg, gen, ds, args.sample_dir)

    writer = MetricWriter(args.log_dir or "./logs/gan")
    run_gan_training(
        cfg,
        batches,
        steps=steps_total,
        identity_embed=identity_embed,
        checkpoint_dir=args.checkpoint or cfg.train.checkpoint_dir,
        resume=args.resume,
        writer=writer,
        steps_per_dispatch=args.steps_per_dispatch,
        sample_fn=sample_fn,
        sample_every=args.sample_every,
    )
    writer.close()
    return 0


def cmd_synth_data(args) -> int:
    """Generate the procedural synthetic-face corpora (learnable stand-ins
    for Multi-PIE / CelebA): the GAN protocol builds the full Multi-PIE
    training layout (+ optional packed shards), the pretrain protocol the
    CelebA landmark layout."""
    import json

    out = {}
    if args.protocol in ("gan", "both"):
        from tpgan_tpu.data.synthetic_faces import generate_gan_protocol

        gan_root = os.path.join(args.out, "gan")
        train_list = generate_gan_protocol(
            gan_root, args.subjects, render_size=args.render_size
        )
        out["gan_img_list"] = os.path.join(gan_root, "img.list")
        out["gan_train_items"] = len(train_list)
        if args.pack:
            from tpgan_tpu.data.multipie import TrainDataset
            from tpgan_tpu.data.packing import pack_dataset

            packed_dir = os.path.join(gan_root, "packed")
            pack_dataset(TrainDataset(train_list), packed_dir)
            out["gan_packed"] = packed_dir
    if args.protocol in ("pretrain", "both"):
        from tpgan_tpu.data.synthetic_faces import generate_pretrain_protocol

        pre_root = os.path.join(args.out, "pretrain")
        txt = generate_pretrain_protocol(
            pre_root, args.pretrain_images, num_subjects=args.subjects
        )
        out["pretrain_root"] = pre_root
        out["pretrain_txt"] = txt
    print(json.dumps(out))
    return 0


def cmd_train_embedder(args) -> int:
    """Train the identity embedder (FeatureExtractModel) the reference
    assumes exists (config.py:84-85) — softmax-CE over subject ids on a
    Multi-PIE-named image tree."""
    from tpgan_tpu.data.multipie import IdentityImageDataset
    from tpgan_tpu.data.pipeline import batch_iterator
    from tpgan_tpu.train.feature_extract import run_feature_extract_training
    from tpgan_tpu.train.metrics import MetricWriter

    cfg = _build_config(args)
    with open(args.img_list) as f:
        img_list = [line.strip() for line in f if line.strip()]

    val_data = None
    if args.val_subjects > 0:
        # hold out WHOLE SUBJECTS: the classifier never sees them, so
        # the validation Rank-1/identity-sim measures embedding
        # generalization (what the GAN eval needs), not memorization
        from tpgan_tpu.data.multipie import camera_token

        subject = lambda p: int(os.path.basename(p).split("_")[0])
        camera = lambda p: camera_token(p)
        subjects = sorted({subject(p) for p in img_list})
        held = set(subjects[-args.val_subjects:])
        val_list = [p for p in img_list if subject(p) in held]
        img_list = [p for p in img_list if subject(p) not in held]
        gallery, probes = {}, []
        for p in val_list:
            if camera(p) == "051":  # frontal camera = gallery image
                gallery.setdefault(subject(p), p)
            else:
                probes.append(p)
        load = lambda paths: np.stack(
            [IdentityImageDataset([p])[0][0] for p in paths]
        )
        g_paths = [gallery[s] for s in sorted(gallery)]
        val_data = {
            "gallery_images": load(g_paths),
            "gallery_labels": np.asarray(sorted(gallery), np.int32),
            "probe_images": load(probes),
            "probe_labels": np.asarray([subject(p) for p in probes], np.int32),
        }
        print(f"[embedder] training on {len(subjects) - len(held)} subjects "
              f"({len(img_list)} images); holding out {len(held)} subjects "
              f"({len(val_data['probe_labels'])} probes / "
              f"{len(g_paths)} gallery)", file=sys.stderr)

    ds = IdentityImageDataset(img_list)
    batches = batch_iterator(
        ds, args.batch_size, shuffle=True, epochs=None
    )
    writer = MetricWriter(args.log_dir or "./logs/embedder")
    run_feature_extract_training(
        cfg,
        batches,
        steps=args.steps,
        writer=writer,
        checkpoint_dir=args.checkpoint or "./ckpt/embedder",
        use_augment=not args.no_augment,
        val_data=val_data,
        val_every=args.val_every,
    )
    writer.close()
    return 0


def cmd_eval(args) -> int:
    """Frontalization quality evaluation on a Multi-PIE-style file list
    (TrainDataset protocol): PSNR/SSIM vs the frontal ground truth and
    Rank-1 identification through the identity embedder (the BASELINE.md
    north-star quality metrics).

    ``--z-samples N`` scores N independent noise draws per probe and
    reports mean and spread, so the headline is robust to z.
    ``--detector-checkpoint`` switches the landmark source from the
    ground-truth annotations (reference TestDataset semantics,
    DataAndDataset.py:230-256) to the trained detector — the full-stack
    serving path — so the two runs quantify the detector's cost."""
    import json

    import jax
    import jax.numpy as jnp

    from tpgan_tpu.data.multipie import TrainDataset
    from tpgan_tpu.data.pipeline import batch_iterator
    from tpgan_tpu.evaluate import psnr, ssim
    from tpgan_tpu.train.checkpoint import (
        restore_checkpoint,
        restore_gan_checkpoint,
    )
    from tpgan_tpu.train.gan_trainer import (
        create_gan_state,
        eval_g_params,
        make_synthesize_fn,
    )

    cfg = _build_config(args)
    with open(cfg.train.img_list if not args.img_list else args.img_list) as f:
        img_list = [line.strip() for line in f if line.strip()]
    ds = TrainDataset(img_list)

    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        state = restore_gan_checkpoint(args.checkpoint, state)
    g_eval_params = eval_g_params(state, getattr(args, "g_weights", "auto"))
    synthesize = jax.jit(make_synthesize_fn(cfg, gen))

    frontalize = det_vars = None
    if getattr(args, "detector_checkpoint", None):
        from tpgan_tpu.frontalize import make_frontalize_fn
        from tpgan_tpu.train.pretrain import (
            apply_detector_meta,
            create_pretrain_state,
        )

        cfg = apply_detector_meta(cfg, args.detector_checkpoint)
        det_state, detector, _tx = create_pretrain_state(
            cfg, jax.random.PRNGKey(0)
        )
        det_state = restore_checkpoint(args.detector_checkpoint, det_state)
        det_vars = {"params": det_state.params,
                    "batch_stats": det_state.batch_stats}
        frontalize = jax.jit(make_frontalize_fn(
            cfg, detector, gen, detector_size=args.detector_size,
            tta=getattr(args, "detector_tta", False),
            allow_upscale=not getattr(args, "no_detector_upscale", False),
            refine=getattr(args, "detector_refine", False),
            nose_prior=_nose_prior_for(args),
        ))

    embed = None
    if args.identity_checkpoint:
        from tpgan_tpu.models.feature_extract import (
            FeatureExtractModel,
            make_identity_embed_fn,
        )

        fx = FeatureExtractModel(
            base_model_name=cfg.feature_extract_model.base_model_name,
            num_of_output_classes=cfg.feature_extract_model.num_of_output_classes,
        )
        fx_vars = jax.jit(fx.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        fx_vars = restore_checkpoint(args.identity_checkpoint, fx_vars)
        embed = jax.jit(make_identity_embed_fn(fx, fx_vars))

    # per-item metrics so the JSON can report the Multi-PIE-style
    # per-camera (yaw) breakdown as well as the aggregates; the z axis
    # (args.z_samples independent noise draws) is kept separate so the
    # JSON reports both the per-probe mean and the spread over z
    n_z = max(int(args.z_samples), 1)
    psnrs = [[] for _ in range(n_z)]
    ssims = [[] for _ in range(n_z)]
    id_sims = []
    probe_emb, probe_lbl, gallery = [], [], {}
    rng = jax.random.PRNGKey(args.seed)
    for batch in batch_iterator(ds, args.batch_size, shuffle=False, epochs=1,
                                drop_last=False):
        b = batch["img"].shape[0]
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        gt = jb["img_frontal"]
        rng, zr = jax.random.split(rng)
        for zi in range(n_z):
            z = jax.random.normal(
                jax.random.fold_in(zr, zi), (b, cfg.G.zdim)
            )
            if frontalize is not None:
                # full-stack path: reconstruct the raw uint8 profile from
                # the normalized tensor (lossless to 1/255) and let the
                # detector supply the landmarks
                raw = jnp.round(
                    (jnp.clip(jb["img"], -1, 1) + 1.0) * 127.5
                ).astype(jnp.uint8)
                fake, _lm5, _scores = frontalize(
                    g_eval_params, det_vars, raw, z
                )
            else:
                fake = synthesize(g_eval_params, jb, z)
            psnrs[zi].append(np.asarray(psnr(fake, gt, aggregate=False)))
            ssims[zi].append(np.asarray(ssim(fake, gt, aggregate=False)))
            if zi == 0 and embed is not None:
                pe = np.asarray(embed(fake))
                ge = np.asarray(embed(gt))
                probe_emb.append(pe)
                probe_lbl.append(batch["label"])
                # identity similarity: cosine(embed(fake_i), embed(frontal_i))
                pn = pe / np.maximum(
                    np.linalg.norm(pe, axis=-1, keepdims=True), 1e-12)
                gn = ge / np.maximum(
                    np.linalg.norm(ge, axis=-1, keepdims=True), 1e-12)
                id_sims.append(np.sum(pn * gn, axis=-1))
                for i, lbl in enumerate(batch["label"]):
                    gallery.setdefault(int(lbl), ge[i])

    psnr_z = np.stack([np.concatenate(p) for p in psnrs])  # (Z, N)
    ssim_z = np.stack([np.concatenate(s) for s in ssims])
    psnrs = psnr_z.mean(axis=0)  # per-item mean over z
    ssims = ssim_z.mean(axis=0)
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "num_images": int(psnrs.shape[0]),
           "landmarks": "detected" if frontalize is not None else "ground_truth"}
    if n_z > 1:
        # spread over z of the full-set mean: how much the headline moves
        # with the noise draw
        out["z_samples"] = n_z
        out["psnr_z_std"] = float(np.std(psnr_z.mean(axis=1)))
        out["ssim_z_std"] = float(np.std(ssim_z.mean(axis=1)))
    correct = None
    if id_sims:
        id_sims = np.concatenate(id_sims)
        out["identity_sim"] = float(np.mean(id_sims))
    if embed is not None and gallery:
        from tpgan_tpu.evaluate import rank1_correct

        g_lbl = np.asarray(sorted(gallery))
        g_emb = np.stack([gallery[int(l)] for l in g_lbl])
        correct = np.asarray(
            rank1_correct(
                jnp.asarray(np.concatenate(probe_emb)),
                jnp.asarray(np.concatenate(probe_lbl)),
                jnp.asarray(g_emb), jnp.asarray(g_lbl),
            )
        )
        out["rank1"] = float(np.mean(correct))

    # per-camera (yaw) breakdown — flattened Multi-PIE camera token
    # (DataAndDataset.py:203-205; pair-form labels normalise to the
    # same key, data/multipie.camera_token)
    from tpgan_tpu.data.multipie import camera_token

    cams = [camera_token(p) for p in ds.img_list]
    if len(cams) != len(psnrs):
        print(f"warning: per-camera breakdown skipped — {len(cams)} listed "
              f"items but {len(psnrs)} evaluated (unreadable items were "
              f"dropped by the iterator)", file=sys.stderr)
    else:
        per = {}
        for cam in sorted(set(cams)):
            sel = np.asarray([c == cam for c in cams])
            row = {"psnr": float(np.mean(psnrs[sel])),
                   "ssim": float(np.mean(ssims[sel])),
                   "n": int(sel.sum())}
            if correct is not None:
                row["rank1"] = float(np.mean(correct[sel]))
            if len(id_sims) == len(psnrs):
                row["identity_sim"] = float(np.mean(id_sims[sel]))
            per[cam] = row
        out["per_camera"] = per
    print(json.dumps(out))
    return 0


def cmd_prepare_data(args) -> int:
    """Build the Multi-PIE training layout (128 images + 32/64 pyramids +
    landmark patches + img.list) from raw images and 68-pt landmarks —
    the preprocessing step the reference assumes but never provides."""
    from tpgan_tpu.data.prepare import prepare_dataset

    with open(args.images) as f:
        image_paths = [l.strip() for l in f if l.strip()]
    with open(args.landmarks) as f:
        lm_strings = [l.strip() for l in f if l.strip()]
    train_list = prepare_dataset(image_paths, lm_strings, args.out)
    print(f"prepared {len(image_paths)} images; "
          f"{len(train_list)} training (non-frontal) entries -> "
          f"{args.out}/img.list")
    return 0


def cmd_synthesize(args) -> int:
    import jax
    import jax.numpy as jnp

    from tpgan_tpu.data.multipie import TestDataset
    from tpgan_tpu.train.checkpoint import restore_gan_checkpoint
    from tpgan_tpu.train.gan_trainer import (
        create_gan_state,
        eval_g_params,
        make_synthesize_fn,
    )

    cfg = _build_config(args)
    with open(args.landmarks) as f:
        lm = f.read().strip()
    ds = TestDataset([args.image], [lm])
    item = ds[0]

    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        state = restore_gan_checkpoint(args.checkpoint, state)
    synthesize = jax.jit(make_synthesize_fn(cfg, gen))
    batch = {k: jnp.asarray(v)[None] for k, v in item.items()}
    z = jax.random.normal(jax.random.PRNGKey(args.seed), (1, cfg.G.zdim))
    out = np.asarray(synthesize(
        eval_g_params(state, getattr(args, "g_weights", "auto")), batch, z
    ))[0]

    from PIL import Image

    img = ((np.clip(out, -1, 1) + 1) * 127.5).astype(np.uint8)
    Image.fromarray(img).save(args.output)
    print(f"wrote {args.output}")
    return 0


def cmd_export(args) -> int:
    """Serialise the synthesis function to a portable StableHLO artifact
    (tpgan_tpu.serving.export_synthesis): the serving deployable a
    binary loads WITHOUT Python tracing or any framework import
    (tests/test_serving.py proves out-of-process consumption). Uses the
    EMA generator weights when the checkpoint tracks them. ``--int8``
    exports the PTQ graph, calibrated on packed-dataset batches
    (``--calib-packed``) or the synthetic protocol."""
    import jax

    from tpgan_tpu.serving import export_synthesis
    from tpgan_tpu.train.checkpoint import restore_gan_checkpoint
    from tpgan_tpu.train.gan_trainer import create_gan_state, eval_g_params

    cfg = _build_config(args)
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        state = restore_gan_checkpoint(args.checkpoint, state)
    params = eval_g_params(state, getattr(args, "g_weights", "auto"))

    scales = None
    if args.int8:
        from tpgan_tpu.ops.quant import calibrate_synthesis

        keys = ("img", "left_eye", "right_eye", "nose", "mouth")
        if args.calib_packed:
            from tpgan_tpu.data.packing import PackedDataset

            ds = PackedDataset(args.calib_packed)
            idx = np.random.RandomState(args.seed).permutation(len(ds))
            batches = []
            for start in range(0, min(args.calib_items, len(ds)),
                               args.batch):
                items = [ds[int(i)] for i in idx[start : start + args.batch]]
                batches.append(
                    {k: np.stack([it[k] for it in items]) for k in keys}
                )
        else:
            from tpgan_tpu.data.synthetic import synthetic_gan_batch

            batches = [
                {k: v for k, v in synthetic_gan_batch(
                    args.batch, seed=s).items() if k in keys}
                for s in range(max(args.calib_items // args.batch, 1))
            ]
        scales = calibrate_synthesis(cfg, gen, params, batches)

    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms else None
    )
    import jax.numpy as jnp

    wdt = (jnp.bfloat16 if getattr(args, "weights_dtype", "float32")
           == "bfloat16" else None)
    rdt = (jnp.bfloat16 if getattr(args, "int8_rescale_dtype", "float32")
           == "bfloat16" else None)
    if getattr(args, "detector_checkpoint", None):
        # full-stack artifact: raw uint8 -> detector -> crops -> G
        from tpgan_tpu.serving import export_frontalize
        from tpgan_tpu.train.checkpoint import restore_checkpoint
        from tpgan_tpu.train.pretrain import (
            apply_detector_meta,
            create_pretrain_state,
        )

        cfg = apply_detector_meta(cfg, args.detector_checkpoint)
        det_state, detector, _tx = create_pretrain_state(
            cfg, jax.random.PRNGKey(0)
        )
        det_state = restore_checkpoint(args.detector_checkpoint, det_state)
        det_vars = {"params": det_state.params,
                    "batch_stats": det_state.batch_stats}
        hw = tuple(int(s) for s in args.input_size.split("x"))
        if len(hw) == 1:
            hw = (hw[0], hw[0])
        export_frontalize(
            cfg, detector, det_vars, gen, params, args.output,
            batch=args.batch, input_hw=hw,
            detector_size=args.detector_size,
            tta=getattr(args, "detector_tta", False),
            allow_upscale=not getattr(args, "no_detector_upscale", False),
            refine=getattr(args, "detector_refine", False),
            nose_prior=_nose_prior_for(args),
            platforms=platforms,
            quant_scales=scales, rescale_dtype=rdt,
            min_channels=getattr(args, "int8_min_channels", None),
            weights_dtype=wdt,
        )
        print(f"wrote {args.output} (full-stack "
              f"{'int8 PTQ G' if args.int8 else cfg.compute_dtype}, "
              f"input {hw[0]}x{hw[1]}, batch={args.batch}, platforms="
              f"{','.join(platforms) if platforms else 'current backend'})")
        return 0
    export_synthesis(
        cfg, gen, params, args.output, batch=args.batch,
        quant_scales=scales, platforms=platforms,
        rescale_dtype=rdt,
        min_channels=getattr(args, "int8_min_channels", None),
        weights_dtype=wdt,
    )
    print(f"wrote {args.output} "
          f"({'int8 PTQ' if args.int8 else cfg.compute_dtype}, "
          f"batch={args.batch}, platforms="
          f"{','.join(platforms) if platforms else 'current backend'})")
    return 0


def cmd_frontalize(args) -> int:
    """Full-stack inference: raw image(s) -> landmark DETECTION (the
    pretrained MobileNetV2+SSD) -> patches -> Generator -> frontal face.
    No landmark annotations needed — this is the flow the reference
    implies (it pretrains a landmark detector, then separately consumes
    landmark *files* in TestDataset) but never connects."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tpgan_tpu.frontalize import make_frontalize_fn
    from tpgan_tpu.train.checkpoint import (
        restore_checkpoint,
        restore_gan_checkpoint,
    )
    from tpgan_tpu.train.gan_trainer import create_gan_state, eval_g_params
    from tpgan_tpu.train.pretrain import (
        apply_detector_meta,
        create_pretrain_state,
    )

    cfg = _build_config(args)
    cfg = apply_detector_meta(cfg, args.detector_checkpoint)
    det_state, detector, _tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    det_state = restore_checkpoint(args.detector_checkpoint, det_state)
    det_vars = {
        "params": det_state.params, "batch_stats": det_state.batch_stats
    }

    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        state = restore_gan_checkpoint(args.checkpoint, state)

    frontalize = jax.jit(make_frontalize_fn(
        cfg, detector, gen, detector_size=args.detector_size,
        tta=getattr(args, "detector_tta", False),
        allow_upscale=not getattr(args, "no_detector_upscale", False),
        refine=getattr(args, "detector_refine", False),
        nose_prior=_nose_prior_for(args),
    ))

    os.makedirs(args.output, exist_ok=True)
    z = jax.random.normal(jax.random.PRNGKey(args.seed), (1, cfg.G.zdim))
    part_names = ("left_eye", "right_eye", "nose", "mouth")
    for path in args.image:
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
        fake, lm5, scores = frontalize(
            eval_g_params(state, getattr(args, "g_weights", "auto")),
            det_vars, jnp.asarray(arr)[None], z,
        )
        scores = np.asarray(scores)[0]
        low = [f"{n}={s:.2f}" for n, s in zip(part_names, scores)
               if s < args.min_confidence]
        if low:
            print(f"warning: {path}: low-confidence landmark(s) "
                  f"[{', '.join(low)}] — no face, or a pose outside the "
                  f"detector's training distribution; output may be "
                  f"unreliable", file=sys.stderr)
        out = ((np.clip(np.asarray(fake)[0], -1, 1) + 1) * 127.5).astype(
            np.uint8
        )
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output, f"{name}_frontal.png")
        Image.fromarray(out).save(out_path)
        pts = ", ".join(
            f"({x:.0f},{y:.0f})" for x, y in np.asarray(lm5)[0, :4]
        )
        print(f"{path}: landmarks [{pts}] "
              f"conf [{', '.join(f'{s:.2f}' for s in scores)}] -> {out_path}")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    _enable_compile_cache()
    parser = argparse.ArgumentParser(prog="tpgan_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p):
        p.add_argument("--set", action="append", default=[],
                       help="config override a.b=value (repeatable)")
        p.add_argument("--checkpoint", default=None)

    p = sub.add_parser("pretrain", help="landmark-detector pretraining")
    common(p)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint and continue the "
                        "epoch schedule")
    p.add_argument("--device-data", action="store_true",
                   help="load the whole dataset into device memory "
                        "(per-bucket uint8 stacks) and gather batches on "
                        "device — ~zero steady-state H2D traffic")

    p = sub.add_parser("train", help="TP-GAN WGAN-GP training")
    common(p)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--identity-checkpoint", default=None)
    p.add_argument("--identity-embed-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype of the frozen identity embedder "
                        "inside the G loss (bfloat16 halves its MXU cost)")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--packed", default=None,
                   help="read training data from a packed-shard directory "
                        "(data/packing.py) instead of cfg.train.img_list")
    p.add_argument("--device-data", action="store_true",
                   help="load the packed dataset fully into device memory "
                        "and gather batches on device (~zero H2D per "
                        "step; dataset must fit HBM)")
    p.add_argument("--sample-dir", default=None,
                   help="write periodic [profile/fake/frontal] sample "
                        "grids here")
    p.add_argument("--sample-every", type=int, default=500)
    p.add_argument("--steps-per-dispatch", type=int, default=1)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (traps NaNs at the op that "
                        "produced them; slow, debugging only)")

    p = sub.add_parser("synth-data",
                       help="generate the procedural synthetic-face corpora")
    common(p)
    p.add_argument("--out", required=True)
    p.add_argument("--protocol", choices=["gan", "pretrain", "both"],
                   default="both")
    p.add_argument("--subjects", type=int, default=347)
    p.add_argument("--render-size", type=int, default=144)
    p.add_argument("--pretrain-images", type=int, default=4000)
    p.add_argument("--pack", action="store_true",
                   help="also pack the GAN protocol into memmap shards")

    p = sub.add_parser("train-embedder",
                       help="train the identity embedder (FeatureExtract)")
    common(p)
    p.add_argument("--img-list", required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--val-subjects", type=int, default=20,
                   help="hold out this many whole subjects for "
                        "Rank-1/identity-sim validation (0 disables)")
    p.add_argument("--val-every", type=int, default=500)
    p.add_argument("--no-augment", action="store_true",
                   help="disable flip/shift/jitter augmentation "
                        "(round-2 behaviour)")

    p = sub.add_parser("eval", help="PSNR/SSIM/Rank-1 evaluation")
    common(p)
    p.add_argument("--img-list", default=None)
    p.add_argument("--identity-checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--z-samples", type=int, default=1,
                   help="independent noise draws per probe; >1 adds "
                        "mean/spread-over-z to the JSON")
    p.add_argument("--detector-checkpoint", default=None,
                   help="score the FULL-STACK path (landmarks from this "
                        "trained detector instead of the ground-truth "
                        "annotations)")
    p.add_argument("--detector-size", type=int, default=256)
    p.add_argument("--detector-tta", action="store_true",
                   help="horizontal-mirror detector TTA (one doubled "
                        "batch; suppresses rare far-off part decodes)")
    p.add_argument("--detector-refine", action="store_true",
                   help="second-stage zoom-crop re-detection "
                        "(frontalize.refine_lm5; targets the nose "
                        ">45 px letterbox tail)")
    p.add_argument("--no-nose-gate", action="store_true",
                   help="disable the shape-prior nose plausibility gate "
                        "(the ungated control arm; the gate is on "
                        "whenever the detector checkpoint ships a "
                        "nose_prior in detector_meta.json)")
    p.add_argument("--no-detector-upscale", action="store_true",
                   help="letterbox small probes at native scale instead "
                        "of upscaling to the detector frame (the pre-r4 "
                        "behavior; costs ~2x detector error on 128 px "
                        "probes — artifacts/serving_scale_probe_r4.json)")
    p.add_argument("--g-weights", choices=("auto", "ema", "live"),
                   default="auto",
                   help="generator weights to score: auto = EMA when the "
                        "checkpoint tracks one, else live; ema/live force "
                        "one side (EMA-vs-live A/Bs)")

    p = sub.add_parser("prepare-data",
                       help="build the Multi-PIE training layout")
    common(p)
    p.add_argument("--images", required=True,
                   help="file listing raw image paths (one per line)")
    p.add_argument("--landmarks", required=True,
                   help="file with one 68-pt landmark line per image")
    p.add_argument("--out", required=True, help="output root directory")

    p = sub.add_parser(
        "frontalize",
        help="full-stack: detect landmarks, crop patches, synthesize",
    )
    common(p)
    p.add_argument("--image", action="append", required=True,
                   help="input image (repeatable)")
    p.add_argument("--detector-checkpoint", required=True,
                   help="pretrained landmark-detector checkpoint "
                        "(cli pretrain output)")
    p.add_argument("--detector-size", type=int, default=256)
    p.add_argument("--output", default="./frontalized")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min-confidence", type=float, default=0.5,
                   help="warn when any part's detection confidence is "
                        "below this (detection still commits to argmax)")
    p.add_argument("--detector-tta", action="store_true",
                   help="horizontal-mirror detector TTA")
    p.add_argument("--detector-refine", action="store_true",
                   help="second-stage zoom-crop re-detection")
    p.add_argument("--no-nose-gate", action="store_true",
                   help="disable the shape-prior nose plausibility gate")
    p.add_argument("--no-detector-upscale", action="store_true",
                   help="letterbox small inputs at native scale instead "
                        "of upscaling to the detector frame")
    p.add_argument("--g-weights", choices=("auto", "ema", "live"),
                   default="auto")

    p = sub.add_parser("synthesize", help="profile -> frontal synthesis")
    common(p)
    p.add_argument("--image", required=True)
    p.add_argument("--landmarks", required=True,
                   help="file with 68 space-separated landmark coords")
    p.add_argument("--output", default="frontal.png")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--g-weights", choices=("auto", "ema", "live"),
                   default="auto")

    p = sub.add_parser(
        "export", help="serialise synthesis to a StableHLO serving artifact"
    )
    common(p)
    p.add_argument("--output", required=True,
                   help="output path for the serialized artifact")
    p.add_argument("--batch", type=int, default=8,
                   help="static batch size baked into the artifact")
    p.add_argument("--int8", action="store_true",
                   help="export the int8 PTQ graph (per-channel weights + "
                        "calibrated activations; +35%% on the v5e MXU)")
    p.add_argument("--calib-packed", default=None,
                   help="packed dataset dir for int8 activation "
                        "calibration (default: synthetic protocol)")
    p.add_argument("--calib-items", type=int, default=64)
    p.add_argument("--g-weights", choices=("auto", "ema", "live"),
                   default="auto")
    p.add_argument("--weights-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="dtype of the baked float weight constants; "
                        "bfloat16 halves the artifact and is "
                        "bit-identical on bf16-compute models (only BN "
                        "scale/bias round)")
    p.add_argument("--int8-rescale-dtype",
                   choices=("float32", "bfloat16"), default="float32",
                   help="int8 dequantize-epilogue dtype (bfloat16 "
                        "measured fastest: artifacts/"
                        "int8_variants_probe_r4.json)")
    p.add_argument("--int8-min-channels", type=int, default=None,
                   help="skip quantizing convs narrower than this "
                        "(measured slower at every tried threshold)")
    p.add_argument("--detector-checkpoint", default=None,
                   help="ALSO bake the landmark detector in: export the "
                        "full-stack raw-image -> frontal-face program "
                        "(serving needs no landmark annotations)")
    p.add_argument("--input-size", default="128",
                   help="static input HxW for the full-stack artifact "
                        "(e.g. 128 or 480x640); one artifact per "
                        "supported camera resolution")
    p.add_argument("--detector-size", type=int, default=256)
    p.add_argument("--detector-tta", action="store_true")
    p.add_argument("--detector-refine", action="store_true")
    p.add_argument("--no-nose-gate", action="store_true")
    p.add_argument("--no-detector-upscale", action="store_true")
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering targets to bake into the "
                        "artifact (e.g. cpu,tpu); default: the current "
                        "backend only")
    p.add_argument("--seed", type=int, default=0)

    args = parser.parse_args(argv)

    # Chip-bound commands probe the accelerator with a bounded subprocess
    # first: a dead device tunnel otherwise blocks the first backend init
    # forever inside the PJRT C client (utils/device_check.py). Pure
    # host-side commands (prepare-data, synth-data) skip the probe.
    if args.command not in ("prepare-data", "synth-data"):
        from tpgan_tpu.utils.device_check import (
            DeviceUnavailableError,
            ensure_device_available,
        )

        try:
            ensure_device_available()
        except DeviceUnavailableError as e:
            print(f"tpgan_tpu {args.command}: {e}", file=sys.stderr)
            return 3

    return {"pretrain": cmd_pretrain, "train": cmd_train,
            "eval": cmd_eval, "prepare-data": cmd_prepare_data,
            "synthesize": cmd_synthesize, "synth-data": cmd_synth_data,
            "train-embedder": cmd_train_embedder,
            "frontalize": cmd_frontalize,
            "export": cmd_export}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
