"""Data layer tests: crop geometry golden vs PIL, CelebA parsing,
Multi-PIE file protocol, pipeline batching/prefetch."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tpgan_tpu.data import (
    CelebALandmarkDataset,
    TestDataset,
    TrainDataset,
    batch_iterator,
    crop_patches,
    crop_patches_batch,
    frontal_twin_path,
    parse_celeba_landmarks,
    prefetch_to_device,
    synthetic_gan_batch,
)
from tpgan_tpu.data.patches import PATCH_SIZES
from tpgan_tpu.utils.misc import five_landmarks_from_68


def test_crop_patches_matches_pil_reference_geometry():
    """Golden: our numpy crop must equal PIL.Image.crop with the
    reference's box arithmetic (DataAndDataset.py:46-54)."""
    from PIL import Image
    from math import floor

    rng = np.random.RandomState(0)
    img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)
    pim = Image.fromarray(img)
    lm = np.asarray(
        [[39.5, 40.2], [86.0, 38.7], [63.6, 63.6], [45.7, 90.0], [83.9, 88.7]],
        np.float32,
    )

    got = crop_patches(img.astype(np.float32), lm)

    centers = lm.copy()
    centers[3, 0] = (lm[3, 0] + lm[4, 0]) / 2.0
    centers[3, 1] = (lm[3, 1] + lm[4, 1]) / 2.0
    for i, (name, (w, h)) in enumerate(PATCH_SIZES.items()):
        x, y = floor(centers[i, 0]), floor(centers[i, 1])
        want = np.asarray(
            pim.crop((x - w // 2 + 1, y - h // 2 + 1, x + w // 2 + 1, y + h // 2 + 1)),
            np.float32,
        )
        np.testing.assert_allclose(got[name], want, err_msg=name)


def test_crop_patches_out_of_bounds_zero_padded():
    img = np.ones((64, 64, 3), np.float32)
    lm = np.asarray([[2, 2], [62, 2], [32, 32], [30, 62], [34, 62]], np.float32)
    out = crop_patches(img, lm)
    assert out["left_eye"].shape == (40, 40, 3)
    # top-left eye crop extends past the border -> zero rows/cols
    assert float(out["left_eye"][0, 0].sum()) == 0.0
    assert float(out["left_eye"][-1, -1].sum()) == 3.0


def test_crop_patches_batch_matches_host():
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 128, 128, 3).astype(np.float32)
    lms = np.stack([
        np.asarray([[39, 40], [86, 39], [64, 64], [46, 90], [84, 89]], np.float32),
        np.asarray([[20, 30], [100, 30], [60, 70], [40, 100], [80, 100]], np.float32),
    ])
    got = crop_patches_batch(jnp.asarray(imgs), jnp.asarray(lms))
    for b in range(2):
        want = crop_patches(imgs[b], lms[b])
        for name in PATCH_SIZES:
            np.testing.assert_allclose(
                np.asarray(got[name][b]), want[name], rtol=1e-6, err_msg=name
            )


def test_parse_celeba_landmarks(tmp_path):
    txt = tmp_path / "list_landmarks_celeba.txt"
    txt.write_text(
        "2\n"
        "lefteye_x lefteye_y righteye_x righteye_y nose_x nose_y "
        "leftmouth_x leftmouth_y rightmouth_x rightmouth_y\n"
        "000001.jpg 165 184 244 176 196 249 194 271 266 260\n"
        "000002.jpg 140 204 220 204 168 254 146 289 226 289\n"
    )
    labels = parse_celeba_landmarks(str(txt))
    assert set(labels) == {"000001.jpg", "000002.jpg"}
    want_mouth = ((194 + 266) // 2, (271 + 260) // 2)
    np.testing.assert_allclose(labels["000001.jpg"][6:], want_mouth)


def test_celeba_dataset_end_to_end(tmp_path):
    from PIL import Image

    root = tmp_path / "celeba"
    root.mkdir()
    (root / "imgs").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = (rng.rand(218, 178, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i:06d}.jpg")
    lines = ["3", "header"]
    for i in range(3):
        lines.append(f"{i:06d}.jpg 60 100 120 100 90 140 70 170 110 170")
    (root / "list_landmarks_celeba.txt").write_text("\n".join(lines) + "\n")

    ds = CelebALandmarkDataset(
        "list_landmarks_celeba.txt", str(root), image_size=128
    )
    assert len(ds) == 3
    img, label = ds[0]
    assert img.shape == (128, 128, 3)
    assert label.shape == (8,)
    # landmarks scaled into the bucket: 218-high source -> scale 128/218
    scale = 128 / 218
    pad_left = (128 - int(round(178 * scale))) // 2
    np.testing.assert_allclose(label[0], 60 * scale + pad_left, atol=1.0)

    tr, va, te = ds.split(0.5, 0.25)
    assert len(tr) == 1 and len(va) == 0 and len(te) == 2


def test_frontal_twin_protocol():
    p = "data/session01/001_01_01_140_07.png"
    assert frontal_twin_path(p) == "data/session01/001_01_01_051_07.png"


def test_train_dataset_protocol(tmp_path):
    """Build the sibling-directory layout the reference expects
    (DataAndDataset.py:206-215) and check the 15-tensor contract."""
    from PIL import Image

    root = tmp_path / "mpie"
    split = root / "train"
    for sub in ["train", "32x32", "64x64"]:
        (root / sub).mkdir(parents=True)
    for part in PATCH_SIZES:
        (root / "patch" / part).mkdir(parents=True)

    rng = np.random.RandomState(0)

    def save(path, h, w):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)

    for cam in ["140", "051"]:
        name = f"007_01_01_{cam}_00.png"
        save(split / name, 128, 128)
        save(root / "32x32" / name, 32, 32)
        save(root / "64x64" / name, 64, 64)
        for part, (w, h) in PATCH_SIZES.items():
            save(root / "patch" / part / name, h, w)

    ds = TrainDataset([str(split / "007_01_01_140_00.png")])
    item = ds[0]
    assert item["img"].shape == (128, 128, 3)
    assert item["img32_frontal"].shape == (32, 32, 3)
    assert item["mouth_frontal"].shape == (32, 48, 3)
    assert int(item["label"]) == 7
    # [-1, 1] normalisation (DataAndDataset.py:218-220)
    assert item["img"].min() >= -1.0 and item["img"].max() <= 1.0


def test_test_dataset_preprocessing(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    p = tmp_path / "probe.png"
    Image.fromarray((rng.rand(200, 180, 3) * 255).astype(np.uint8)).save(p)
    lm68 = rng.rand(68, 2) * 150 + 10
    lm_str = " ".join(str(float(v)) for v in lm68.reshape(-1))
    ds = TestDataset([str(p)], [lm_str])
    item = ds[0]
    assert item["img"].shape == (128, 128, 3)
    assert item["img64"].shape == (64, 64, 3)
    assert item["img32"].shape == (32, 32, 3)
    assert item["mouth"].shape == (32, 48, 3)
    assert item["img"].min() >= -1.0


def test_batch_iterator_and_prefetch():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            if i == 3:
                return None  # dropped item (oversize filter semantics)
            return {"x": np.full((2, 2), i, np.float32)}

    batches = list(
        batch_iterator(Toy(), 4, shuffle=False, epochs=1, num_workers=2)
    )
    assert len(batches) == 2
    assert batches[0]["x"].shape[0] in (3, 4)

    staged = list(prefetch_to_device(iter(batches), size=2))
    assert len(staged) == 2
    assert np.asarray(staged[0]["x"]).shape == batches[0]["x"].shape


def test_synthetic_batch_contract():
    from tpgan_tpu.train.gan_trainer import example_batch

    syn = synthetic_gan_batch(2)
    ex = example_batch(2)
    assert set(syn) == set(ex)
    for k in ex:
        assert syn[k].shape == ex[k].shape, k


def test_packed_dataset_roundtrip(tmp_path):
    """pack -> memmap-read parity (within uint8 quantisation) and batch
    iteration over the packed reader."""
    from tpgan_tpu.data.packing import PackedDataset, pack_dataset
    from tpgan_tpu.data.synthetic import synthetic_gan_batch

    class Source:
        def __init__(self, n):
            self.items = [
                {k: v[0] for k, v in synthetic_gan_batch(1, seed=i).items()}
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    src = Source(5)
    out = str(tmp_path / "packed")
    pack_dataset(src, out, shard_size=2)

    ds = PackedDataset(out)
    assert len(ds) == 5
    for i in (0, 2, 4):  # spans shard boundaries
        got = ds[i]
        want = src[i]
        assert set(got) == set(want)
        assert int(got["label"]) == int(want["label"])
        for k in want:
            if k == "label":
                continue
            assert got[k].dtype == np.float32
            # uint8 quantisation error bound: 2/255 per value
            assert np.abs(got[k] - want[k]).max() <= (2.0 / 255.0) + 1e-6, k

    batches = list(batch_iterator(ds, 2, shuffle=False, epochs=1))
    assert len(batches) == 2
    assert batches[0]["img"].shape == (2, 128, 128, 3)


def test_prefetch_to_device_sharded():
    """prefetch_to_device with an explicit sharding lands batches
    pre-sharded across the mesh."""
    from tpgan_tpu.config import MeshConfig
    from tpgan_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharding = NamedSharding(mesh, P("data"))
    batches = [{"x": np.ones((16, 4), np.float32) * i} for i in range(3)]
    staged = list(prefetch_to_device(iter(batches), size=2, sharding=sharding))
    assert len(staged) == 3
    assert staged[0]["x"].sharding == sharding
    np.testing.assert_allclose(np.asarray(staged[2]["x"]), 2.0)


def test_prepare_dataset_roundtrip(tmp_path):
    """prepare_dataset builds the exact layout TrainDataset consumes."""
    from PIL import Image

    from tpgan_tpu.data.prepare import prepare_dataset

    rng = np.random.RandomState(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    paths, lms = [], []
    for subject, cam in [(1, "140"), (1, "051"), (2, "080"), (2, "051")]:
        p = raw / f"{subject:03d}_01_01_{cam}_00.png"
        Image.fromarray((rng.rand(200, 180, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
        lm = rng.rand(68, 2) * np.asarray([170, 190]) + 5
        lms.append(" ".join(str(float(v)) for v in lm.reshape(-1)))

    out = tmp_path / "prepared"
    train_list = prepare_dataset(paths, lms, str(out))
    # only the two non-frontal views are training entries
    assert len(train_list) == 2
    assert (out / "img.list").exists()

    # the produced layout feeds TrainDataset directly
    ds = TrainDataset(train_list)
    item = ds[0]
    assert item["img"].shape == (128, 128, 3)
    assert item["img_frontal"].shape == (128, 128, 3)
    assert item["mouth"].shape == (32, 48, 3)
    assert int(item["label"]) in (1, 2)


def test_device_resident_dataset(tmp_path):
    """load_packed_to_device + device_batch_iterator: whole-dataset HBM
    residency with on-device index gathers (~zero H2D per step)."""
    import jax

    from tpgan_tpu.data.packing import (
        PackedDataset,
        device_batch_iterator,
        load_packed_to_device,
        pack_dataset,
    )
    from tpgan_tpu.data.synthetic import synthetic_gan_batch

    class Source:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {k: v[0] for k, v in synthetic_gan_batch(1, seed=i).items()}

    out = str(tmp_path / "packed")
    pack_dataset(Source(), out, shard_size=2)

    data = load_packed_to_device(out)
    ds = PackedDataset(out, to_float=False)
    assert set(data) == set(ds.meta["keys"])
    assert int(data["img"].shape[0]) == 5
    assert str(data["img"].dtype) == "uint8"
    # device copy matches the memmap reader item-for-item
    for i in (0, 2, 4):
        host = ds[i]
        for k in host:
            np.testing.assert_array_equal(np.asarray(data[k][i]), host[k])

    it = device_batch_iterator(data, batch_size=3, seed=0)
    batch = next(it)
    assert batch["img"].shape == (3, 128, 128, 3)
    assert isinstance(batch["img"], jax.Array)
    # every gathered row is one of the source rows
    rows = np.asarray(data["img"])
    got = np.asarray(batch["img"])
    for r in got:
        assert any(np.array_equal(r, s) for s in rows)


def test_weighted_device_batch_iterator(tmp_path):
    """yaw-weighted sampling (train.yaw_weight_gamma): weights bias the
    host-side index distribution; invalid weights are rejected."""
    import pytest

    from tpgan_tpu.data.packing import (
        device_batch_iterator,
        load_packed_to_device,
        pack_dataset,
    )
    from tpgan_tpu.data.synthetic import synthetic_gan_batch

    class Source:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {k: v[0] for k, v in synthetic_gan_batch(1, seed=i).items()}

    out = str(tmp_path / "packed")
    pack_dataset(Source(), out, shard_size=2)
    data = load_packed_to_device(out)

    # all mass on item 3 -> every sampled row equals row 3
    w = np.zeros(5)
    w[3] = 1.0
    it = device_batch_iterator(data, batch_size=4, seed=0, weights=w)
    batch = next(it)
    want = np.asarray(data["img"][3])
    for r in np.asarray(batch["img"]):
        np.testing.assert_array_equal(r, want)

    # a 10:1 skew shows up in the empirical frequencies
    w = np.ones(5)
    w[0] = 10.0
    it = device_batch_iterator(data, batch_size=64, seed=1, weights=w)
    imgs = np.asarray(data["img"])
    hits = 0
    for _ in range(4):
        for r in np.asarray(next(it)["img"]):
            if np.array_equal(r, imgs[0]):
                hits += 1
    assert hits > 256 * 10 / 14 * 0.6  # expected ~183, allow slack

    with pytest.raises(ValueError):
        next(device_batch_iterator(data, 2, weights=np.ones(3)))
    with pytest.raises(ValueError):
        next(device_batch_iterator(data, 2, weights=np.zeros(5)))


def test_packed_names_roundtrip(tmp_path):
    """pack_dataset records source basenames when the dataset exposes
    img_list; PackedDataset.names returns them (and falls back to the
    sibling img.list for pre-round-5 packs)."""
    from tpgan_tpu.data.packing import PackedDataset, pack_dataset
    from tpgan_tpu.data.synthetic import synthetic_gan_batch

    names = [f"{i:03d}_01_{cam}_00.png"
             for i, cam in enumerate(["051", "240", "020", "110", "200"])]

    class Source:
        img_list = [f"/data/train/{n}" for n in names]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {k: v[0] for k, v in synthetic_gan_batch(1, seed=i).items()}

    out = str(tmp_path / "root" / "packed")
    pack_dataset(Source(), out, shard_size=2)
    assert PackedDataset(out).names == names

    # fallback: strip the names key, provide a sibling img.list
    import json
    idx_path = os.path.join(out, "index.json")
    with open(idx_path) as f:
        meta = json.load(f)
    del meta["names"]
    with open(idx_path, "w") as f:
        json.dump(meta, f)
    with open(str(tmp_path / "root" / "img.list"), "w") as f:
        f.write("\n".join(Source.img_list) + "\n")
    assert PackedDataset(out).names == names


def test_celeba_multi_bucket_1024_routing(tmp_path):
    """The reference's collate filter implies images up to
    general.image_max_size=1024 (config.py:40, Pretrain.py:66-74); the
    bucket router must handle the full span: native-scale letterbox into
    the smallest fitting bucket, downscale only above the top bucket,
    label geometry exact in every bucket."""
    from PIL import Image

    from tpgan_tpu.data.pipeline import bucketed_batch_iterator

    root = tmp_path / "celeba"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    # spans all three buckets + one oversize (downscales into the top)
    sizes = [(200, 150), (256, 256), (400, 380), (900, 700), (1300, 1000)]
    lines = ["5", "header"]
    for i, (h, w) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i:06d}.jpg")
        lines.append(f"{i:06d}.jpg 60 100 120 100 90 140 70 170 110 170")
    (root / "list_landmarks_celeba.txt").write_text("\n".join(lines) + "\n")

    buckets = (256, 512, 1024)
    ds = CelebALandmarkDataset(
        "list_landmarks_celeba.txt", str(root), buckets=buckets
    )
    assert [ds.bucket_for(h, w) for h, w in sizes] == [
        256, 256, 512, 1024, 1024
    ]
    for i, (h, w) in enumerate(sizes):
        img, label = ds[i]
        b = ds.bucket_for(h, w)
        assert img.shape == (b, b, 3)
        # sub-bucket images letterbox at NATIVE scale (no upscaling):
        # the label transform is xy * scale + pad with scale <= 1
        scale = min(b / max(h, w), 1.0)
        pad_left = (b - int(round(w * scale))) // 2
        np.testing.assert_allclose(label[0], 60 * scale + pad_left, atol=1.0)
        if max(h, w) <= b:
            assert scale == 1.0  # accuracy keeps source-pixel semantics

    # bucketed iterator: every batch shape-homogeneous, all items seen
    got = {256: 0, 512: 0, 1024: 0}
    for batch in bucketed_batch_iterator(
        ds, 2, shuffle=False, drop_last=False, epochs=1
    ):
        imgs, labels = batch
        assert imgs.shape[1] == imgs.shape[2] and imgs.shape[1] in got
        got[imgs.shape[1]] += imgs.shape[0]
    assert got == {256: 2, 512: 1, 1024: 2}


def test_device_resident_pretrain_buckets():
    """load_pretrain_to_device + device iterators: per-bucket uint8 HBM
    residency for the landmark-pretrain protocol (the pretrain twin of
    the GAN path's device-resident mode — the per-step H2D feed leaks
    the full buffer per put on remoted PJRT clients)."""
    import jax

    from tpgan_tpu.data.packing import (
        device_bucketed_batch_iterator,
        device_bucketed_eval_batches,
        load_pretrain_to_device,
    )

    rng = np.random.RandomState(0)

    class Source:
        sizes = [32, 32, 32, 64, 64, 32, None]

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            s = self.sizes[i]
            if s is None:  # oversize collate drop
                return None
            img = rng.rand(s, s, 3).astype(np.float32)
            return img, np.full((8,), float(i), np.float32)

    groups = load_pretrain_to_device(Source(), range(7))
    assert set(groups) == {(32, 32, 3), (64, 64, 3)}
    assert int(groups[(32, 32, 3)]["img"].shape[0]) == 4
    assert int(groups[(64, 64, 3)]["img"].shape[0]) == 2
    for g in groups.values():
        assert str(g["img"].dtype) == "uint8"
        assert str(g["label"].dtype) == "float32"

    it = device_bucketed_batch_iterator(groups, batch_size=3, seed=0)
    seen_shapes = set()
    for _ in range(8):
        img, lbl = next(it)
        assert isinstance(img, jax.Array) and img.shape[0] == 3
        assert lbl.shape == (3, 8)
        seen_shapes.add(tuple(img.shape[1:]))
        # every gathered label indexes a real source item of that bucket
        want = {32: (0, 1, 2, 5), 64: (3, 4)}[img.shape[1]]
        assert all(int(v) in want for v in np.asarray(lbl)[:, 0])
    # both buckets get sampled (probability ~1 - (2/3)^8 per bucket)
    assert seen_shapes == {(32, 32, 3), (64, 64, 3)}

    # eval pass: every item exactly once, partial final batches kept
    counts = {}
    ids = []
    for img, lbl in device_bucketed_eval_batches(groups, batch_size=3):
        counts[img.shape[1]] = counts.get(img.shape[1], 0) + img.shape[0]
        ids.extend(int(v) for v in np.asarray(lbl)[:, 0])
    assert counts == {32: 4, 64: 2}
    assert sorted(ids) == [0, 1, 2, 3, 4, 5]


def test_pretrain_step_uint8_decode_parity():
    """The jitted pretrain step decodes uint8 device-resident batches to
    the identical program the float path runs: same loss/accuracy when
    float == uint8 / 255 exactly."""
    import jax

    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.pretrain import create_pretrain_state, make_eval_step

    cfg = make_config({"pretrain": {"image_size": 64, "batch_size": 2}})
    state, model, _tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    eval_step = jax.jit(make_eval_step(cfg, model))

    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, size=(2, 64, 64, 3)).astype(np.uint8)
    labels = (rng.rand(2, 8) * 64).astype(np.float32)
    k = jax.random.PRNGKey(2)
    m_u8 = eval_step(state, jnp.asarray(u8), jnp.asarray(labels), k)
    m_f = eval_step(
        state, jnp.asarray(u8.astype(np.float32) / 255.0),
        jnp.asarray(labels), k,
    )
    for key in m_u8:
        np.testing.assert_allclose(
            float(m_u8[key]), float(m_f[key]), rtol=1e-6
        )


def test_pixel_budget_batches_and_weighted_sampling():
    """pixel_budget_batches holds pixels/step constant across buckets;
    the train iterator weights bucket picks by steps-per-epoch so the
    per-image visit rate stays uniform; eval batches respect the
    per-bucket sizes."""
    import jax

    from tpgan_tpu.data.packing import (
        device_bucketed_batch_iterator,
        device_bucketed_eval_batches,
        load_pretrain_to_device,
        pixel_budget_batches,
    )

    rng = np.random.RandomState(0)

    class Source:
        sizes = [16] * 8 + [32] * 4 + [64] * 2

        def __len__(self):
            return len(self.sizes)

        def __getitem__(self, i):
            s = self.sizes[i]
            return (rng.rand(s, s, 3).astype(np.float32),
                    np.full((8,), float(i), np.float32))

    groups = load_pretrain_to_device(Source(), range(14))
    bf = pixel_budget_batches(groups, 8)
    # area ratios 1:4:16 -> batches 8:2:1 (floor, min 1)
    assert bf == {(16, 16, 3): 8, (32, 32, 3): 2, (64, 64, 3): 1}

    it = device_bucketed_batch_iterator(groups, 8, seed=0, batch_for=bf)
    sizes_seen = {16: 0, 32: 0, 64: 0}
    for _ in range(30):
        img, lbl = next(it)
        assert img.shape[0] == bf[tuple(img.shape[1:])]
        assert lbl.shape[0] == img.shape[0]
        sizes_seen[img.shape[1]] += 1
    # steps/epoch are 1 : 2 : 2 — every bucket must appear
    assert all(v > 0 for v in sizes_seen.values())

    ids = []
    for img, lbl in device_bucketed_eval_batches(groups, 8, batch_for=bf):
        assert img.shape[0] <= bf[tuple(img.shape[1:])]
        ids.extend(int(v) for v in np.asarray(lbl)[:, 0])
    assert sorted(ids) == list(range(14))
