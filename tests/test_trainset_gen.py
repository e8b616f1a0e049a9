"""Painted training-set generation drivers: synthetic-COCO roundtrips.

Covers the reference's fake-mm*-training data generation (DATA.md:174-187
instance 30-copy, :210-222 pose 20-copy) reimplemented as plain drivers,
plus the NYU .mat extractor and SIDD patch generator."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from painter_tpu.data import trainset_gen as tg
from painter_tpu.ops.palette import coco_instance_palette, pose_gb_palette


@pytest.fixture(scope="module")
def synth_panoptic(tmp_path_factory):
    """2 images: one with 2 things + 1 stuff, one with stuff only."""
    root = tmp_path_factory.mktemp("pan")
    (root / "images").mkdir()
    (root / "panoptic").mkdir()
    rng = np.random.RandomState(0)
    h, w = 48, 64
    annotations, images = [], []
    for i, n_things in enumerate((2, 0)):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"im{i}.jpg")
        ids = np.zeros((h, w), np.uint32)
        segs = []
        seg_id = 7
        for t in range(n_things):
            # big rects: the training-time valid-map rule zeroes inst
            # samples whose painted fg is under 300 px (pairdataset)
            y0, x0 = 6 + 16 * t, 4 + 28 * t
            ids[y0:y0 + 18, x0:x0 + 26] = seg_id
            segs.append({"id": seg_id, "category_id": 1, "iscrowd": 0})
            seg_id += 1
        ids[:4, :] = seg_id  # stuff band
        segs.append({"id": seg_id, "category_id": 200, "iscrowd": 0})
        png = np.stack([ids % 256, (ids // 256) % 256, ids // 256 ** 2],
                       -1).astype(np.uint8)
        Image.fromarray(png).save(root / "panoptic" / f"im{i}.png")
        annotations.append({"image_id": i, "file_name": f"im{i}.png",
                            "segments_info": segs})
        images.append({"id": i, "file_name": f"im{i}.jpg"})
    pan_json = {"annotations": annotations, "images": images,
                "categories": [{"id": 1, "isthing": 1},
                               {"id": 200, "isthing": 0}]}
    (root / "panoptic.json").write_text(json.dumps(pan_json))
    return root


def test_gen_instance_trainset(synth_panoptic, tmp_path):
    root = synth_panoptic
    jp = tg.gen_instance_trainset(
        str(root / "panoptic.json"), str(root / "panoptic"),
        str(root / "images"), str(tmp_path / "inst"), num_aug=3,
        out_size=64, seed=0)
    pairs = json.load(open(jp))
    # image 1 has no things -> all its copies skipped (all-black rule);
    # image 0 yields org + orgflip + up to 3 aug copies (crops may kill
    # all instances in some aug draws)
    assert 2 <= len(pairs) <= 5
    names = {p["image_path"].split(os.sep)[0] for p in pairs}
    assert "train_org" in names and "train_orgflip" in names
    palette = {tuple(c) for c in coco_instance_palette()}
    for pair in pairs:
        assert pair["type"] == "coco_image2panoptic_inst"
        img = np.asarray(Image.open(
            os.path.join(tmp_path / "inst", pair["image_path"])))
        lab = np.asarray(Image.open(
            os.path.join(tmp_path / "inst", pair["target_path"])))
        assert img.shape == (64, 64, 3) and lab.shape == (64, 64, 3)
        colors = {tuple(c) for c in
                  np.unique(lab.reshape(-1, 3), axis=0)} - {(0, 0, 0)}
        assert colors and colors <= palette
    # org vs orgflip: the image is mirrored
    by_dir = {p["image_path"].split(os.sep)[0]: p for p in pairs}
    org = np.asarray(Image.open(os.path.join(
        tmp_path / "inst", by_dir["train_org"]["image_path"])))
    flip = np.asarray(Image.open(os.path.join(
        tmp_path / "inst", by_dir["train_orgflip"]["image_path"])))
    np.testing.assert_array_equal(org[:, ::-1], flip)
    # deterministic regeneration
    jp2 = tg.gen_instance_trainset(
        str(root / "panoptic.json"), str(root / "panoptic"),
        str(root / "images"), str(tmp_path / "inst2"), num_aug=3,
        out_size=64, seed=0)
    assert [p["image_path"] for p in json.load(open(jp2))] == \
        [p["image_path"] for p in pairs]


def test_gen_instance_valset(synth_panoptic, tmp_path):
    jp = tg.gen_instance_trainset(
        str(synth_panoptic / "panoptic.json"),
        str(synth_panoptic / "panoptic"), str(synth_panoptic / "images"),
        str(tmp_path / "v"), out_size=64, val=True)
    pairs = json.load(open(jp))
    assert len(pairs) == 1  # only the image with things; no aug copies
    assert pairs[0]["image_path"].startswith("val_org")


@pytest.fixture(scope="module")
def synth_keypoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("kpts")
    (root / "images").mkdir()
    rng = np.random.RandomState(1)
    h, w = 96, 128
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "images" / "p0.jpg")
    kpts = np.zeros((17, 3), np.float32)
    kpts[:, 0] = rng.uniform(30, 90, 17)
    kpts[:, 1] = rng.uniform(20, 70, 17)
    kpts[:, 2] = 2
    kpts[3, 2] = 0  # one unlabeled joint
    coco = {"images": [{"id": 5, "file_name": "p0.jpg"}],
            "annotations": [
                {"id": 11, "image_id": 5, "iscrowd": 0, "area": 2000,
                 "num_keypoints": 16, "bbox": [25, 15, 70, 60],
                 "keypoints": kpts.ravel().tolist()},
                {"id": 12, "image_id": 5, "iscrowd": 1, "area": 99,
                 "num_keypoints": 0, "bbox": [0, 0, 10, 10],
                 "keypoints": [0] * 51}]}
    (root / "kp.json").write_text(json.dumps(coco))
    return root


def test_gen_pose_trainset(synth_keypoints, tmp_path):
    jp = tg.gen_pose_trainset(
        str(synth_keypoints / "kp.json"),
        str(synth_keypoints / "images"), str(tmp_path / "pose"),
        num_aug=2, seed=0)
    pairs = json.load(open(jp))
    assert len(pairs) == 2  # crowd/no-keypoint ann filtered; 2 aug copies
    for pair in pairs:
        assert pair["type"] == "coco_image2pose"
        img = np.asarray(Image.open(
            os.path.join(tmp_path / "pose", pair["image_path"])))
        lab = np.asarray(Image.open(
            os.path.join(tmp_path / "pose", pair["target_path"])))
        assert img.shape == (256, 192, 3) and lab.shape == (256, 192, 3)
        # GB colors restricted to the keypoint palette (+ black bg)
        gb = {tuple(c) for c in
              np.unique(lab[..., 1:].reshape(-1, 2), axis=0)}
        assert gb - {(0, 0)} <= {tuple(c) for c in pose_gb_palette()}
        assert lab[..., 0].max() == 255  # a peak at some joint


def test_pose_valset_roundtrip_decodes(synth_keypoints, tmp_path):
    """Unaugmented painted crop decodes back to the GT joints."""
    from painter_tpu.evals.pose import (decode_painted_heatmaps,
                                        keypoints_from_heatmaps)
    jp = tg.gen_pose_trainset(
        str(synth_keypoints / "kp.json"),
        str(synth_keypoints / "images"), str(tmp_path / "pv"), val=True)
    pairs = json.load(open(jp))
    assert len(pairs) == 1
    lab = np.asarray(Image.open(
        os.path.join(tmp_path / "pv", pairs[0]["target_path"])),
        np.float32)
    hm = decode_painted_heatmaps(lab[None])
    coco = json.load(open(synth_keypoints / "kp.json"))
    ann = coco["annotations"][0]
    kpts = np.asarray(ann["keypoints"], np.float32).reshape(17, 3)
    center, scale = tg.bbox_to_center_scale(ann["bbox"])
    dec, maxvals = keypoints_from_heatmaps(hm, center[None], scale[None])
    vis = kpts[:, 2] > 0
    err = np.abs(dec[0][vis] - kpts[vis, :2])
    # crop stride is scale*200/192 ~ 0.46 px; decode within ~1.5 px
    assert err.max() < 1.5, err.max()
    assert (maxvals[0, vis, 0] > 0.9).all()
    assert maxvals[0, 3, 0] < 0.1  # unlabeled joint stays silent


def test_generated_trainsets_train(synth_panoptic, synth_keypoints,
                                   tmp_path):
    """Generate -> PairDataset -> short training run -> loss drops
    (the VERDICT roundtrip criterion for the data-gen drivers)."""
    import jax
    from painter_tpu import configs
    from painter_tpu.data import pairdataset as pd
    from painter_tpu.models import incontext_vit as m
    from painter_tpu.train import optim, step as step_lib

    del synth_keypoints  # pose valid maps zero out below 300 fg px at
    # tiny resolutions (pairdataset rule); pose painting is covered by
    # the decode-roundtrip test above
    root = tmp_path / "gen"
    inst_json = tg.gen_instance_trainset(
        str(synth_panoptic / "panoptic.json"),
        str(synth_panoptic / "panoptic"), str(synth_panoptic / "images"),
        str(root), num_aug=6, out_size=64, seed=0)

    cfg = configs.tiny_test_config(img_size=(64, 32), patch_size=4,
                                   embed_dim=32, num_heads=2,
                                   pretrain_img_size=16, drop_path_rate=0.0)
    dataset = pd.make_train_dataset(
        str(root), [inst_json], img_size=cfg.img_size,
        num_mask_patches=64, max_mask_patches_per_block=32,
        min_mask_patches_per_block=1, half_mask_ratio=0.3,
        patch_size=cfg.patch_size)
    sampler = pd.WeightedMixtureSampler(dataset.weights, seed=0)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    oc = optim.OptimConfig(lr=4e-3, warmup_epochs=1, epochs=20,
                           steps_per_epoch=4)
    optimizer = optim.make_optimizer(params, cfg, oc)
    state = step_lib.init_train_state(params, optimizer)
    train_step = jax.jit(step_lib.make_train_step(cfg, optimizer,
                                                  remat=False))
    losses = []
    for epoch in range(20):
        for i, batch in enumerate(pd.data_iterator(
                dataset, sampler, batch_size=3, epoch=epoch,
                num_workers=1)):
            if i >= 4:
                break
            state, metrics = train_step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1),
                                                 int(state["step"])))
            losses.append(float(metrics["loss"]))
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.7, (
        np.mean(losses[:8]), np.mean(losses[-8:]))


def test_msra_heatmaps_window_semantics():
    joints = np.array([[10.2, 6.7], [100.0, 5.0]], np.float32)
    vis = np.array([2.0, 2.0])
    maps, w = tg.msra_heatmaps(joints, vis, (16, 24), sigma=1.5)
    assert w.tolist() == [1.0, 0.0]  # second joint's window off-crop
    assert maps[1].sum() == 0
    py, px = np.unravel_index(maps[0].argmax(), maps[0].shape)
    assert (px, py) == (10, 7)  # peak at int(mu + 0.5)
    # truncated support: zero outside the window [int(mu-3s), ...) = col 5
    assert maps[0][:, :5].sum() == 0
    assert maps[0][:, 5:7].sum() > 0


def test_affine_transform_geometry():
    center = np.array([50.0, 40.0], np.float32)
    scale = np.array([0.6, 0.8], np.float32)  # 120x160 px source box
    mat = tg.get_affine_transform(center, scale, 0.0, (192, 256))
    # center maps to crop center; box corners map to crop corners
    np.testing.assert_allclose(
        tg.transform_points(center[None], mat)[0], [96, 128], atol=1e-4)
    tl = center - np.array([60.0, 80.0])
    np.testing.assert_allclose(
        tg.transform_points(tl[None], mat)[0], [0, 0], atol=1e-3)
    # 90-degree rotation: the point 60px right of center (the rotated
    # src_dir) lands where the up-direction landed (96, 128-96)
    mat90 = tg.get_affine_transform(center, scale, 90.0, (192, 256))
    right = center + np.array([60.0, 0.0])
    np.testing.assert_allclose(
        tg.transform_points(right[None], mat90)[0], [96, 32], atol=1e-3)
    # and a point 80px up maps 80*(96/60) px left (x-stretch 1.6)
    up = center + np.array([0.0, -80.0])
    np.testing.assert_allclose(
        tg.transform_points(up[None], mat90)[0], [96 - 128, 128],
        atol=1e-3)


def test_extract_nyu_mat(tmp_path):
    import h5py
    from scipy.io import savemat
    n = 3
    rng = np.random.RandomState(0)
    h5p = tmp_path / "nyu.mat"
    with h5py.File(h5p, "w") as f:
        # stored transposed, as in the official file (we read .T)
        f["rawDepths"] = rng.rand(n, 640, 480).astype(np.float32) * 8
        f["images"] = (rng.rand(n, 3, 640, 480) * 255).astype(np.uint8)
        scene_names = [f"scene_{i}" for i in range(n)]
        refs = []
        for s in scene_names:
            d = f.create_dataset(
                f"#refs#/{s}", data=np.array([[ord(c)] for c in s],
                                             np.uint16))
            refs.append(d.ref)
        f["sceneTypes"] = np.array([refs], dtype=h5py.ref_dtype)
    savemat(tmp_path / "split.mat",
            {"trainNdxs": np.array([[1], [3]]), "testNdxs": np.array([[2]])})
    from painter_tpu.data.prep import extract_nyu_depth_mat
    count = extract_nyu_depth_mat(
        str(h5p), str(tmp_path / "split.mat"), str(tmp_path / "out"))
    assert count == 3
    train = sorted(os.listdir(tmp_path / "out" / "train"))
    assert train == ["scene_0", "scene_2"]
    d = np.asarray(Image.open(
        tmp_path / "out" / "train" / "scene_0" / "sync_depth_00000.png"))
    assert d.dtype == np.uint16 and d.shape == (480, 640)
    rgb = np.asarray(Image.open(
        tmp_path / "out" / "train" / "scene_0" / "rgb_00000.jpg"))
    # zeroed boundary (JPEG block bleed leaves noise; must be far darker
    # than the random-noise interior)
    assert rgb[:7].mean() < rgb[7:474].mean() / 3
    assert rgb[:, :7].mean() < rgb[:, 7:632].mean() / 3


def test_gen_sidd_patches(tmp_path):
    from painter_tpu.data.prep import gen_sidd_patches
    rng = np.random.RandomState(0)
    scene = tmp_path / "Data" / "0001_scene"
    scene.mkdir(parents=True)
    clean = (rng.rand(40, 52, 3) * 255).astype(np.uint8)
    noisy = np.clip(clean + rng.randn(40, 52, 3) * 10, 0, 255).astype(
        np.uint8)
    Image.fromarray(clean).save(scene / "GT_SRGB_010.PNG")
    Image.fromarray(noisy).save(scene / "NOISY_SRGB_010.PNG")
    n = gen_sidd_patches(str(tmp_path / "Data"), str(tmp_path / "patches"),
                         patch_size=16, num_patches=4)
    assert n == 4
    ins = sorted(os.listdir(tmp_path / "patches" / "input"))
    gts = sorted(os.listdir(tmp_path / "patches" / "groundtruth"))
    assert ins == gts == ["1_1.png", "1_2.png", "1_3.png", "1_4.png"]
    p = np.asarray(Image.open(tmp_path / "patches" / "input" / "1_1.png"))
    assert p.shape == (16, 16, 3)
