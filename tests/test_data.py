"""Data pipeline tests on a synthetic VIPSeg-format dataset."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from axial_vs_tpu.data.panoptic_utils import rgb2id, id2rgb
from axial_vs_tpu.data.vipseg import (
    load_vipseg_video_json, register_vipseg_video, VIPSegClipMapper,
)
from axial_vs_tpu.data.catalog import DatasetCatalog
from axial_vs_tpu.data.loader import ClipDataLoader
from axial_vs_tpu.data.transforms import build_train_transforms


def test_rgb_id_roundtrip(rng):
    ids = rng.randint(0, 2 ** 24, (13, 17)).astype(np.int32)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


@pytest.fixture
def synthetic_vipseg(tmp_path):
    img_root = tmp_path / "imgs"
    pan_root = tmp_path / "pans"
    videos = []
    rng = np.random.RandomState(0)
    for vid in range(2):
        video_id = f"video{vid}"
        (img_root / video_id).mkdir(parents=True)
        (pan_root / video_id).mkdir(parents=True)
        images, annotations = [], []
        # segments: id 1 = thing (moving box), id 2 = stuff (background)
        for f in range(4):
            img = rng.randint(0, 255, (40, 60, 3), np.uint8)
            Image.fromarray(img).save(img_root / video_id / f"f{f}.jpg")
            pan = np.full((40, 60), 2, np.int32)
            x0 = 5 + 3 * f
            pan[10:25, x0 : x0 + 12] = 1
            Image.fromarray(id2rgb(pan)).save(pan_root / video_id / f"f{f}.png")
            images.append(dict(id=f"{video_id}_f{f}", file_name=f"f{f}.jpg",
                               height=40, width=60))
            annotations.append(
                dict(
                    image_id=f"{video_id}_f{f}",
                    file_name=f"f{f}.png",
                    segments_info=[
                        dict(id=1, category_id=3, isthing=True, iscrowd=0),
                        dict(id=2, category_id=7, isthing=False, iscrowd=0),
                    ],
                )
            )
        videos.append(dict(video_id=video_id, images=images, annotations=annotations))
    data = dict(videos=videos, categories=[
        dict(id=3, name="thing", isthing=1), dict(id=7, name="stuff", isthing=0)
    ])
    json_path = tmp_path / "train.json"
    json_path.write_text(json.dumps(data))
    return str(img_root), str(pan_root), str(json_path)


def test_load_and_map(synthetic_vipseg):
    img_root, pan_root, json_path = synthetic_vipseg
    videos, cats = load_vipseg_video_json(json_path, img_root, pan_root)
    assert len(videos) == 2 and len(videos[0]["frames"]) == 4

    mapper = VIPSegClipMapper(
        image_size=(48, 64), num_frames=2, max_instances=8, copy_paste=False, seed=1
    )
    sample = mapper(videos[0])
    assert sample["images"].shape == (2, 48, 64, 3)
    t = sample["targets"]
    assert t["masks"].shape == (8, 2, 12, 16)
    assert t["valid"].sum() >= 1
    # labels of valid slots are the category ids {3, 7}
    assert set(t["labels"][t["valid"]].tolist()) <= {3, 7}
    # semantic map only contains -1 and the two classes
    assert set(np.unique(t["semantic_masks"]).tolist()) <= {-1, 3, 7}


def test_copy_paste_and_loader(synthetic_vipseg):
    img_root, pan_root, json_path = synthetic_vipseg
    videos, _ = load_vipseg_video_json(json_path, img_root, pan_root)
    mapper = VIPSegClipMapper(
        image_size=(48, 64), num_frames=2, max_instances=8, copy_paste=True, seed=2
    )
    loader = ClipDataLoader(videos, mapper, batch_size=2, num_workers=1, prefetch=1)
    it = iter(loader)
    batch = next(it)
    loader.close()
    assert batch["images"].shape == (4, 48, 64, 3)
    assert batch["targets"]["masks"].shape == (2, 8, 2, 12, 16)
    assert np.isfinite(batch["images"]).all()


def test_loader_spawn_safe_after_jax(synthetic_vipseg):
    """Regression for the round-3 fork deadlock: process workers must come
    from a spawn/forkserver context (never fork — the JAX parent is
    multithreaded and a forked child can inherit a held lock), and
    repeated construct/iterate/destroy cycles after JAX is initialized
    must neither hang nor leave live children behind."""
    import jax

    jax.jnp_ones = jax.numpy.ones((8,))  # ensure the backend is live
    img_root, pan_root, json_path = synthetic_vipseg
    videos, _ = load_vipseg_video_json(json_path, img_root, pan_root)
    mapper = VIPSegClipMapper(
        image_size=(48, 64), num_frames=2, max_instances=8,
        copy_paste=False, seed=3)
    for trial in range(3):
        loader = ClipDataLoader(videos, mapper, batch_size=2, num_workers=2,
                                prefetch=1, seed=trial)
        assert loader._ctx.get_start_method() in ("forkserver", "spawn")
        it = iter(loader)
        b1, b2 = next(it), next(it)
        assert b1["images"].shape == (4, 48, 64, 3)
        assert np.isfinite(b2["images"]).all()
        procs = list(loader._procs)
        loader.close()
        assert all(not p.is_alive() for p in procs)


def test_loader_watchdog_on_dead_workers(synthetic_vipseg):
    """If every worker dies (mapper raises), the consumer must get an
    exception, not block forever."""
    import pytest

    img_root, pan_root, json_path = synthetic_vipseg
    videos, _ = load_vipseg_video_json(json_path, img_root, pan_root)

    loader = ClipDataLoader(videos, _BoomMapper(), batch_size=1,
                            num_workers=1, prefetch=1)
    it = iter(loader)
    with pytest.raises(RuntimeError, match="workers exited"):
        next(it)
    loader.close()


class _BoomMapper:
    def __call__(self, video, dataset=None):
        raise ValueError("boom")


def test_transform_replay_consistency(rng):
    tfm = build_train_transforms((32, 48), 0.5, 1.5)
    img0 = rng.randint(0, 255, (40, 60, 3), np.uint8)
    img1 = img0.copy()
    tfm.sample(np.random.RandomState(3), (40, 60))
    out0 = tfm.apply_image(img0)
    out1 = tfm.apply_image(img1)
    np.testing.assert_array_equal(out0, out1)
    seg = rng.randint(0, 5, (40, 60)).astype(np.int32)
    seg_out = tfm.apply_segmentation(seg)
    assert seg_out.shape == out0.shape[:2]
    # nearest resampling preserves the label set
    assert set(np.unique(seg_out)) <= set(np.unique(seg))


def test_register(synthetic_vipseg):
    img_root, pan_root, json_path = synthetic_vipseg
    name = "test_vipseg_train"
    if name not in DatasetCatalog:
        register_vipseg_video(name, img_root, pan_root, json_path)
    videos = DatasetCatalog.get(name)
    assert len(videos) == 2


def test_ov_vipseg_label_maps_and_filtering():
    from axial_vs_tpu.data.ov_vipseg import (
        filter_novel_videos, ov_label_maps, split_thing_categories,
        _thing_only_videos)

    cats = {
        1: dict(id=1, name="car", isthing=1),
        2: dict(id=2, name="cat", isthing=1),
        3: dict(id=3, name="train", isthing=1),
        9: dict(id=9, name="sky", isthing=0),
    }
    novel = (2,)
    base, nov = split_thing_categories(cats, novel)
    assert [c["id"] for c in base] == [1, 3]
    assert [c["id"] for c in nov] == [2]

    train_map, eval_map = ov_label_maps(cats, novel)
    # base things contiguous from 0; stuff absent; novel only in eval,
    # appended AFTER base so base logits line up between train and eval
    assert train_map == {1: 0, 3: 1}
    assert eval_map == {1: 0, 3: 1, 2: 2}
    assert 9 not in eval_map

    videos = [
        dict(video_id="a", frames=[dict(segments_info=[
            dict(id=1, category_id=1), dict(id=2, category_id=9)])]),
        dict(video_id="b", frames=[dict(segments_info=[
            dict(id=1, category_id=2)])]),
    ]
    kept = filter_novel_videos(videos, novel)
    assert [v["video_id"] for v in kept] == ["a"]
    thin = _thing_only_videos(kept, cats, train_map)
    # stuff segment dropped, original untouched
    assert [s["category_id"] for s in thin[0]["frames"][0]["segments_info"]] == [1]
    assert len(videos[0]["frames"][0]["segments_info"]) == 2


def test_ov_vipseg_register(synthetic_vipseg, tmp_path, monkeypatch):
    import shutil

    from axial_vs_tpu.data.ov_vipseg import OV_SPLITS, register_ov_vipseg
    from axial_vs_tpu.data.catalog import MetadataCatalog

    img_root, pan_root, json_path = synthetic_vipseg
    root = tmp_path / "dsroot"
    base = root / "VIPSeg"
    base.mkdir(parents=True)
    shutil.copytree(img_root, base / "imgs")
    shutil.copytree(pan_root, base / "panomasks")
    shutil.copy(json_path, base / "panoVIPSeg_train.json")
    # make category 3 novel for one split by monkeypatching the split table
    monkeypatch.setitem(OV_SPLITS, "base33_novel25", (3,))
    register_ov_vipseg(str(root))
    name = "ov_vipseg_train_base33_novel25"
    assert name in DatasetCatalog
    # every synthetic video contains the (now-novel) thing id 3 -> all skipped
    assert DatasetCatalog.get(name) == []
    meta = MetadataCatalog.get(name)
    assert meta.novel_thing_ids == (3,)
    assert meta.base_thing_ids == ()
    # the other split keeps id 3 as base and drops the stuff segment
    other = "ov_vipseg_train_base46_novel12"
    vids = DatasetCatalog.get(other)
    assert len(vids) == 2
    segs = vids[0]["frames"][0]["segments_info"]
    assert [s["category_id"] for s in segs] == [3]
    assert MetadataCatalog.get(other).thing_dataset_id_to_contiguous_id == {3: 0}


def test_ytvis2coco_flatten():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ytvis2coco", "tools/dataset/ytvis2coco.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    src = dict(
        categories=[dict(id=1, name="cat")],
        videos=[dict(id=7, file_names=["v/0.jpg", "v/1.jpg"], height=4, width=6)],
        annotations=[dict(id=11, video_id=7, category_id=1,
                          segmentations=[{"size": [4, 6], "counts": "x"}, None],
                          bboxes=[[0, 0, 2, 2], None], areas=[4, None])],
    )
    out = mod.convert(src)
    assert len(out["images"]) == 2 and out["images"][1]["frame_id"] == 1
    # None segmentation on frame 1 -> only one flattened annotation
    assert len(out["annotations"]) == 1
    a = out["annotations"][0]
    assert a["image_id"] == out["images"][0]["id"]
    assert a["instance_id"] == 1 and a["video_id"] == 7


def test_kitti_step_prep_layout(tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "kitti_step_prep", "tools/dataset/kitti_step_prep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    src = tmp_path / "panoptic" / "0002"
    src.mkdir(parents=True)
    (src / "000000.png").write_bytes(b"x")
    out = tmp_path / "out"
    n = mod.collect(2, str(tmp_path / "panoptic"), str(out), "panoptic")
    assert n == 1
    assert (out / "000002_000000_panoptic.png").exists()
    # copy by default: source retained
    assert (src / "000000.png").exists()


def test_builtin_registration_gating(tmp_path, rng):
    """Builtin COCO/ADE20k/Cityscapes registration is disk-gated and wires
    category metadata from the JSON (ref register_coco_panoptic_annos_semseg
    / register_ade20k_{panoptic,instance}; V19)."""
    import json as _json
    from PIL import Image as _Image

    from axial_vs_tpu.data import builtin
    from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from axial_vs_tpu.data.panoptic_utils import id2rgb

    root = tmp_path / "datasets"
    # nothing on disk -> nothing registered
    builtin._register_coco_all(str(root))
    builtin._register_ade20k_all(str(root))
    builtin._register_cityscapes_all(str(root))
    assert "coco_2017_val_panoptic" not in DatasetCatalog
    assert "ade20k_panoptic_val" not in DatasetCatalog
    assert "cityscapes_fine_panoptic_val" not in DatasetCatalog

    ann = root / "coco" / "annotations"
    ann.mkdir(parents=True)
    (root / "coco" / "val2017").mkdir()
    panroot = ann / "panoptic_val2017"
    panroot.mkdir()
    _Image.fromarray(id2rgb(np.full((8, 8), 7, np.uint32))).save(
        panroot / "0.png")
    (ann / "panoptic_val2017.json").write_text(_json.dumps({
        "images": [{"id": 1, "file_name": "0.jpg", "height": 8, "width": 8}],
        "annotations": [{"image_id": 1, "file_name": "0.png",
                         "segments_info": [{"id": 7, "category_id": 3,
                                            "iscrowd": 0}]}],
        "categories": [{"id": 3, "name": "sky", "isthing": 0},
                       {"id": 1, "name": "person", "isthing": 1}],
    }))
    (ann / "instances_val2017.json").write_text(_json.dumps({
        "images": [{"id": 1, "file_name": "0.jpg", "height": 8, "width": 8}],
        "annotations": [], "categories": [{"id": 1, "name": "person"}],
    }))
    builtin._register_coco_all(str(root))
    assert "coco_2017_val_panoptic" in DatasetCatalog
    assert "coco_2017_val_instance" in DatasetCatalog
    assert "coco_2017_train_panoptic" not in DatasetCatalog  # not on disk
    records = DatasetCatalog.get("coco_2017_val_panoptic")
    assert len(records) == 1
    meta = MetadataCatalog.get("coco_2017_val_panoptic")
    # contiguous ids ordered by dataset id: person(1)->0, sky(3)->1
    assert meta.thing_dataset_id_to_contiguous_id == {1: 0}
    assert meta.stuff_dataset_id_to_contiguous_id == {3: 1}


def test_coco_instance_mapper(tmp_path, rng):
    """Instance registration + mapper: polygon/RLE annotations -> padded
    slot targets with contiguous ids and aux semantic GT (V19 instance
    half, ref instance_kmaxdeeplab_dataset_mapper.py)."""
    import json as _json
    from PIL import Image as _Image

    from axial_vs_tpu.data import mask_rle
    from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from axial_vs_tpu.data.coco import (
        CocoInstanceMapper, polygons_to_mask, register_coco_instance,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    h, w = 64, 80
    _Image.fromarray(
        rng.randint(0, 255, (h, w, 3)).astype(np.uint8)).save(
        img_dir / "0.jpg")
    rle_mask = np.zeros((h, w), np.uint8)
    rle_mask[10:30, 40:60] = 1
    data = {
        "images": [{"id": 1, "file_name": "0.jpg", "height": h, "width": w}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "segmentation": [[5, 5, 35, 5, 35, 25, 5, 25]]},  # polygon box
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "segmentation": mask_rle.encode(rle_mask)},
            {"id": 3, "image_id": 1, "category_id": 7, "iscrowd": 1,
             "segmentation": [[0, 0, 10, 0, 10, 10]]},  # crowd -> skipped
        ],
        "categories": [{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
    }
    jf = tmp_path / "instances.json"
    jf.write_text(_json.dumps(data))

    register_coco_instance("test_instances", str(img_dir), str(jf))
    records = DatasetCatalog.get("test_instances")
    meta = MetadataCatalog.get("test_instances")
    assert meta.dataset_id_to_contiguous_id == {7: 0, 9: 1}
    assert len(records) == 1

    mapper = CocoInstanceMapper(
        image_size=(64, 80), min_scale=1.0, max_scale=1.0, max_instances=8,
        dataset_id_to_contiguous_id=meta.dataset_id_to_contiguous_id)
    sample = mapper(records[0])
    t = sample["targets"]
    assert sample["images"].shape == (64, 80, 3)
    assert t["masks"].shape == (8, 16, 20)
    assert list(t["valid"]).count(True) == 2  # crowd skipped
    assert sorted(t["labels"][t["valid"]].tolist()) == [0, 1]
    # polygon rasterization covers the box interior
    poly = polygons_to_mask([[5, 5, 35, 5, 35, 25, 5, 25]], h, w)
    assert poly[10, 10] == 1 and poly[2, 2] == 0
    # aux semantic carries contiguous ids
    assert set(np.unique(t["semantic_masks"])) <= {-1, 0, 1}
    assert (t["semantic_masks"] >= 0).any()


@pytest.fixture
def synthetic_coco_panoptic(tmp_path):
    """Two COCO-panoptic records: each a stuff background (class 5) + one
    thing box (class 3) with distinct segment ids."""
    from axial_vs_tpu.data.coco import load_coco_panoptic_json

    img_root = tmp_path / "imgs"
    pan_root = tmp_path / "pans"
    img_root.mkdir()
    pan_root.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        # make the two images distinguishable by constant value
        img[:] = 40 if i == 0 else 200
        Image.fromarray(img).save(img_root / f"{i}.jpg")
        pan = np.full((48, 64), 2 + 10 * i, np.int32)  # stuff id 2 / 12
        pan[8:30, 10 + 20 * i : 30 + 20 * i] = 1 + 10 * i  # thing id 1 / 11
        Image.fromarray(id2rgb(pan)).save(pan_root / f"{i}.png")
        images.append(dict(id=i, file_name=f"{i}.jpg", height=48, width=64))
        annotations.append(dict(
            image_id=i, file_name=f"{i}.png",
            segments_info=[
                dict(id=1 + 10 * i, category_id=3, iscrowd=0, isthing=1),
                dict(id=2 + 10 * i, category_id=5, iscrowd=0, isthing=0),
            ]))
    data = dict(images=images, annotations=annotations,
                categories=[dict(id=3, isthing=1), dict(id=5, isthing=0)])
    jp = tmp_path / "panoptic.json"
    jp.write_text(json.dumps(data))
    records, _ = load_coco_panoptic_json(
        str(jp), str(img_root), str(pan_root))
    return records


def test_coco_panoptic_copy_paste(synthetic_coco_panoptic):
    """The reference's default COCO pretrain recipe pastes a second image's
    segments (all things + random stuff subset) over the main one
    (panoptic_kmaxdeeplab_dataset_mapper.py:231-292): pasted thing must
    appear in the targets, same-class stuff merges into ONE slot, and
    pasted pixels carry the paste image's colors."""
    from axial_vs_tpu.data.coco import CocoPanopticMapper

    records = synthetic_coco_panoptic
    mapper = CocoPanopticMapper(
        image_size=(48, 64), min_scale=1.0, max_scale=1.0,
        max_instances=8, copy_paste=True, seed=3)
    found_paste = False
    for trial in range(8):
        sample = mapper(records[0], dataset=records)
        t = sample["targets"]
        n_valid = int(t["valid"].sum())
        labels = sorted(t["labels"][t["valid"]].tolist())
        # stuff class 5 merges across main+paste -> at most one slot of 5
        assert labels.count(5) <= 1
        # three slots = main thing + pasted thing + merged stuff
        if n_valid == 3:
            assert labels == [3, 3, 5]
            found_paste = True
            break
    assert found_paste, "copy-paste never produced a pasted thing"
    # every valid mask is nonempty and masks partition disjointly (panoptic)
    masks = sample["targets"]["masks"][sample["targets"]["valid"]]
    assert (masks.sum(axis=(1, 2)) > 0).all()
    assert (masks.sum(axis=0) <= 1.0 + 1e-6).all()


def test_coco_panoptic_copy_paste_off_matches_nocopypaste(
        synthetic_coco_panoptic):
    """copy_paste=False reproduces the _nocopypaste mapper: only the main
    image's segments, even when a dataset is supplied."""
    from axial_vs_tpu.data.coco import CocoPanopticMapper

    records = synthetic_coco_panoptic
    mapper = CocoPanopticMapper(
        image_size=(48, 64), min_scale=1.0, max_scale=1.0,
        max_instances=8, copy_paste=False, seed=0)
    sample = mapper(records[0], dataset=records)
    t = sample["targets"]
    assert int(t["valid"].sum()) == 2
    assert sorted(t["labels"][t["valid"]].tolist()) == [3, 5]


def test_coco_instance_copy_paste(tmp_path, rng):
    """Instance copy-paste (instance_kmaxdeeplab_dataset_mapper.py:286-354):
    a pasted instance occludes overlapping main-instance pixels, and the
    pasted mask's pixels carry the paste image."""
    import json as _json

    from axial_vs_tpu.data.coco import (
        CocoInstanceMapper, load_coco_instance_json)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    h, w = 48, 64
    for i in range(2):
        img = np.full((h, w, 3), 40 if i == 0 else 200, np.uint8)
        Image.fromarray(img).save(img_dir / f"{i}.jpg")
    # main instance covers [8:40, 8:40]; other instance [8:40, 24:56]
    data = {
        "images": [
            {"id": i, "file_name": f"{i}.jpg", "height": h, "width": w}
            for i in range(2)],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 7, "iscrowd": 0,
             "segmentation": [[8, 8, 40, 8, 40, 40, 8, 40]]},
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 0,
             "segmentation": [[24, 8, 56, 8, 56, 40, 24, 40]]},
        ],
        "categories": [{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
    }
    jf = tmp_path / "instances.json"
    jf.write_text(_json.dumps(data))
    records, cat_map = load_coco_instance_json(str(jf), str(img_dir))

    mapper = CocoInstanceMapper(
        image_size=(h, w), min_scale=1.0, max_scale=1.0, max_instances=8,
        dataset_id_to_contiguous_id=cat_map, copy_paste=True, seed=1)
    found = False
    for _ in range(8):
        sample = mapper(records[0], dataset=records)
        t = sample["targets"]
        labels = sorted(t["labels"][t["valid"]].tolist())
        if labels == [0, 1]:  # both instances present -> paste happened
            found = True
            break
    assert found, "instance copy-paste never pasted the other instance"
    # the pasted instance occludes the main one where they overlap
    m_main = t["masks"][t["labels"] == 0][0]
    m_paste = t["masks"][t["labels"] == 1][0]
    assert (m_main * m_paste).sum() == 0
    assert m_paste.sum() > 0
