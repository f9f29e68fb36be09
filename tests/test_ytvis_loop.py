"""Whole-video YTVIS evaluation loop + submission dump
(`engine/evaluator_loop.evaluate_ytvis` — the reference's
`tools/test_video.py` / `--format-only` workflow)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from axial_vs_tpu.data import mask_rle
from axial_vs_tpu.data.catalog import DatasetCatalog
from axial_vs_tpu.data.ytvis import register_ytvis
from axial_vs_tpu.models.backbones.resnet import ResNet
from axial_vs_tpu.models.tube_link.detector import TubeLinkVIS


@pytest.fixture
def tiny_ytvis(tmp_path):
    img_root = tmp_path / "frames"
    rng = np.random.RandomState(0)
    videos, annotations = [], []
    for vid in (1, 2):
        files = []
        for fi in range(3):
            rel = f"v{vid}/{fi:03d}.jpg"
            p = img_root / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                (rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(p)
            files.append(rel)
        videos.append(dict(id=vid, file_names=files, height=24, width=32,
                           length=3))
        m = np.zeros((24, 32), np.uint8)
        m[4:12, 8:20] = 1
        annotations.append(dict(
            id=vid, video_id=vid, category_id=2,
            segmentations=[mask_rle.encode(m)] * 3,
            areas=[int(m.sum())] * 3, iscrowd=0,
        ))
    js = tmp_path / "train.json"
    with open(js, "w") as f:
        json.dump(dict(
            videos=videos, annotations=annotations,
            categories=[dict(id=1, name="a"), dict(id=2, name="b")],
        ), f)
    name = "tiny_ytvis_loop_test"
    if name in DatasetCatalog:
        DatasetCatalog.pop(name)
    register_ytvis(name, str(img_root), str(js))
    return name


def test_evaluate_ytvis_ap_and_submission(tiny_ytvis, tmp_path):
    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.engine.evaluator_loop import evaluate_ytvis

    cfg = get_default_config()
    cfg.datasets.test = [tiny_ytvis]
    cfg.input.image_size = [33, 33]
    cfg.model.tube_link.clip_len = 2
    cfg.model.tube_link.test_topk = 4
    cfg.freeze()

    module = TubeLinkVIS(
        backbone=ResNet(depth=18, out_features=("res2", "res3", "res4", "res5")),
        num_things_classes=2, num_queries=6, num_frames=2,
    )
    images = jnp.zeros((2, 33, 33, 3), jnp.float32)
    vs = module.init(jax.random.PRNGKey(0), images, train=False,
                     return_query=True)

    out_json = str(tmp_path / "results.json")
    results = evaluate_ytvis(cfg, module, vs, format_only_path=out_json)

    # submission dump: valid YTVIS records at ORIGINAL resolution,
    # dataset category ids (1-based from the json categories)
    assert os.path.exists(out_json)
    with open(out_json) as f:
        preds = json.load(f)
    assert results["num_videos"] == 2 and len(preds) == results["num_predictions"]
    for r in preds:
        assert r["video_id"] in (1, 2)
        assert r["category_id"] in (1, 2)
        assert len(r["segmentations"]) == 3
        for s in r["segmentations"]:
            if s is not None:
                assert mask_rle.decode(s).shape == (24, 32)
    # GT present -> devkit AP metrics computed (random net: value arbitrary)
    assert "AP" in results and -1.0 <= results["AP"] <= 1.0
