"""Single-image COCO panoptic PQ evaluation loop
(`engine/evaluator_loop.evaluate_coco_panoptic` — the reference's
`kmax_deeplab/evaluation/panoptic_evaluation.py` workflow)."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from axial_vs_tpu.data.catalog import DatasetCatalog
from axial_vs_tpu.data.coco import register_coco_panoptic
from axial_vs_tpu.data.panoptic_utils import id2rgb


@pytest.fixture
def tiny_coco(tmp_path):
    img_root = tmp_path / "imgs"
    pan_root = tmp_path / "pans"
    img_root.mkdir()
    pan_root.mkdir()
    rng = np.random.RandomState(0)
    images, annos = [], []
    for i in (1, 2):
        Image.fromarray((rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
            img_root / f"{i:06d}.jpg")
        pan = np.zeros((24, 32), np.int64)
        pan[:, :16] = 7          # thing instance, category 1
        pan[:, 16:] = 9          # stuff region, category 3
        Image.fromarray(id2rgb(pan)).save(pan_root / f"{i:06d}.png")
        images.append(dict(id=i, file_name=f"{i:06d}.jpg",
                           height=24, width=32))
        annos.append(dict(
            image_id=i, file_name=f"{i:06d}.png",
            segments_info=[
                dict(id=7, category_id=1, isthing=1, iscrowd=0),
                dict(id=9, category_id=3, isthing=0, iscrowd=0),
            ]))
    js = tmp_path / "panoptic.json"
    with open(js, "w") as f:
        json.dump(dict(
            images=images, annotations=annos,
            categories=[dict(id=1, name="t", isthing=1),
                        dict(id=3, name="s", isthing=0)],
        ), f)
    name = "tiny_coco_pq_loop_test"
    if name in DatasetCatalog:
        DatasetCatalog.pop(name)
    register_coco_panoptic(name, str(img_root), str(pan_root), str(js))
    return name


def test_evaluate_coco_panoptic(tiny_coco):
    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.engine.evaluator_loop import evaluate_coco_panoptic
    from axial_vs_tpu.models.kmax import build_segmenter

    cfg = get_default_config()
    cfg.datasets.test = [tiny_coco]
    cfg.input.image_size = [33, 33]
    cfg.model.num_classes = 2
    cfg.model.backbone.name = "resnet18"
    cfg.freeze()

    module = build_segmenter(cfg, num_frames=1, train=False)
    images = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), images, train=False)

    results = evaluate_coco_panoptic(cfg, module, variables)
    # random net: metrics defined and bounded; structure is the contract
    assert set(results) >= {"all", "things", "stuff", "per_class"}
    assert results["all"]["n"] == 2  # both categories appear in GT
    for k in ("pq", "sq", "rq"):
        assert 0.0 <= results["all"][k] <= 1.0
