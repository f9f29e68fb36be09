"""End-to-end slices: WC video inference -> VPQ evaluation, and a short
training run — all on the virtual CPU mesh with a tiny model."""
import json

import numpy as np
import pytest
import jax
from PIL import Image

from axial_vs_tpu.config import get_default_config
from axial_vs_tpu.data.panoptic_utils import id2rgb
from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from axial_vs_tpu.data.vipseg import register_vipseg_video

import pytest as _pytest

pytestmark = _pytest.mark.parity


def _tiny_cfg(tmp_name):
    cfg = get_default_config()
    cfg.model.meta_architecture = "MaXTronWCDeepLab"
    cfg.input.dataset_mapper_name = "vipseg_panoptic_mapper"
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = 4
    cfg.model.kmax.pixel_dec.dec_channels = [32, 24, 16, 8]
    cfg.model.kmax.pixel_dec.dec_layers = [1, 1, 1, 1]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.model.kmax.trans_dec.num_object_queries = 8
    cfg.model.maxtron.wc.enable = True
    cfg.model.maxtron.wc.conv_dims = 32
    cfg.model.maxtron.wc.dim_feedforward = 64
    cfg.model.maxtron.wc.spatial_layers = 2
    cfg.model.maxtron.wc.temporal_layers = 2
    cfg.input.image_size = [64, 96]
    cfg.input.num_clip_frames = 2
    cfg.input.num_video_frames = 2
    cfg.datasets.train = [tmp_name]
    cfg.datasets.test = [tmp_name]
    cfg.solver.ims_per_batch = 2
    cfg.dataloader.num_workers = 1
    return cfg


@pytest.fixture
def tiny_dataset(tmp_path):
    """Synthetic 2-video VIPSeg-format dataset + registered metadata."""
    name = f"e2e_vipseg_{tmp_path.name}"
    img_root = tmp_path / "imgs"
    pan_root = tmp_path / "panomasks"
    rng = np.random.RandomState(0)
    videos = []
    for vid in range(2):
        video_id = f"v{vid}"
        (img_root / video_id).mkdir(parents=True)
        (pan_root / video_id).mkdir(parents=True)
        images, annotations = [], []
        for f in range(3):
            img = rng.randint(0, 255, (48, 72, 3), np.uint8)
            Image.fromarray(img).save(img_root / video_id / f"{f:05d}.jpg")
            pan = np.full((48, 72), 2, np.int32)
            pan[10:30, 10 + 5 * f : 30 + 5 * f] = 1
            Image.fromarray(id2rgb(pan)).save(pan_root / video_id / f"{f:05d}.png")
            images.append(dict(id=f"{video_id}_{f}", file_name=f"{f:05d}.jpg",
                               height=48, width=72))
            annotations.append(dict(
                image_id=f"{video_id}_{f}", file_name=f"{f:05d}.png",
                segments_info=[
                    dict(id=1, category_id=10, isthing=True, iscrowd=0),
                    dict(id=2, category_id=20, isthing=False, iscrowd=0),
                ],
            ))
        videos.append(dict(video_id=video_id, images=images, annotations=annotations))
    data = dict(videos=videos, categories=[
        dict(id=10, name="obj", isthing=1),
        dict(id=20, name="bg", isthing=0),
        dict(id=30, name="other", isthing=1),
        dict(id=40, name="more", isthing=0),
    ])
    json_path = tmp_path / "panoVIPSeg_val.json"
    json_path.write_text(json.dumps(data))

    meta = register_vipseg_video(
        name, str(img_root), str(pan_root), str(json_path)
    )
    cats = sorted(data["categories"], key=lambda c: c["id"])
    meta.categories = {c["id"]: c for c in cats}
    meta.thing_dataset_id_to_contiguous_id = {}
    meta.stuff_dataset_id_to_contiguous_id = {}
    meta.contiguous_to_dataset_id = []
    for i, c in enumerate(cats):
        meta.contiguous_to_dataset_id.append(c["id"])
        if c["isthing"]:
            meta.thing_dataset_id_to_contiguous_id[c["id"]] = i
        else:
            meta.stuff_dataset_id_to_contiguous_id[c["id"]] = i
    meta.label_divisor = 10000
    meta.ignore_label = 255
    return name


def test_wc_inference_to_vpq(tiny_dataset):
    from axial_vs_tpu.engine.evaluator_loop import evaluate_vipseg
    from axial_vs_tpu.models.kmax import build_segmenter

    cfg = _tiny_cfg(tiny_dataset)
    cfg.freeze()
    module = build_segmenter(cfg, num_frames=2, train=False)
    import jax.numpy as jnp

    images = jnp.zeros((2, 64, 96, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), images, train=False)
    results = evaluate_vipseg(cfg, module, variables, compute_stq=True)
    assert "vpq" in results and 0.0 <= results["vpq"] <= 1.0
    assert set(results["per_window"]) == {1, 2, 4, 6}
    assert 0.0 <= results["stq"]["STQ"] <= 1.0


def test_short_training_run(tiny_dataset, tmp_path):
    from axial_vs_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg(tiny_dataset)
    cfg.output_dir = str(tmp_path / "out")
    cfg.solver.max_iter = 2
    cfg.solver.checkpoint_period = 2
    cfg.model.kmax.pixel_insdis_sample_k = 32
    cfg.model.kmax.aux_semantic_sample_k = 32
    cfg.freeze()
    trainer = Trainer(cfg)
    state = trainer.train()
    assert int(state.step) == 2
    trainer.loader.close()
    # checkpoint written and resumable
    assert trainer.ckpt.latest_step() == 2


def test_dynamic_eval_intervals(tiny_dataset, tmp_path):
    """mmdet EvalHook dynamic_intervals semantics (T15,
    `apis/hook/eval_hook.py:31-40`): past each milestone the eval period
    switches — [(3, 1)] with base period 2 evaluates at 2, 3, 4, 5, 6."""
    from axial_vs_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg(tiny_dataset)
    cfg.output_dir = str(tmp_path / "out")
    cfg.solver.max_iter = 6
    cfg.solver.checkpoint_period = 6
    cfg.model.kmax.pixel_insdis_sample_k = 32
    cfg.model.kmax.aux_semantic_sample_k = 32
    cfg.test.eval_period = 2
    cfg.test.dynamic_eval_intervals = [[3, 1]]
    cfg.freeze()
    trainer = Trainer(cfg)
    seen = []

    def eval_fn(variables):
        seen.append(True)
        return {"ok": 1.0}

    trainer.train(eval_fn=eval_fn)
    trainer.loader.close()
    # steps 1..6 with period 2 until milestone 3, then period 1:
    # evals at 2, 3, 4, 5, 6
    assert len(seen) == 5
