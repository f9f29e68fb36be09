"""Tube-Link CC detector + VPS family tests."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.backbones.resnet import ResNet
from axial_vs_tpu.models.tube_link.cc_detector import TubeLinkVideoVIS
from axial_vs_tpu.models.tube_link.vps import (
    TubeLinkVPS, TubeLinkVPSInference, TrackEmbedHead,
    multi_pos_contrastive_loss, stuff_fixed_assignment,
)


def _r18():
    return ResNet(depth=18, out_features=("res2", "res3", "res4", "res5"))


def test_multi_pos_contrastive_loss(rng):
    key = jnp.asarray(np.eye(4, 16, dtype=np.float32) * 10)
    ref = jnp.asarray(np.eye(4, 16, dtype=np.float32) * 10)
    match = jnp.eye(4)
    good = float(multi_pos_contrastive_loss(key, ref, match))
    bad = float(multi_pos_contrastive_loss(key, ref, jnp.roll(match, 1, axis=1)))
    assert good < bad


def test_stuff_fixed_assignment():
    slots, labels = stuff_fixed_assignment(100, 5, 19)
    np.testing.assert_array_equal(slots, [100, 101, 102, 103, 104])
    np.testing.assert_array_equal(labels, [19, 20, 21, 22, 23])


def test_tube_link_cc_detector(rng):
    v, num_clips = 2, 2
    model = TubeLinkVideoVIS(
        backbone=_r18(), num_things_classes=5, num_queries=8,
        num_frames=v, num_cc_layers=2,
    )
    images = jnp.asarray(rng.randn(v * num_clips, 32, 48, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(vs, images, train=False)
    assert len(out["cls_preds"]) == 2
    assert out["cls_preds"][-1].shape == (1, 8, 6)
    assert out["mask_preds"][-1].shape == (1, v * num_clips, 8, 8, 12)
    # frozen segmenter: grads only flow to CC heads
    from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion

    targets = {
        "labels": jnp.asarray(rng.randint(0, 5, (1, 3))),
        "masks": jnp.asarray(
            (rng.rand(1, 3, v * num_clips, 8, 12) > 0.6).astype(np.float32)
        ),
        "valid": jnp.ones((1, 3), bool),
    }
    crit = TubeLinkCriterion(num_things=5, num_points=32, match_points=32,
                             exact_matching=False)

    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": vs.get("batch_stats", {})},
            images, train=False,
        )
        return crit.total(crit(jax.random.PRNGKey(0), o, targets))

    g = jax.grad(loss_fn)(vs["params"])
    frozen = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["wc_head_wrapper"], 0.0
    ) + jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["backbone"], 0.0
    )
    cc = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["cc_layers"], 0.0
    )
    assert frozen == 0.0 and cc > 0.0


def test_tube_link_vps_window_stream(rng):
    t = 2
    model = TubeLinkVPS(
        backbone=_r18(), num_things_classes=3, num_stuff_classes=2,
        num_thing_queries=6, num_frames=t,
    )
    images = jnp.zeros((t, 32, 48, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(vs, images, train=False)
    assert out["thing_query"].shape == (1, 6, 256)
    assert out["track_embeds"].shape == (1, 6, 256)
    assert out["cls_preds"][-1].shape[1] == 6 + 2

    pipeline = TubeLinkVPSInference(
        model, vs, clip_len=t, num_things_classes=3, num_stuff_classes=2,
        score_thr=0.0,
    )
    pipeline.init_memory()
    seg0 = pipeline.process_window(rng.randn(t, 32, 48, 3).astype(np.float32), 0)
    seg1 = pipeline.process_window(rng.randn(t, 32, 48, 3).astype(np.float32), 1)
    assert seg0.shape == (t, 8, 12)
    assert seg1.shape == (t, 8, 12)


def test_stdc_vps_recipe_builds_and_runs(rng):
    """The shipped VIPSeg STDC recipe builds a working TubeLinkVPS through
    the meta-arch registry (reference vipseg_tb_stdcv1_8e.py end-to-end)."""
    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.build import build_model_and_criterion

    cfg = get_default_config()
    cfg.merge_from_file("configs/vipseg/tube_link_vps_stdc1.yaml")
    # shrink for test speed
    cfg.model.num_classes = 6
    cfg.model.num_things = 3
    cfg.model.tube_link.num_queries = 8
    cfg.input.num_clip_frames = 2
    model, criterion = build_model_and_criterion(cfg, train=False)
    assert type(model.backbone).__name__ == "STDCNet"

    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    leaf = next(iter(jax.tree_util.tree_leaves(out)))
    assert np.isfinite(np.asarray(leaf)).all()
    assert isinstance(out, dict) and len(out) > 0


def test_vitae_vis_recipe_builds_and_runs(rng):
    """A ViTAEv2-VSA-backed TubeLink recipe builds through the registry
    (the reference registers ViTAEv2_VSA in mmdet BACKBONES, T2)."""
    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.build import build_model_and_criterion

    cfg = get_default_config()
    cfg.model.meta_architecture = "TubeLinkVIS"
    cfg.model.backbone.name = "vitaev2_s"
    cfg.model.backbone.vitae.embed_dims = [8, 8, 8, 8]
    cfg.model.backbone.vitae.token_dims = [8, 16, 32, 64]
    cfg.model.backbone.vitae.nc_depths = [1, 1, 1, 1]
    cfg.model.backbone.vitae.nc_heads = [2, 2, 2, 2]
    cfg.model.backbone.vitae.nc_groups = [1, 2, 2, 2]
    cfg.model.backbone.vitae.window_size = 2
    cfg.model.num_classes = 6
    cfg.model.tube_link.num_queries = 8
    cfg.input.num_clip_frames = 2
    model, _ = build_model_and_criterion(cfg, train=False)
    assert type(model.backbone).__name__ == "ViTAEv2VSA"

    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    out = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    leaf = next(iter(jax.tree_util.tree_leaves(out)))
    assert np.isfinite(np.asarray(leaf)).all()
