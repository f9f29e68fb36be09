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
        object_mask_thr=0.0, iou_thr=0.0,
    )
    pipeline.init_memory()
    win = rng.randn(t, 32, 48, 3).astype(np.float32)
    seg0 = pipeline.process_window(win, 0)
    seg1 = pipeline.process_window(rng.randn(t, 32, 48, 3).astype(np.float32), 1)
    assert seg0.shape == (t, 8, 12)
    assert seg1.shape == (t, 8, 12)
    # reference id convention: void == num_classes; thing ids decompose as
    # cls + inst * INSTANCE_OFFSET with cls < num_classes
    off = pipeline.label_divisor
    for seg in (seg0, seg1):
        assert ((seg % off) <= 5).all()
    # same window replayed with a fresh tracker: identical embeddings must
    # reproduce the identical id assignment (match_panoptic determinism)
    pipeline.init_memory()
    pipeline._pre_thing_query = None
    seg0b = pipeline.process_window(win, 0)
    np.testing.assert_array_equal(seg0, seg0b)


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


def test_vps_criterion_stuff_fixed_pins_slots(rng):
    """stuff_fixed=True: stuff class k must be supervised at query slot
    Q - num_stuff + k (ref mask2former_video_head_custom_no_stuff_match.py:
    191-193), things Hungarian-matched among the first Q - num_stuff slots."""
    from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion

    nt, ns, q_th, t, h, w = 3, 2, 4, 2, 8, 12
    q = q_th + ns
    crit = TubeLinkCriterion(
        num_things=nt, num_stuff=ns, num_points=32, match_points=32,
        stuff_fixed=True, loss_split=True,
    )
    # one thing GT (label 1) + one stuff GT (label nt+1 -> slot q_th+1)
    labels = jnp.asarray([[1, nt + 1]])
    masks = jnp.asarray((rng.rand(1, 2, t, h, w) > 0.5).astype(np.float32))
    valid = jnp.ones((1, 2), bool)
    targets = {"labels": labels, "masks": masks, "valid": valid}

    # cls logits: make the PINNED stuff slot confident in the right class,
    # the OTHER stuff slot confident in a wrong class. If pinning works,
    # this configuration has near-zero stuff CE for the pinned slot.
    cls = np.zeros((1, q, nt + ns + 1), np.float32)
    cls[0, q_th + 1, nt + 1] = 20.0   # pinned slot -> its class
    cls[0, q_th + 0, nt + ns] = 20.0  # absent stuff slot -> background
    mask_pred = np.zeros((1, t, q, h, w), np.float32)
    mask_pred[0, :, q_th + 1] = np.asarray(masks[0, 1]) * 20 - 10
    good = crit(jax.random.PRNGKey(0),
                {"cls_preds": [jnp.asarray(cls)],
                 "mask_preds": [jnp.asarray(mask_pred)]}, targets)

    # now put the stuff prediction on the WRONG slot: loss must increase
    cls_bad = np.zeros_like(cls)
    cls_bad[0, q_th + 0, nt + 1] = 20.0
    mask_bad = np.zeros_like(mask_pred)
    mask_bad[0, :, q_th + 0] = np.asarray(masks[0, 1]) * 20 - 10
    bad = crit(jax.random.PRNGKey(0),
               {"cls_preds": [jnp.asarray(cls_bad)],
                "mask_preds": [jnp.asarray(mask_bad)]}, targets)

    assert float(good["stuff_loss_cls"]) < float(bad["stuff_loss_cls"])
    assert float(good["stuff_loss_dice"]) < float(bad["stuff_loss_dice"])
    # split mode emits separate thing_/stuff_ keys (ref loss_split_thing_stuff)
    assert {"thing_loss_cls", "stuff_loss_cls"} <= set(good)


def test_vps_keyref_train_step(rng):
    """One key/ref training step: finite losses incl. contrastive track loss
    and per-tube _ref terms; gradients reach the track/link heads."""
    from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion
    from axial_vs_tpu.models.tube_link.vps import tube_link_vps_train_losses

    t, nt_cls, ns_cls, q_th = 2, 3, 2, 6
    model = TubeLinkVPS(
        backbone=_r18(), num_things_classes=nt_cls, num_stuff_classes=ns_cls,
        num_thing_queries=q_th, num_frames=t,
    )
    images = jnp.zeros((t, 32, 48, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), images, train=True)
    crit = TubeLinkCriterion(
        num_things=nt_cls, num_stuff=ns_cls, num_points=32, match_points=32,
        stuff_fixed=True, loss_split=True, exact_matching=False,
    )

    def make_targets(seed):
        r = np.random.RandomState(seed)
        return {
            "labels": jnp.asarray([[0, 1, nt_cls + 1]]),
            "masks": jnp.asarray(
                (r.rand(1, 3, t, 8, 12) > 0.5).astype(np.float32)),
            "valid": jnp.ones((1, 3), bool),
            "instance_ids": jnp.asarray([[7, 9, -1]]),
        }

    batch = {
        "key": {"images": jnp.asarray(rng.randn(t, 32, 48, 3), jnp.float32),
                "targets": make_targets(1)},
        "ref": {"images": jnp.asarray(rng.randn(t, 32, 48, 3), jnp.float32),
                "targets": make_targets(2)},
    }

    def loss_fn(params):
        losses, total, _ = tube_link_vps_train_losses(
            model, {"params": params,
                    "batch_stats": vs.get("batch_stats", {})},
            jax.random.PRNGKey(0), batch, crit,
        )
        return total, losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        vs["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "loss_track" in losses and "thing_loss_cls_ref" in losses \
        and "thing_loss_cls" in losses and "stuff_loss_cls" in losses
    for mod in ("track_head", "thing_link"):
        s = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()), grads[mod], 0.0)
        assert s > 0.0, mod


def test_vps_two_frame_train_step(rng):
    """The 2-frame variant (`tube_link_vps_2frames.py`): a 1-frame key tube
    trains against a multi-frame ref tube, ``mlp_only`` uses linked queries
    directly as track embeddings (no embed-MLP params), and ``ref_mode``
    drops the ref tube's segmentation losses (:342-346), keeping only the
    contrastive pair."""
    from axial_vs_tpu.models.tube_link.criterion import TubeLinkCriterion
    from axial_vs_tpu.models.tube_link.vps import tube_link_vps_train_losses

    nt_cls, ns_cls, q_th = 3, 2, 6
    model = TubeLinkVPS(
        backbone=_r18(), num_things_classes=nt_cls, num_stuff_classes=ns_cls,
        num_thing_queries=q_th, num_frames=1, mlp_only=True,
    )
    images = jnp.zeros((1, 32, 48, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), images, train=True)
    assert "track_head" not in vs["params"]  # mlp_only: no embed-MLP
    crit = TubeLinkCriterion(
        num_things=nt_cls, num_stuff=ns_cls, num_points=32, match_points=32,
        stuff_fixed=True, loss_split=True, exact_matching=False,
    )

    def make_targets(seed, t):
        r = np.random.RandomState(seed)
        return {
            "labels": jnp.asarray([[0, 1, nt_cls + 1]]),
            "masks": jnp.asarray(
                (r.rand(1, 3, t, 8, 12) > 0.5).astype(np.float32)),
            "valid": jnp.ones((1, 3), bool),
            "instance_ids": jnp.asarray([[7, 9, -1]]),
        }

    batch = {
        "key": {"images": jnp.asarray(rng.randn(1, 32, 48, 3), jnp.float32),
                "targets": make_targets(1, 1)},
        "ref": {"images": jnp.asarray(rng.randn(2, 32, 48, 3), jnp.float32),
                "targets": make_targets(2, 2)},
    }

    def loss_fn(params):
        losses, total, _ = tube_link_vps_train_losses(
            model, {"params": params,
                    "batch_stats": vs.get("batch_stats", {})},
            jax.random.PRNGKey(0), batch, crit, ref_mode=True,
        )
        return total, losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        vs["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert "loss_track" in losses and "thing_loss_cls" in losses
    assert not any(k.endswith("_ref") for k in losses)  # ref_mode
    s = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["thing_link"], 0.0)
    assert s > 0.0


def test_vps_instance_id_carry(rng):
    """``match_instance`` behavior (`tube_link_vps.py:638-679`): per-frame
    instance results carry PERSISTENT track ids across windows — replaying
    identical windows must re-match every detection to the same id."""
    t = 2
    model = TubeLinkVPS(
        backbone=_r18(), num_things_classes=3, num_stuff_classes=2,
        num_thing_queries=6, num_frames=t,
    )
    images = jnp.zeros((t, 32, 48, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), images, train=False)
    # cosine matching: bisoftmax needs TRAINED (large-magnitude) embeddings
    # to be non-uniform — random-init embeds make it ~1/N < match_score_thr
    pipeline = TubeLinkVPSInference(
        model, vs, clip_len=t, num_things_classes=3, num_stuff_classes=2,
        tracker_kwargs=dict(match_metric="cosine"),
    )
    pipeline.init_memory()
    win = rng.randn(t, 32, 48, 3).astype(np.float32)
    res0 = pipeline.process_window_instance(win, 0, score_thr=0.0)
    assert len(res0) == t
    k = len(res0[0]["labels"])
    assert k > 0
    assert res0[0]["masks"].shape == (k, 8, 12)
    assert res0[0]["masks"].dtype == bool
    # every frame of the window shares the window-level detections/ids
    np.testing.assert_array_equal(res0[0]["track_ids"], res0[1]["track_ids"])
    first_ids = res0[0]["track_ids"]
    assert (first_ids >= 0).any()

    # identical second window with identical link state: same embeddings
    # must re-match to the SAME persistent ids (the id-carry contract).
    # (pre_thing_query is reset so the forward — and thus the embeddings —
    # is bit-identical; the tracker memory is NOT reset.)
    pipeline._pre_thing_query = None
    res1 = pipeline.process_window_instance(win, 1, score_thr=0.0)
    m0 = first_ids >= 0
    np.testing.assert_array_equal(res1[0]["track_ids"][m0], first_ids[m0])
