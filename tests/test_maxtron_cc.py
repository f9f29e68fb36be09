"""MaXTron CC meta-arch tests: alignment, forward, loss."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.models.maxtron_cc import MaXTronCCModel, align_clip_queries
from axial_vs_tpu.models.kmax import build_segmenter
from axial_vs_tpu.losses.criterion import SetCriterion
from axial_vs_tpu.config import get_default_config


def test_align_clip_queries_identity_on_permutation(rng):
    t, n, c = 3, 6, 8
    base = rng.randn(n, c).astype(np.float32)
    perms = [rng.permutation(n) for _ in range(t)]
    embds = np.stack([base[p] for p in perms])
    centers = embds + 0.0
    aligned, _ = align_clip_queries(jnp.asarray(embds), jnp.asarray(centers))
    # every clip aligns back to clip 0's slot order
    for i in range(t):
        np.testing.assert_allclose(np.asarray(aligned[i]), base[perms[0]], atol=1e-6)


def _tiny_cfg():
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = 5
    cfg.model.kmax.pixel_dec.dec_channels = [32, 24, 16, 8]
    cfg.model.kmax.pixel_dec.dec_layers = [1, 1, 1, 1]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.model.kmax.trans_dec.num_object_queries = 8
    cfg.input.image_size = [64, 64]
    return cfg


def test_cc_forward_and_loss(rng):
    cfg = _tiny_cfg()
    v, num_clips = 2, 2
    t_total = v * num_clips
    segmenter = build_segmenter(cfg, num_frames=v, train=False)
    model = MaXTronCCModel(
        segmenter=segmenter, num_classes=5, num_clip_frames=v,
        num_video_frames=t_total, cc_num_layers=2, exact_matching=False,
    )
    images = jnp.asarray(rng.randn(t_total, 64, 64, 3).astype(np.float32))
    vs = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(vs, images, train=False)
    assert out["pred_logits"].shape == (1, 8, 6)
    assert out["pred_masks"].shape == (1, t_total, 16, 16, 8)
    assert len(out["aux_outputs"]) == 1

    # CC loss: matching over video tubes
    targets = {
        "labels": jnp.asarray(rng.randint(0, 5, (1, 4))),
        "masks": jnp.asarray((rng.rand(1, 4, t_total, 16, 16) > 0.7).astype(np.float32)),
        "valid": jnp.ones((1, 4), bool),
    }
    crit = SetCriterion(num_classes=5, losses=("labels", "masks"),
                        exact_matching=False)
    losses = crit(jax.random.PRNGKey(1), out, targets)
    for k in ("loss_ce", "loss_mask", "loss_dice"):
        assert np.isfinite(float(losses[k]))

    # only CC params should require training (segmenter frozen by
    # stop_gradient): grads wrt segmenter params must be zero
    def loss_fn(params):
        o = model.apply({"params": params, "batch_stats": vs.get("batch_stats", {})},
                        images, train=False)
        ls = crit(jax.random.PRNGKey(1), o, targets)
        return ls["loss_dice"]

    g = jax.grad(loss_fn)(vs["params"])
    seg_grad = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["segmenter"], 0.0
    )
    cc_grad = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["cc_module"], 0.0
    )
    assert seg_grad == 0.0
    assert cc_grad > 0.0
