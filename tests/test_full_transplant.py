"""End-to-end converter certification (VERDICT r1 weak #6): build the FULL
reference torch WC pipeline (real wc_module / kMaXPixelDecoder /
MaXTronTransformerDecoder via reference_shims + the reference-custom-BN
R50), convert its random-init state_dict with
utils.torch_convert.convert_maxtron_wc, and assert whole-pipeline logit
parity at fp32. A single wrong key mapping anywhere fails this test.
"""
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import pytest as _pytest

pytestmark = _pytest.mark.parity

sys.path.insert(0, "tools")


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if hasattr(m, "running_mean") and m.running_mean is not None:
            m.running_mean.data = torch.tensor(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1)
            m.running_var.data = torch.tensor(
                0.5 + rng.rand(*m.running_var.shape).astype(np.float32))


def _randomize_params(module, rng, scale=0.1):
    with torch.no_grad():
        for p in module.parameters():
            p.data = torch.tensor(
                rng.randn(*p.shape).astype(np.float32) * scale)


@pytest.mark.slow
def test_full_wc_pipeline_transplant(rng):
    from bench_reference_torch import build_pipeline

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.kmax import build_segmenter
    from axial_vs_tpu.utils.torch_convert import convert_maxtron_wc

    h = w = 129
    t = 2
    bb, bb_forward, wc, pixdec, transdec = build_pipeline(
        "resnet50", (h, w))
    for m in (bb, wc, pixdec, transdec):
        _randomize_params(m, rng)
        _randomize_bn_stats(m, rng)
        m.eval()

    sd = {}
    sd.update({f"backbone.{k}": v for k, v in bb.state_dict().items()})
    sd.update({f"sem_seg_head.wc_module.{k}": v
               for k, v in wc.state_dict().items()})
    sd.update({f"sem_seg_head.pixel_decoder.{k}": v
               for k, v in pixdec.state_dict().items()})
    sd.update({f"sem_seg_head.predictor.{k}": v
               for k, v in transdec.state_dict().items()})

    variables = convert_maxtron_wc(sd, backbone="resnet50")

    cfg = get_default_config()
    cfg.model.backbone.name = "resnet50"
    cfg.model.num_classes = 124
    cfg.input.image_size = [h, w]
    cfg.input.num_clip_frames = t
    cfg.model.maxtron.wc.enable = True
    module = build_segmenter(cfg, num_frames=t, train=False)

    # structural certification: converted tree must match the model's
    # init tree exactly (paths AND shapes) — catches silently-dropped keys
    ref_tree = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0),
                            jnp.zeros((t, h, w, 3)), train=False))

    def flat(tree):
        return {
            "/".join(str(getattr(p, "key", p)) for p in path):
            tuple(leaf.shape)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got_flat = flat(variables)
    want_flat = flat(ref_tree)
    missing = sorted(set(want_flat) - set(got_flat))
    extra = sorted(set(got_flat) - set(want_flat))
    assert not missing, f"missing {len(missing)}: {missing[:8]}"
    assert not extra, f"extra {len(extra)}: {extra[:8]}"
    for k in want_flat:
        assert tuple(got_flat[k]) == tuple(want_flat[k]), (
            k, got_flat[k], want_flat[k])

    # numeric certification: identical input through both pipelines
    x = rng.randn(t, 3, h, w).astype(np.float32) * 0.5
    with torch.no_grad():
        feats = bb_forward(torch.tensor(x))
        wc_out, _, _ = wc.forward_features(feats)
        feats = dict(feats)
        feats.update(wc_out)
        panoptic, semantic, multi = pixdec.forward_features(feats)
        ref_out = transdec(multi, panoptic, semantic)

    variables = jax.tree.map(jnp.asarray, variables)
    ours = module.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    want_logits = ref_out["pred_logits"].numpy()       # (B, Q, K+1)
    got_logits = np.asarray(ours["pred_logits"], np.float32)
    scale = np.abs(want_logits).max()
    np.testing.assert_allclose(
        got_logits, want_logits, atol=2e-3 * max(scale, 1.0), rtol=2e-3,
        err_msg="pred_logits diverge",
    )

    want_masks = ref_out["pred_masks"].numpy()
    got_masks = np.asarray(ours["pred_masks"], np.float32)
    # ours: channels-last (B, T, h, w, Q); reference: (B, Q, T*h, w) or
    # (B, Q, T, h, w) — normalize both to (B, Q, T, h, w)
    if want_masks.ndim == 4:
        b, q = want_masks.shape[:2]
        want_masks = want_masks.reshape(b, q, t, -1, want_masks.shape[-1])
    got_masks = np.moveaxis(got_masks, -1, 1)  # (B, Q, T, h, w)
    mscale = np.abs(want_masks).max()
    np.testing.assert_allclose(
        got_masks, want_masks, atol=4e-3 * max(mscale, 1.0), rtol=4e-3,
        err_msg="pred_masks diverge",
    )
