"""Clip-wise inference + evaluator stitching + attention extraction."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.config import get_default_config
from axial_vs_tpu.models.kmax import build_segmenter
from axial_vs_tpu.models.video_inference import WCInferencePipeline
from axial_vs_tpu.evaluation.vipseg_evaluator import VIPSegEvaluator, lap_with_cost_limit


def test_lap_with_cost_limit():
    cost = np.array([[0.1, 0.9], [0.9, 0.2]])
    out = lap_with_cost_limit(cost, cost_limit=0.5)
    np.testing.assert_array_equal(out, [0, 1])
    # all costs above limit -> unmatched
    out2 = lap_with_cost_limit(np.full((2, 2), 0.9), cost_limit=0.5)
    np.testing.assert_array_equal(out2, [-1, -1])


def _tiny_pipeline():
    cfg = get_default_config()
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
    module = build_segmenter(cfg, num_frames=2, train=False)
    images = jnp.zeros((2, 64, 96, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), images, train=False)
    thing_mask = np.array([True, True, False, False])
    return WCInferencePipeline(
        module, variables, num_clip_frames=2, input_size=(64, 96),
        pixel_mean=(127.5,) * 3, pixel_std=(127.5,) * 3,
        thing_class_mask=thing_mask,
        contiguous_to_dataset_id=np.arange(4) + 1,
        class_threshold_thing=0.0, class_threshold_stuff=0.0,
    )


def test_clipwise_and_stitch(rng):
    pipeline = _tiny_pipeline()
    frames = rng.randint(0, 255, (4, 48, 72, 3)).astype(np.uint8)
    clip_ids, clip_embs = pipeline.run_video_clipwise(frames)
    assert len(clip_ids) == 2 and clip_ids[0].shape == (2, 48, 72)

    evaluator = VIPSegEvaluator(categories={i: {"isthing": i < 2} for i in range(4)})
    stitched = evaluator.stitch_clips(clip_ids, clip_embs)
    assert stitched.shape == (4, 48, 72)


def test_attention_extraction(rng):
    pipeline = _tiny_pipeline()
    frames = rng.randint(0, 255, (2, 48, 72, 3)).astype(np.uint8)
    h_attn, w_attn = pipeline.extract_attention(frames)
    # trajectory attention maps over the lowest temporal level (res5):
    # height: (B*W5, heads, T*H5, T, H5)
    assert h_attn is not None and w_attn is not None
    assert np.isfinite(h_attn).all() and np.isfinite(w_attn).all()
    # softmax-normalized over the last (spatial) axis
    np.testing.assert_allclose(h_attn.sum(-1), 1.0, rtol=1e-4)


def test_windowed_long_video_bounded(rng):
    """Videos longer than videowise_max_frames run in bounded windows with
    cross-window slot re-ID: output covers every frame, ids stay in the
    (cat*divisor + instance) format, and a repeated static video gives
    IDENTICAL ids in every window (same embeddings -> same slots)."""
    pipeline = _tiny_pipeline()
    pipeline.videowise_max_frames = 4  # force windowing at 3 windows

    frame = rng.randint(0, 255, (1, 48, 72, 3)).astype(np.uint8)
    frames = np.repeat(frame, 12, axis=0)  # static 12-frame video
    ids, result, embds = pipeline.run_video(frames)
    assert ids.shape == (12, 48, 72)
    assert embds is not None

    # static video: every window must produce the same id map
    np.testing.assert_array_equal(ids[0], ids[4])
    np.testing.assert_array_equal(ids[0], ids[8])

    # short video still uses the single-pass path and matches the windowed
    # result on the shared prefix
    ids_short, _, _ = pipeline.run_video(frames[:4])
    np.testing.assert_array_equal(ids_short, ids[:4])
