#!/usr/bin/env python
"""Image demo (V26 `demo/demo.py` equivalent): single-image kMaX panoptic
inference + color-coded visualization.

  python demo/demo_image.py --config-file configs/coco/kmax_r50.yaml \
      --input img.jpg --output out.png [--weights ckpt_dir]
"""
import argparse
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="demo_out.png")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.kmax import build_segmenter
    from axial_vs_tpu.models.postprocess import panoptic_inference
    from axial_vs_tpu.models.video_inference import preprocess_frames
    from axial_vs_tpu.ops.resize import resize_bilinear
    from demo.visualizer import draw_panoptic

    cfg = get_default_config()
    cfg.merge_from_file(args.config_file)
    cfg.freeze()

    img = np.asarray(Image.open(args.input).convert("RGB"))
    images, scaled_h, scaled_w, _ = preprocess_frames(
        img[None], cfg.input.pixel_mean, cfg.input.pixel_std,
        cfg.input.image_size,
    )

    module = build_segmenter(cfg, num_frames=1, train=False)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.asarray(images), train=False
    )
    if args.weights:
        from axial_vs_tpu.engine.checkpoint import CheckpointManager

        restored = CheckpointManager(args.weights).restore(variables)
        if restored is not None:
            variables = restored

    kt = cfg.model.kmax.test

    @jax.jit
    def infer(x):
        out = module.apply(variables, x, train=False)
        masks = resize_bilinear(
            out["pred_masks"], cfg.input.image_size,
            align_corners=cfg.input.image_size[1] % 2 == 1,
        )
        return out["pred_logits"][0], masks[0]

    logits, masks = infer(jnp.asarray(images))
    masks = masks[:scaled_h, :scaled_w]
    masks = resize_bilinear(masks, img.shape[:2],
                            align_corners=cfg.input.image_size[1] % 2 == 1)
    thing_mask = jnp.ones((cfg.model.num_classes,), bool)
    result = panoptic_inference(
        logits, masks, thing_mask,
        pixel_confidence_threshold=kt.pixel_confidence_threshold,
        class_threshold_thing=kt.class_threshold_thing,
        class_threshold_stuff=kt.class_threshold_stuff,
        overlap_threshold=kt.overlap_threshold,
    )
    vis = draw_panoptic(img, np.asarray(result.panoptic_seg))
    Image.fromarray(vis).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
