"""Evaluator-loop scale realism (VERDICT r3 #8): run the FULL
`evaluate_vipseg` path (WC inference pipeline -> windowed video-wise
stitching -> VIPSegEvaluator re-ID -> VPQ windows {1,2,4,6}) on a
synthetic VIPSeg-val-shaped dataset — >= 10 videos at 720p with real
video lengths — and record wall time + peak RSS, so eval at dataset scale
is bounded BEFORE real data shows up (no O(video^2) or memory cliffs).

Reference analog: `maxtron_deeplab/evaluation/vipseg_evaluation.py:287-320`
(whole-split evaluation).

Run (TPU, ~minutes):   python tools/bench_eval_scale.py
CPU smoke (tiny):      JAX_PLATFORMS=cpu python tools/bench_eval_scale.py \
                           --videos 2 --frames 4 --hw 96 160
Prints one JSON line with per-video timings, total, and peak_rss_gb.
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=10)
    ap.add_argument("--frames", type=int, default=24,
                    help="frames per video (VIPSeg val median ~20-40 "
                         "sampled frames)")
    ap.add_argument("--hw", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--input-size", type=int, nargs=2, default=[385, 673],
                    help="model input (eval downscales to this)")
    ap.add_argument("--out", default="/tmp/axialvs_eval_scale")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from axial_vs_tpu.engine.evaluator_loop import evaluate_vipseg
    from axial_vs_tpu.models.kmax import build_segmenter
    from tests.fixtures_vipseg import synthesize_vipseg_videos

    t0 = time.time()
    videos = synthesize_vipseg_videos(
        args.out, n_videos=args.videos, n_frames=args.frames,
        hw=tuple(args.hw), thing_class=0, stuff_class=1)
    gen_s = time.time() - t0

    name = "eval_scale_fixture"
    if name not in DatasetCatalog:
        DatasetCatalog.register(name, lambda: videos)
    meta = MetadataCatalog.get(name)
    meta.contiguous_to_dataset_id = [0, 1]
    meta.thing_dataset_id_to_contiguous_id = {0: 0}
    meta.stuff_dataset_id_to_contiguous_id = {1: 1}
    meta.label_divisor = 1000
    meta.ignore_label = 255

    t = 2
    cfg = get_default_config()
    cfg.model.backbone.name = "resnet18"
    cfg.model.backbone.resnet.depth = 18
    cfg.model.num_classes = 2
    cfg.input.image_size = list(args.input_size)
    cfg.input.num_clip_frames = t
    cfg.input.num_video_frames = t
    cfg.model.maxtron.wc.enable = True
    cfg.model.maxtron.wc.conv_dims = 64
    cfg.model.maxtron.wc.dim_feedforward = 128
    cfg.model.maxtron.wc.spatial_layers = 1
    cfg.model.maxtron.wc.temporal_layers = 1
    cfg.model.kmax.trans_dec.num_object_queries = 16
    cfg.model.kmax.pixel_dec.dec_channels = [64, 48, 32, 16]
    cfg.model.kmax.trans_dec.dec_layers = [1, 1, 1]
    cfg.output_dir = args.out
    cfg.datasets.test = [name]

    module = build_segmenter(cfg, num_frames=t, train=False)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((t, *cfg.input.image_size, 3), jnp.float32), train=False)

    per_video = []
    t_eval0 = time.time()

    # wrap process_video to time each video incl. inference
    from axial_vs_tpu.evaluation import vipseg_evaluator as _ve

    orig = _ve.VIPSegEvaluator.process_video
    last = [t_eval0]

    def timed(self, *a, **kw):
        r = orig(self, *a, **kw)
        now = time.time()
        per_video.append(round(now - last[0], 2))
        last[0] = now
        return r

    _ve.VIPSegEvaluator.process_video = timed
    try:
        results = evaluate_vipseg(cfg, module, variables)
    finally:
        _ve.VIPSegEvaluator.process_video = orig
    total_s = time.time() - t_eval0
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    print(json.dumps({
        "metric": "evaluate_vipseg wall seconds "
                  f"({args.videos} videos x {args.frames}f @ "
                  f"{args.hw[0]}x{args.hw[1]})",
        "value": round(total_s, 1),
        "unit": "s",
        "per_video_s": per_video,
        "sec_per_frame": round(total_s / (args.videos * args.frames), 3),
        "fixture_gen_s": round(gen_s, 1),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "vpq": round(float(results.get("vpq", -1)), 4),
    }))
    # linearity check: the last videos must not be dramatically slower than
    # the first post-compile ones — catches O(videos^2) accumulator bugs.
    # Medians of pairs, not single videos: on the tunneled TPU a single
    # video can be 2x+ slower from transport congestion alone (observed
    # 24->62 s on one run that was flat, 24..26 s, on the re-run)
    if len(per_video) >= 5 and per_video[1] > 0:
        head = float(np.median(per_video[1:3]))
        tail = float(np.median(per_video[-2:]))
        ratio = tail / head
        assert ratio < 2.0, f"per-video time grew {ratio:.1f}x across the run"


if __name__ == "__main__":
    main()
