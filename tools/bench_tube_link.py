"""Benchmark: Tube-Link VIS tube inference throughput on one chip.

BASELINE config 4 ("MaXTron w/ Tube-Link ResNet-50 VIS on YouTube-VIS-2019"):
measures steady-state frames/sec of the jitted per-tube forward (backbone +
fused MSDA/axial-trajectory pixel decoder + Mask2Former tube head) at the
reference YTVIS eval resolution 360x640, 5-frame tubes, bf16.

Device-side fori_loop meter (see docs/PERFORMANCE.md "Measurement
methodology"). Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    argv = sys.argv
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 10
    clip_len = int(argv[argv.index("--clip") + 1]) if "--clip" in argv else 5
    size = (360, 640)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from axial_vs_tpu.config import get_default_config
    from axial_vs_tpu.models.build import build_model_and_criterion

    cfg = get_default_config()
    cfg.model.meta_architecture = "TubeLinkVIS"
    cfg.model.backbone.name = "resnet50"
    cfg.model.num_classes = 40  # YTVIS-19
    cfg.model.dtype = "bfloat16"
    cfg.model.tube_link.clip_len = clip_len
    cfg.input.num_clip_frames = clip_len
    model, _ = build_model_and_criterion(cfg, train=False)

    images = jnp.asarray(
        np.random.RandomState(0).randn(clip_len, *size, 3).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, train=False))
    host = np.random.RandomState(0)

    def fill(s):
        fan_in = s.shape[-2] if len(s.shape) >= 2 else 1
        scale = min(0.5, 1.0 / np.sqrt(max(fan_in, 1)))
        return jnp.asarray(
            host.uniform(0.2, 1.0, s.shape).astype(np.float32) * scale,
            dtype=s.dtype)

    variables = jax.tree.map(fill, shapes)

    @jax.jit
    def bench_loop(vs, images, n):
        def body(i, carry):
            out = model.apply(vs, images + carry * 1e-12, train=False)
            return sum(jnp.mean(o, dtype=jnp.float32)
                       for o in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(bench_loop(variables, images, 1))
    if "--profile" in argv:
        jax.profiler.start_trace(".profile")
        float(bench_loop(variables, images, 3))
        jax.profiler.stop_trace()
        print("trace written to .profile/ (tools/analyze_profile.py)")
    t0 = time.perf_counter()
    float(bench_loop(variables, images, iters))
    dt = time.perf_counter() - t0
    fps = clip_len * iters / dt
    result = {
        "metric": "YTVIS tube inference frames/sec/chip "
                  f"(TubeLinkVIS r50, {size[0]}x{size[1]}, T={clip_len}, bf16)",
        "value": round(fps, 3),
        "unit": "frames/sec",
    }
    # measured CPU anchor (tools/bench_reference_torch.py --tube-link), same
    # upper/central methodology as bench.py (docs/PERFORMANCE.md)
    anchor_path = os.path.join(
        os.path.dirname(__file__), "..", "reference_anchor.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchors = json.load(f)
        a = anchors.get("tube_link_resnet50")
        if (a and clip_len == a["clip_frames"]
                and a.get("image_size") == list(size)):
            upper = a["reference_gpu_fps_estimate"]
            central = upper * 0.35  # eager-efficiency retention, see docs
            result["vs_baseline"] = round(fps / central, 3)
            result["anchor_method"] = "measured_cpu_x_matmul_ratio"
            result["anchor_cpu_fps"] = round(a["cpu_fps"], 4)
            result["anchor_gpu_fps_upper_bound"] = round(upper, 2)
            result["anchor_gpu_fps_central"] = round(central, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
