"""Microbenchmark: chained pixel-decoder axial blocks (one v5e chip).

Times N chained `SingleBlock`s at a chosen stage geometry under the eval
fast path, comparing similarity/retrieve formulations
(AXIALVS_AXIAL_SIM is read at import time by layers/axial_attention.py,
so each mode runs in its own process):

  for m in dot vpu; do AXIALVS_AXIAL_SIM=$m python tools/bench_axial.py; done

Default geometry = ConvNeXt-L north-star stage1 (OS16 at 769x1345):
(2, 49, 85, 256) with 5 axial blocks, base_filter 256.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from axial_vs_tpu.models.pixel_decoder import BlockGroup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--shape", type=int, nargs=3, default=[2, 49, 85])
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--base-filter", type=int, default=256)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    n, h, w = args.shape
    module = BlockGroup(
        base_filter=args.base_filter, num_blocks=args.blocks,
        block_type="axial", query_shape=(h, w), dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).randn(n, h, w, args.channels), jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def loop(vs, x, niter):
        def body(i, carry):
            # cast: a f32 carry would promote bf16 x to f32 (wrong bench)
            out = module.apply(
                vs, x + (carry * 1e-12).astype(x.dtype), train=False)
            return jnp.mean(out, dtype=jnp.float32)

        return jax.lax.fori_loop(0, niter, body, jnp.float32(0))

    float(loop(variables, x, 1))
    if "--profile" in sys.argv:
        import shutil
        shutil.rmtree(".profile_axial", ignore_errors=True)
        jax.profiler.start_trace(".profile_axial")
        out = module.apply(variables, x, train=False)
        jax.block_until_ready(out)
        float(loop(variables, x, 3))
        jax.profiler.stop_trace()
    t0 = time.perf_counter()
    float(loop(variables, x, args.iters))
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    mode = os.environ.get("AXIALVS_AXIAL_SIM", "auto")
    print(f"sim={mode}: {args.blocks} axial blocks @ ({n},{h},{w},"
          f"{args.channels}) base={args.base_filter}: {dt:.2f} ms/chain "
          f"({dt/args.blocks:.2f} ms/block)")


if __name__ == "__main__":
    main()
