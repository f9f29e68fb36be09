"""Activation helpers.

GELU precision policy: the reference uses torch ``F.gelu`` (exact erf,
e.g. `kmax_deeplab/modeling/pixel_decoder/kmax_pixel_decoder.py` and
`backbone/convnext.py:31`). On TPU v5e the exact-erf chain costs ~20 ms
per ConvNeXt-L clip (measured: stage2 alone 37.7 -> 26.1 ms with the tanh
form, `tools/bench_convnext_ops.py`) because erf does not stay fused in
bf16. The tanh approximation differs from exact erf by at most ~1e-3
absolute — below one bf16 ulp at the magnitudes involved — so for bf16
compute we default to tanh; fp32 compute keeps the exact erf (bit-parity
with the torch oracles in tests/).

Set ``AXIALVS_GELU_EXACT=1`` to force the exact erf everywhere.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def gelu(x, approximate: bool | None = None):
    """GELU with dtype-aware precision (see module docstring)."""
    if approximate is None:
        approximate = (
            x.dtype == jnp.bfloat16
            and os.environ.get("AXIALVS_GELU_EXACT") != "1"
        )
    return jax.nn.gelu(x, approximate=approximate)
