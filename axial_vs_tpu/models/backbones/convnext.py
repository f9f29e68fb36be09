"""ConvNeXt / ConvNeXtV2 backbone, TPU-native NHWC.

Matches `kmax_deeplab/modeling/backbone/convnext.py` (D2ConvNeXt :153-216,
Block :15-50) and `convnextv2.py` (GRN variant): 4x4/4 patchify stem with
LayerNorm, per-stage [LN + 2x2/2 downsample], blocks of
[7x7 depthwise -> LN -> 1x1(4C) -> gelu -> (GRN | gamma) -> 1x1(C)] with
stochastic depth; per-stage output LayerNorms for res2..res5.

LayerNorm runs in fp32 (the reference pins fp32 under autocast,
`convnext.py:53-84`) — our ops.norm.LayerNorm already does this.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.act import gelu

from ...ops.init import trunc_normal
from ...ops.norm import LayerNorm
from ...layers.convbn import DropPath


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta + x).astype(x.dtype)


class ConvNeXtBlockScanBody(nn.Module):
    """Scan-compatible block: carry = x, scanned input = drop-path rate.

    Used with nn.scan to collapse a stage's blocks into ONE compiled body
    (stacked params) — ConvNeXt-L's 108 unrolled blocks otherwise blow
    compile time/payloads past what the remote-compile tunnel tolerates.
    """

    dim: int
    layer_scale_init_value: float = 1e-6
    use_grn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, dp_rate, train: bool = False):
        y = ConvNeXtBlock(
            dim=self.dim,
            drop_path_prob=0.0,  # handled below with the traced rate
            layer_scale_init_value=self.layer_scale_init_value,
            use_grn=self.use_grn,
            dtype=self.dtype,
            # train=False below only disables the inner (static) DropPath;
            # the fused Pallas path has no VJP, so gate it on the REAL
            # train flag here
            allow_fused=not train,
            name="block",
        )(x, train=False)
        delta = y - x
        if train:
            keep = 1.0 - dp_rate
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
            delta = delta * mask.astype(x.dtype) / jnp.maximum(keep, 1e-6).astype(x.dtype)
        return x + delta, None


class _ConvParams(nn.Module):
    """Param-owner twin of the ``dwconv`` nn.Conv: declares the identical
    {kernel, bias} tree so the fused Pallas path shares checkpoints with
    the XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_normal(std=0.02), (7, 7, 1, self.features),
            jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Param-owner twin of the ``norm`` LayerNorm ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Param-owner twin of an ``nn.Dense`` ({kernel, bias})."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", trunc_normal(std=0.02),
            (self.in_features, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _StemS2D(nn.Module):
    """4x4/4 patchify stem as space-to-depth + one matmul.

    Numerically equivalent to the reference's ``nn.Conv2d(in_chans,
    dims[0], kernel_size=4, stride=4)`` — torch-default VALID padding
    (`kmax_deeplab/modeling/backbone/convnext.py:106-108`): at a
    non-multiple-of-4 input the trailing rows/cols that cannot fill a
    4x4 window are DROPPED (769x1345 -> 192x336), exactly as the
    reference does at the VIPSeg eval size. Declares the identical
    {kernel, bias} param tree as nn.Conv.

    Measured ledger for this op (ConvNeXt-L 769x1345, v5e):
    1. nn.Conv on (N, H, W, 3): 2.36 ms — every op touching a <128-lane
       minor tensor pays the (8,128) tiling tax (~10-40x physical bytes).
    2. s2d via 6-D transpose (pad -> (N,Ho,4,Wo,4,3) -> transpose -> dot):
       fps-NEUTRAL — the transpose inherits the same 3-minor tiling.
    3. round-4 SAME-pad version: pad/cast on the (N, H, W*C)-flat layout,
       then k dots over (N, Ho, Wo, k*C) slices: ~1.1 ms (0.62 ms of it
       the pad/regroup copy). The SAME choice was also a semantics
       DIVERGENCE from the reference (ceil vs floor output grid, content
       shifted 1 px by the top pad) — round-5 audit.
    4. THIS version (VALID): the trailing-window crop is a row-major
       SLICE that fuses into the regroup, no pad copy at all; downstream
       stages also shrink to the reference's grid (192x336 vs 193x337,
       ~1% fewer tokens everywhere, 2x-exact ResizedFuse steps).
    5. Going further is blocked: the (…, 12)-minor dot operands still pad
       12 -> 128 lanes when materialized; a Pallas stem needs the same
       lane -> sublane regroup Mosaic refuses; ideal (pure-bandwidth)
       would be ~0.1 ms."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        k = 4
        kernel = self.param(
            "kernel", trunc_normal(std=0.02), (k, k, c, self.features),
            jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ho, wo = h // k, w // k  # VALID: partial trailing windows dropped
        dt = self.dtype or x.dtype
        # every op below runs on (N, H, W*C)-flat layouts — a (..., 3)-minor
        # tensor tiles 3 lanes into 128 (42x waste), which is where BOTH the
        # conv path's 0.95 ms convert and a naive s2d transpose go to die;
        # all reshapes here are row-major-free; the row/col crop is a slice
        # on this flat layout and the di row-slice fuses into the dot
        # operand load
        x = x.reshape(n, h, w * c).astype(dt)
        if ho * k != h or wo * k != w:
            x = x[:, : ho * k, : wo * k * c]
        x = x.reshape(n, ho, k, wo, k * c)
        kr = kernel.reshape(k, k * c, self.features).astype(dt)
        y = sum(
            jax.lax.dot_general(
                x[:, :, di], kr[di], (((3,), (0,)), ((), ())))
            for di in range(k)
        )
        return y + bias.astype(y.dtype)


def _fused_dwln_enabled():
    import os

    return os.environ.get("AXIALVS_FUSED_DWLN", "1") != "0"


def _fused_block_enabled():
    # whole-block pipelined kernel (dw VPU x MLP MXU dual-issue) — gated
    # until measured in-pipeline (tools/bench_convnext_block.py)
    import os

    return os.environ.get("AXIALVS_FUSED_BLOCK", "0") == "1"


def _fused_mlp_enabled():
    # OPT-IN (negative result, kept for the record): chained 27x at the
    # ConvNeXt-L stage-3 shape the fused kernel measured 579 us/block vs
    # XLA's 556 — the pwconv dots are compute-bound there (~72% MXU), so
    # keeping the hidden activation in VMEM saves HBM traffic that was not
    # the bottleneck. See docs/PERFORMANCE.md (round 2).
    import os

    return os.environ.get("AXIALVS_FUSED_MLP", "0") == "1"


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path_prob: float = 0.0
    layer_scale_init_value: float = 1e-6
    use_grn: bool = False  # V2
    allow_fused: bool = True  # extra gate (scan body passes not-train here)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if (self.allow_fused and not train and x.dtype == jnp.bfloat16
                and x.ndim == 4 and jax.default_backend() == "tpu"
                and _fused_dwln_enabled()):
            # inference fast path: one Pallas kernel for dwconv7x7 + fp32
            # LayerNorm (ops/convnext_pallas.py) — the activation round-trips
            # HBM once instead of three times. Training keeps the
            # differentiable XLA path below (same params).
            from ...ops.convnext_pallas import (convnext_block_fused,
                                                convnext_mlp_residual,
                                                dwconv7x7_layernorm)

            kernel, cbias = _ConvParams(self.dim, name="dwconv")()
            scale, nbias = _LNParams(self.dim, name="norm")()
            if (not self.use_grn and self.layer_scale_init_value > 0
                    and _fused_block_enabled()):
                # whole-block kernel: dw+LN (VPU) of row-tile i pipelined
                # against the MLP (MXU) of row-tile i-1 (see
                # ops/convnext_pallas.convnext_block_fused)
                w1, b1 = _DenseParams(self.dim, 4 * self.dim,
                                      name="pwconv1")()
                w2, b2 = _DenseParams(4 * self.dim, self.dim,
                                      name="pwconv2")()
                gamma = self.param(
                    "gamma",
                    nn.initializers.constant(self.layer_scale_init_value),
                    (self.dim,), jnp.float32)
                return convnext_block_fused(
                    x, kernel, cbias, scale, nbias, w1, b1, w2, b2, gamma)
            y = dwconv7x7_layernorm(x, kernel, cbias, scale, nbias)
            if (not self.use_grn and self.layer_scale_init_value > 0
                    and _fused_mlp_enabled()):
                # fused block tail: the (.., 4C) hidden activation stays in
                # VMEM instead of round-tripping HBM twice (GRN blocks this
                # path: its global spatial reduction spans row tiles)
                w1, b1 = _DenseParams(self.dim, 4 * self.dim,
                                      name="pwconv1")()
                w2, b2 = _DenseParams(4 * self.dim, self.dim,
                                      name="pwconv2")()
                gamma = self.param(
                    "gamma",
                    nn.initializers.constant(self.layer_scale_init_value),
                    (self.dim,), jnp.float32)
                return convnext_mlp_residual(y, shortcut, w1, b1, w2, b2,
                                             gamma)
        else:
            y = nn.Conv(
                self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                feature_group_count=self.dim,
                kernel_init=trunc_normal(std=0.02),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="dwconv",
            )(x)
            y = LayerNorm(features=self.dim, epsilon=1e-6, name="norm")(y)
        y = nn.Dense(
            4 * self.dim, kernel_init=trunc_normal(std=0.02),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="pwconv1",
        )(y)
        y = gelu(y)
        if self.use_grn:
            y = GRN(4 * self.dim, name="grn")(y)
        y = nn.Dense(
            self.dim, kernel_init=trunc_normal(std=0.02),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="pwconv2",
        )(y)
        if not self.use_grn and self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
                jnp.float32,
            )
            y = y * gamma.astype(y.dtype)
        y = DropPath(self.drop_path_prob, name="drop_path")(y, deterministic=not train)
        return shortcut + y


class ConvNeXt(nn.Module):
    """Returns dict res2..res5 (strides 4/8/16/32). ``use_grn`` -> ConvNeXtV2."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    use_grn: bool = False
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    remat: bool = False  # jax.checkpoint each block (train-memory vs FLOPs)
    use_scan: bool = False  # nn.scan blocks per stage (fast compile for -L)
    #: lax.scan unroll factor under use_scan: the stage-2 while loop's
    #: per-iteration machinery profiled ~5.6 ms/clip at ConvNeXt-L 769x1345
    #: (27 iterations; "while.32" in the round-4 trace) — unrolling a few
    #: blocks per iteration amortizes it while keeping the compile payload
    #: ~depth/unroll times smaller than a full unroll
    scan_unroll: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, stage_range=None):
        """stage_range=(lo, hi) runs only stages lo..hi-1 on an already
        stage-lo input and additionally returns the carry — lets callers
        compile each stage as its own unit (bench.py --split-jit-fine, for
        compile channels that reject a monolithic ConvNeXt-L program)."""
        block_cls = (
            nn.remat(ConvNeXtBlock, static_argnums=(2,))
            if self.remat
            else ConvNeXtBlock
        )
        dp_rates = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        out = {}
        lo, hi = stage_range if stage_range is not None else (0, 4)
        cur = int(sum(self.depths[:lo]))
        for i in range(lo, hi):
            if i == 0:
                x = _StemS2D(
                    self.dims[0], dtype=self.dtype, name="downsample0_conv",
                )(x)
                x = LayerNorm(features=self.dims[0], epsilon=1e-6, name="downsample0_norm")(x)
            else:
                x = LayerNorm(
                    features=self.dims[i - 1], epsilon=1e-6, name=f"downsample{i}_norm"
                )(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2),
                    kernel_init=trunc_normal(std=0.02),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f"downsample{i}_conv",
                )(x)
            if self.use_scan:
                body = ConvNeXtBlockScanBody if not self.remat else nn.remat(
                    ConvNeXtBlockScanBody, static_argnums=(3,)
                )
                unroll = max(1, min(self.scan_unroll, self.depths[i]))
                while self.depths[i] % unroll:
                    unroll -= 1  # lax.scan unroll must divide the length
                scanned = nn.scan(
                    body,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(0, nn.broadcast),
                    length=self.depths[i],
                    unroll=unroll,
                )(
                    dim=self.dims[i],
                    layer_scale_init_value=self.layer_scale_init_value,
                    use_grn=self.use_grn,
                    dtype=self.dtype,
                    name=f"stage{i}_blocks",
                )
                rates = jnp.asarray(
                    dp_rates[cur : cur + self.depths[i]], jnp.float32
                )
                x, _ = scanned(x, rates, train)
            else:
                for j in range(self.depths[i]):
                    x = block_cls(
                        dim=self.dims[i],
                        drop_path_prob=float(dp_rates[cur + j]),
                        layer_scale_init_value=self.layer_scale_init_value,
                        use_grn=self.use_grn,
                        dtype=self.dtype,
                        name=f"stage{i}_block{j}",
                    )(x, train)
            cur += self.depths[i]
            stage_name = f"res{i + 2}"
            if stage_name in self.out_features:
                out[stage_name] = LayerNorm(
                    features=self.dims[i], epsilon=1e-6, name=f"out_norm{i}"
                )(x)
        if stage_range is not None:
            return out, x
        return out
