"""RAFT optical flow, TPU-native (NHWC).

Rebuilds the reference's vendored RAFT core used by the VSPW
temporal-consistency analysis (`MaXTron_Tube-Link/scripts/test_vspw/
RAFT_core/{raft.py,extractor.py,corr.py,update.py,utils/utils.py}`):
BasicEncoder feature/context networks, all-pairs correlation pyramid,
SepConvGRU update block, and convex-combination 8x flow upsampling.

TPU design notes:
- the all-pairs correlation is one big batched matmul (MXU) and the
  pyramid lookup is a flat row gather per bilinear corner — no
  `grid_sample` emulation of the (B*H*W)-batched tiny images;
- the 12-step refinement unrolls with the update block as ONE shared
  flax submodule (same weights every step, like the reference loop);
- InstanceNorm (fnet) uses per-sample spatial statistics (torch
  InstanceNorm2d affine=False), BatchNorm (cnet) uses running stats.
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm import BatchNorm


def _instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Norm(nn.Module):
    """'instance' (no affine) or 'batch' (torch defaults) norm."""

    features: int
    kind: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "instance":
            return _instance_norm(x)
        if self.kind == "batch":
            return BatchNorm(features=self.features, epsilon=1e-5,
                             momentum=0.1, name="bn")(x, train=train)
        if self.kind == "none":
            return x
        raise ValueError(self.kind)


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_Norm(self.planes, self.norm, name="norm1")(y, train=train))
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_Norm(self.planes, self.norm, name="norm2")(y, train=train))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.planes, self.norm, name="norm3")(x, train=train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """`extractor.py:118-193`: 7x7/2 stem + 3 stages of 2 residual blocks
    (64, 96/2, 128/2) + 1x1 output conv — overall stride 8."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_Norm(64, self.norm, name="norm1")(x, train=train))
        for i, (dim, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            for j in range(2):
                x = ResidualBlock(
                    planes=dim, norm=self.norm, stride=stride if j == 0 else 1,
                    dtype=self.dtype, name=f"layer{i + 1}_{j}",
                )(x, train=train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


def corr_pyramid(fmap1, fmap2, num_levels: int = 4):
    """All-pairs correlation pyramid (`corr.py:12-27`).

    fmap1/fmap2: (B, H, W, C) -> list of (B, H*W, h_l, w_l), fp32.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bqc,bkc->bqk", f1, f2) / np.sqrt(c)
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        h2, w2 = corr.shape[2:]
        # torch avg_pool2d(2,2) floors odd sizes: drop the last row/col
        corr = corr[:, :, : h2 // 2 * 2, : w2 // 2 * 2]
        corr = corr.reshape(b, h * w, h2 // 2, 2, w2 // 2, 2).mean(axis=(3, 5))
        pyramid.append(corr)
    return pyramid


def corr_lookup(pyramid, coords, radius: int = 4):
    """Index the pyramid at coords±radius (`corr.py:29-50`).

    coords: (B, H, W, 2) pixel (x, y) at stride-8 resolution.
    Returns (B, H, W, num_levels*(2r+1)^2).
    """
    b, h, w, _ = coords.shape
    r = radius
    n = 2 * r + 1
    # the reference's delta grid (`corr.py:37-39`) stacks meshgrid(dy, dx)
    # onto (x, y) centroids, i.e. the x-offset varies along the FIRST axis
    # of the (2r+1)^2 window — replicated via indexing="ij"
    dx, dy = np.meshgrid(np.arange(-r, r + 1, dtype=np.float32),
                         np.arange(-r, r + 1, dtype=np.float32), indexing="ij")
    out = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[2], corr.shape[3]
        flat = corr.reshape(b * h * w * h2 * w2)
        cx = coords[..., 0].reshape(b, h * w, 1) / (2 ** i) + dx.reshape(-1)
        cy = coords[..., 1].reshape(b, h * w, 1) / (2 ** i) + dy.reshape(-1)
        # bilinear, zeros padding, pixel coords (bilinear_sampler semantics)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        tx = cx - x0
        ty = cy - y0
        base = (jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w)
                + jnp.arange(h * w, dtype=jnp.int32)[None, :]) * (h2 * w2)
        acc = 0.0
        for ddy, wy in ((0, 1.0 - ty), (1, ty)):
            for ddx, wx in ((0, 1.0 - tx), (1, tx)):
                xc = x0 + ddx
                yc = y0 + ddy
                valid = (xc >= 0) & (xc <= w2 - 1) & (yc >= 0) & (yc <= h2 - 1)
                xi = jnp.clip(xc, 0, w2 - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, h2 - 1).astype(jnp.int32)
                idx = base[:, :, None] + yi * w2 + xi
                g = flat[idx.reshape(-1)].reshape(b, h * w, n * n)
                acc = acc + g * (wx * wy * valid)
        out.append(acc.reshape(b, h, w, n * n))
    return jnp.concatenate(out, axis=-1)


class BasicMotionEncoder(nn.Module):
    """`update.py:79-97`."""

    corr_planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=((1, 1),) * 2,
                            dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3),) * 2,
                            dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1),) * 2,
                            dtype=self.dtype, name="convf2")(f))
        out = nn.relu(nn.Conv(126, (3, 3), padding=((1, 1),) * 2,
                              dtype=self.dtype, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class SepConvGRU(nn.Module):
    """`update.py:33-60`: horizontal (1x5) then vertical (5x1) GRU."""

    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, h, x):
        for tag, ksize, pad in (("1", (1, 5), ((0, 0), (2, 2))),
                                ("2", (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                       dtype=self.dtype, name=f"convz{tag}")(hx))
            r = jax.nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                       dtype=self.dtype, name=f"convr{tag}")(hx))
            q = jnp.tanh(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                 dtype=self.dtype, name=f"convq{tag}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    """`update.py:114-135`."""

    corr_planes: int
    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(corr_planes=self.corr_planes,
                                    dtype=self.dtype, name="encoder")(flow, corr)
        net = SepConvGRU(hidden_dim=self.hidden_dim, dtype=self.dtype,
                         name="gru")(net, jnp.concatenate([inp, motion], -1))
        f = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1),) * 2,
                            dtype=self.dtype, name="flow_conv1")(net))
        delta = nn.Conv(2, (3, 3), padding=((1, 1),) * 2, dtype=self.dtype,
                        name="flow_conv2")(f)
        m = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1),) * 2,
                            dtype=self.dtype, name="mask_conv1")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                              name="mask_conv2")(m)
        return net, mask, delta


def upsample_flow_convex(flow, mask):
    """Convex-combination 8x upsampling (`raft.py:61-72`).

    flow: (B, H, W, 2) at stride 8; mask: (B, H, W, 576).
    Returns (B, 8H, 8W, 2).
    """
    b, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, 8, 8).astype(jnp.float32),
                       axis=3)
    fp = jnp.pad(8.0 * flow.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [fp[:, i:i + h, j:j + w] for i in range(3) for j in range(3)], axis=3
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, patches)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """RAFT (`raft.py:26-127`): fnet/cnet + iterative GRU refinement.

    Input: two (B, H, W, 3) uint8-range RGB images (H, W divisible by 8).
    Returns the final full-resolution flow (B, H, W, 2) in pixels (x, y).
    """

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, image1, image2, flow_init=None, train: bool = False):
        b, h, w, _ = image1.shape
        img1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
        img2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0

        fnet = BasicEncoder(output_dim=256, norm="instance",
                            dtype=self.dtype, name="fnet")
        both = fnet(jnp.concatenate([img1, img2], axis=0), train=train)
        fmap1, fmap2 = both[:b], both[b:]
        pyramid = corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = BasicEncoder(output_dim=self.hidden_dim + self.context_dim,
                            norm="batch", dtype=self.dtype, name="cnet")(
            img1, train=train)
        net = jnp.tanh(cnet[..., :self.hidden_dim]).astype(jnp.float32)
        inp = nn.relu(cnet[..., self.hidden_dim:]).astype(jnp.float32)

        h8, w8 = h // 8, w // 8
        gx, gy = np.meshgrid(np.arange(w8, dtype=np.float32),
                             np.arange(h8, dtype=np.float32), indexing="xy")
        coords0 = jnp.broadcast_to(
            jnp.asarray(np.stack([gx, gy], axis=-1))[None], (b, h8, w8, 2))
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        update = BasicUpdateBlock(
            corr_planes=self.corr_levels * (2 * self.corr_radius + 1) ** 2,
            hidden_dim=self.hidden_dim, dtype=self.dtype, name="update_block")

        # unrolled refinement, weights shared across iterations (the update
        # block is one flax submodule called `iters` times)
        n_iters = 1 if self.is_initializing() else self.iters
        mask = None
        for _ in range(n_iters):
            corr = corr_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update(net, inp, corr.astype(net.dtype), flow)
            coords1 = coords1 + delta.astype(jnp.float32)
        return upsample_flow_convex(coords1 - coords0, mask)
