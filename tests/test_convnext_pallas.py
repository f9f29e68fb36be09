"""Fused dwconv7x7+LayerNorm Pallas kernel (ops/convnext_pallas.py).

The kernel itself only lowers on TPU (interpret mode needs minutes even at
toy shapes), so numerical parity runs as a TPU-gated test — it was also
verified on v5e at all four ConvNeXt-L stage shapes (max|diff| ~2 bf16 ulp
vs the f32 XLA conv+LN, whole-backbone checksum 1.192003 vs 1.192011).
What MUST hold everywhere is checkpoint compatibility: the fused branch
declares its params through param-owner twins (_ConvParams/_LNParams), and
these have to produce the exact same tree as the nn.Conv/LayerNorm branch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axial_vs_tpu.models.backbones import convnext as cnx


def _tree_shapes(tree):
    return jax.tree.map(lambda s: (tuple(s.shape), s.dtype), tree)


def test_fused_param_tree_matches_xla_branch(monkeypatch):
    """init through the fused branch and through the XLA branch must create
    identical param trees (names, shapes, dtypes) — otherwise converted
    torch checkpoints would not load into the inference path."""
    monkeypatch.setattr(cnx, "_fused_dwln_enabled", lambda: True)
    block = cnx.ConvNeXtBlock(dim=128, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 128), jnp.bfloat16)

    xla_tree = jax.eval_shape(
        lambda: block.init(jax.random.PRNGKey(0), x, train=True))

    # force the fused branch regardless of host backend: eval_shape never
    # executes the kernel, only shape-evaluates it
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    fused_tree = jax.eval_shape(
        lambda: block.init(jax.random.PRNGKey(0), x, train=False))

    assert _tree_shapes(xla_tree) == _tree_shapes(fused_tree)


def test_scan_body_disables_fused_in_training(monkeypatch):
    """ConvNeXtBlockScanBody calls the inner block with train=False (its
    DropPath is applied outside with the traced rate) — the fused
    non-differentiable kernel must still be OFF when the OUTER train flag
    is on, or backward would hit a missing Pallas VJP."""
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(cnx, "_fused_dwln_enabled", lambda: True)
    seen = {}

    real = cnx.ConvNeXtBlock
    orig_call = real.__call__

    def spy_call(self, x, train=False):
        seen.setdefault("allow_fused", []).append(self.allow_fused)
        return orig_call(self, x, train)

    monkeypatch.setattr(real, "__call__", spy_call)
    body = cnx.ConvNeXtBlockScanBody(dim=128, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 128), jnp.bfloat16)
    jax.eval_shape(lambda: body.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, jnp.float32(0.0), True))
    assert seen["allow_fused"] == [False]
    seen.clear()
    jax.eval_shape(lambda: body.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, jnp.float32(0.0), False))
    assert seen["allow_fused"] == [True]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel lowers on TPU only")
def test_convnext_mlp_residual_parity_tpu():
    """Fused pwconv1->gelu->pwconv2->gamma->residual kernel vs the XLA
    chain, incl. a non-dividing row tail and hidden-axis chunking."""
    from axial_vs_tpu.ops.act import gelu
    from axial_vs_tpu.ops.convnext_pallas import convnext_mlp_residual

    rng = np.random.RandomState(0)
    for (p, c, rows, hc) in [(700, 192, 256, 512), (1030, 768, 512, 1024)]:
        x = jnp.asarray(rng.randn(p, c), jnp.bfloat16)
        sc = jnp.asarray(rng.randn(p, c), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(c, 4 * c) / np.sqrt(c), jnp.float32)
        b1 = jnp.asarray(0.1 * rng.randn(4 * c), jnp.float32)
        w2 = jnp.asarray(rng.randn(4 * c, c) / np.sqrt(4 * c), jnp.float32)
        b2 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        g = jnp.asarray(1e-2 * rng.randn(c), jnp.float32)
        out = np.asarray(convnext_mlp_residual(
            x, sc, w1, b1, w2, b2, g, rows=rows, hidden_chunk=hc),
            np.float32)

        h = gelu(x @ w1.astype(jnp.bfloat16) + b1.astype(jnp.bfloat16))
        y = h @ w2.astype(jnp.bfloat16) + b2.astype(jnp.bfloat16)
        ref = np.asarray(sc + (g.astype(jnp.bfloat16) * y), np.float32)
        # bf16 operands, f32 kernel accumulation vs bf16 XLA chain
        assert np.abs(out - ref).max() < 0.08


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel lowers on TPU only")
def test_dwconv_ln_parity_tpu():
    from axial_vs_tpu.ops.convnext_pallas import dwconv7x7_layernorm

    rng = np.random.RandomState(0)
    for (n, h, w, c, th) in [(2, 13, 17, 192, 8), (1, 16, 9, 128, 8),
                             (2, 29, 21, 384, 16)]:
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        k = jnp.asarray(rng.randn(7, 7, 1, c) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        ls = jnp.asarray(1 + 0.1 * rng.randn(c), jnp.float32)
        lb = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        out = np.asarray(
            dwconv7x7_layernorm(x, k, b, ls, lb, tile_h=th), np.float32)

        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k, window_strides=(1, 1),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c) + b
        m = y.mean(-1, keepdims=True)
        v = ((y - m) ** 2).mean(-1, keepdims=True)
        ref = np.asarray((y - m) * jax.lax.rsqrt(v + 1e-6) * ls + lb,
                         np.float32)
        assert np.abs(out - ref).max() < 0.05
