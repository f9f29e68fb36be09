"""Optimizer rules: per-path LR multipliers + weight-decay assignments
(reference `train_net_video.py:143-188`) and the AdamW update math."""
import numpy as np
import jax
import jax.numpy as jnp

from axial_vs_tpu.config import get_default_config
from axial_vs_tpu.engine.optim import param_rules, build_optimizer
from axial_vs_tpu.engine.lr_schedule import tf2_warmup_poly_lr, step_lr


def test_param_rules():
    cfg = get_default_config()
    rule = param_rules(cfg)
    lr, wd = rule("backbone/stem/conv/kernel")
    assert lr == cfg.solver.backbone_multiplier and wd == cfg.solver.weight_decay
    lr, wd = rule("wc_module/temporal_encoder0/layer0/height_attn/q/kernel")
    assert lr == cfg.solver.temporal_multiplier
    lr, wd = rule("wc_module/spatial_layer1/self_attn/value_proj/kernel")
    assert lr == cfg.solver.spatial_multiplier
    lr, wd = rule("transformer_decoder/class_embedding_projection/conv/kernel")
    assert lr == cfg.solver.prediction_head_multiplier
    # biases and norms: no weight decay
    _, wd = rule("pixel_decoder/stage0/block0/conv1_bn_act/conv/bias")
    assert wd == 0.0
    _, wd = rule("pixel_decoder/stage0/block0/conv1_bn_act/norm/scale")
    assert wd == 0.0
    _, wd = rule("transformer_decoder/cluster_centers")
    assert wd == 0.0
    _, wd = rule("pixel_decoder/stage0/block0/attention/height_axis/query_rpe/embeddings")
    assert wd == 0.0
    # plain conv kernels keep base wd
    _, wd = rule("pixel_decoder/stage0/block0/conv1_bn_act/conv/kernel")
    assert wd == cfg.solver.weight_decay


def test_adamw_update_matches_torch_semantics():
    """One AdamW step: p -= lr * (mhat/(sqrt(vhat)+eps) + wd*p)."""
    import torch

    cfg = get_default_config()
    cfg.solver.clip_gradients.enabled = False
    cfg.solver.base_lr = 0.1
    cfg.solver.weight_decay = 0.05
    params = {"plain": {"conv": {"kernel": jnp.asarray([[1.0, -2.0]])}}}
    tx = build_optimizer(cfg, params, lambda step: 0.1)
    state = tx.init(params)
    grads = {"plain": {"conv": {"kernel": jnp.asarray([[0.5, 0.25]])}}}
    updates, _ = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)

    tp = torch.nn.Parameter(torch.tensor([[1.0, -2.0]]))
    opt = torch.optim.AdamW([tp], lr=0.1, weight_decay=0.05, eps=1e-8)
    tp.grad = torch.tensor([[0.5, 0.25]])
    opt.step()
    np.testing.assert_allclose(
        np.asarray(new["plain"]["conv"]["kernel"]), tp.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_lr_schedules():
    sched = tf2_warmup_poly_lr(1.0, max_iters=100, warmup_iters=10,
                               warmup_factor=0.1)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(10)) - (1 - 10 / 100) ** 0.9) < 1e-6
    assert float(sched(99)) < 0.05
    s = step_lr(1.0, milestones=[50, 80], gamma=0.1, warmup_iters=5)
    assert abs(float(s(60)) - 0.1) < 1e-7
    assert abs(float(s(90)) - 0.01) < 1e-7
