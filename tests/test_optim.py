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


def test_convnext_layer_decay_matches_reference():
    """Layer-id mapping + scales vs the reference constructor's functions
    (`mmdet/core/optimizers/layer_decay_optimizer_constructor.py`)."""
    import importlib.util, sys, types

    reg = type(
        "R", (), {"register_module": staticmethod(lambda *a, **k: (lambda c: c))})()
    for name in ("mmcv", "mmcv.runner", "mmdet", "mmdet.utils",
                 "ref_opt_pkg", "ref_opt_pkg.builder"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            sys.modules[name] = mod
    sys.modules["mmcv.runner"].get_dist_info = lambda: (0, 1)
    sys.modules["mmcv.runner"].DefaultOptimizerConstructor = object
    sys.modules["mmdet.utils"].get_root_logger = lambda *a, **k: None
    sys.modules["ref_opt_pkg.builder"].OPTIMIZER_BUILDERS = reg
    spec = importlib.util.spec_from_file_location(
        "ref_opt_pkg.layer_decay_optimizer_constructor",
        "/root/reference/MaXTron_Tube-Link/mmdet/core/optimizers/"
        "layer_decay_optimizer_constructor.py")
    ref = importlib.util.module_from_spec(spec)
    ref.__package__ = "ref_opt_pkg"
    sys.modules[spec.name] = ref
    spec.loader.exec_module(ref)

    from axial_vs_tpu.engine.optim import convnext_layer_id, convnext_stage_id

    cases = [
        ("backbone.downsample_layers.0.0.weight", "backbone/downsample0_conv/kernel"),
        ("backbone.downsample_layers.1.1.weight", "backbone/downsample1_conv/kernel"),
        ("backbone.downsample_layers.2.1.weight", "backbone/downsample2_conv/kernel"),
        ("backbone.downsample_layers.3.1.weight", "backbone/downsample3_conv/kernel"),
        ("backbone.stages.0.1.gamma", "backbone/stage0_block1/gamma"),
        ("backbone.stages.1.2.dwconv.weight", "backbone/stage1_block2/dwconv/kernel"),
        ("backbone.stages.2.0.gamma", "backbone/stage2_block0/gamma"),
        ("backbone.stages.2.8.gamma", "backbone/stage2_block8/gamma"),
        ("backbone.stages.2.26.gamma", "backbone/stage2_block26/gamma"),
        ("backbone.stages.3.1.gamma", "backbone/stage3_block1/gamma"),
        ("sem_seg_head.predictor.w", "transformer_decoder/predictor/kernel"),
    ]
    for torch_name, flax_path in cases:
        want = ref.get_layer_id_for_convnext(torch_name, 12)
        got = convnext_layer_id(flax_path, 12)
        assert got == want, (flax_path, got, want)
        want_s = ref.get_stage_id_for_convnext(torch_name, 14)
        got_s = convnext_stage_id(flax_path, 14)
        assert got_s == want_s, (flax_path, got_s, want_s)
