"""Optimizer with the reference's per-parameter LR multipliers and
weight-decay rules (`train_net_video.py:117-226`), expressed as path-based
rules over the flax param tree + a custom AdamW chain.

torch AdamW semantics: p -= lr_leaf * (m_hat / (sqrt(v_hat) + eps) + wd_leaf * p)
with lr_leaf = schedule(step) * lr_mult(path), wd_leaf from the rules.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def param_rules(cfg):
    """Returns path -> (lr_mult, weight_decay). Paths are '/'-joined flax
    param paths (lowercase)."""
    sol = cfg.solver
    base_wd = sol.weight_decay
    wd_embed = sol.weight_decay_embed
    wd_norm = 0.0

    ld = sol.get("layer_decay", None)

    def rule(path: str):
        p = path.lower()
        lr_mult = 1.0
        wd = base_wd
        if "backbone" in p:
            lr_mult *= sol.backbone_multiplier
        if ld is not None and ld.enabled:
            lr_mult *= layer_decay_scale(
                p, ld.decay_rate, ld.num_layers, ld.decay_type)
        if "spatial_layer" in p or "level_embed_2d" in p:
            lr_mult *= sol.spatial_multiplier
        if "temporal_encoder" in p or "level_embed_3d" in p or "temporal_layers" in p:
            lr_mult *= sol.temporal_multiplier
        if any(
            k in p
            for k in (
                "class_embedding_projection",
                "mask_embedding_projection",
                "transformer_mask_head",
                "transformer_class_head",
                "pixel_space_mask_batch_norm",
            )
        ):
            lr_mult *= sol.prediction_head_multiplier
        # weight decay rules
        parts = p.split("/")
        leaf = parts[-1]
        if "relative_position_bias_table" in p or "absolute_pos_embed" in p:
            wd = 0.0
        if len(parts) >= 2 and "norm" in parts[-2]:
            # params owned by a norm module (BatchNorm/LayerNorm/GroupNorm)
            wd = wd_norm
        if "_rpe" in p or "cluster_centers" in p or "level_embed" in p:
            wd = 0.0
        if leaf == "bias":
            wd = 0.0
        if leaf == "gamma":  # convnext layer scale
            wd = 0.0
        if leaf == "embeddings":  # RPE tables
            wd = 0.0
        return lr_mult, wd

    return rule


def _tree_from_rule(params, rule, idx):
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {k: jnp.asarray(rule(k)[idx], jnp.float32) for k in flat}
    return traverse_util.unflatten_dict(out, sep="/")


def build_optimizer(cfg, params, lr_schedule: Callable):
    rule = param_rules(cfg)
    lr_mults = _tree_from_rule(params, rule, 0)
    wds = _tree_from_rule(params, rule, 1)

    chain = []
    if cfg.solver.clip_gradients.enabled:
        chain.append(optax.clip_by_global_norm(cfg.solver.clip_gradients.clip_value))
    if cfg.solver.optimizer.lower() == "adamw":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif cfg.solver.optimizer.lower() == "sgd":
        chain.append(optax.trace(decay=0.9))
    else:
        raise ValueError(cfg.solver.optimizer)

    def add_wd(updates, state, p):
        return (
            jax.tree.map(lambda u, w, pp: u + w * pp, updates, wds, p),
            state,
        )

    chain.append(optax.GradientTransformation(lambda p: optax.EmptyState(), add_wd))

    def scale_fn(step):
        return lr_schedule(step)

    def scale_update(updates, state, params=None):
        lr = scale_fn(state.count)
        upd = jax.tree.map(lambda u, m: -lr * m * u, updates, lr_mults)
        return upd, optax.ScaleByScheduleState(count=state.count + 1)

    chain.append(
        optax.GradientTransformation(
            lambda p: optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32)),
            scale_update,
        )
    )
    return optax.chain(*chain)


def convnext_layer_id(path: str, num_layers: int) -> int:
    """Layer id for ConvNeXt layer-wise LR decay, matching the reference's
    `mmdet/core/optimizers/layer_decay_optimizer_constructor.py:10-50`
    (get_layer_id_for_convnext) against this framework's param naming
    (backbone/downsample{i}_*, backbone/stage{i}_block{j}/...).

    ``num_layers`` is the paramwise num_layers (12 for depths (3,3,27,3));
    ids run 0..num_layers+1 and scale = decay_rate^(num_layers+2-id-1).
    """
    p = path.lower()
    if "backbone/" not in p:
        return num_layers + 1
    tail = p.split("backbone/")[1]
    if tail.startswith("downsample"):
        stage = int(tail[len("downsample")])
        return {0: 0, 1: 2, 2: 3, 3: num_layers}[stage]
    if tail.startswith("stage"):
        stage = int(tail[len("stage")])
        if stage == 0:
            return 1
        if stage == 1:
            return 2
        if stage == 2:
            block = int(tail.split("_block")[1].split("/")[0])
            return 3 + block // 3
        return num_layers
    return num_layers + 1


def convnext_stage_id(path: str, num_layers: int) -> int:
    """Stage id for 'stage_wise' decay (`...:53-77`)."""
    p = path.lower()
    if "backbone/" not in p:
        return num_layers - 1
    tail = p.split("backbone/")[1]
    if tail.startswith("downsample"):
        return 0
    if tail.startswith("stage"):
        return int(tail[len("stage")]) + 1
    return num_layers - 1


def layer_decay_scale(path: str, decay_rate: float, num_layers: int,
                      decay_type: str = "layer_wise") -> float:
    """LR scale decay_rate^(N - layer_id - 1) with N = num_layers + 2
    (`layer_decay_optimizer_constructor.py:98,131`)."""
    n = num_layers + 2
    if decay_type == "stage_wise":
        layer_id = convnext_stage_id(path, n)
    else:
        layer_id = convnext_layer_id(path, num_layers)
    return decay_rate ** (n - layer_id - 1)
