"""Whole-dataset evaluation loops (the reference's Trainer.test /
video_inference.test_video equivalents)."""
from __future__ import annotations

import numpy as np
from PIL import Image

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.panoptic_utils import rgb2id
from ..evaluation.stq import STQuality
from ..evaluation.vipseg_evaluator import VIPSegEvaluator
from ..models.video_inference import WCInferencePipeline


def evaluate_vipseg(cfg, module, variables, max_videos: int | None = None,
                    compute_stq: bool = False, pipeline_cls=None):
    """Runs video-wise inference over the val split and computes VPQ
    (mean over windows {1,2,4,6}) against GT panomasks.

    ``pipeline_cls`` selects the inference pipeline (default
    ``WCInferencePipeline``; pass ``CCInferencePipeline`` to evaluate a
    ``MaXTronCCModel`` through the same evaluator loop)."""
    name = cfg.datasets.test[0]
    videos = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    num_classes = len(meta.contiguous_to_dataset_id)

    thing_mask = np.zeros((num_classes,), bool)
    for _, ci in meta.thing_dataset_id_to_contiguous_id.items():
        thing_mask[ci] = True

    pipeline = (pipeline_cls or WCInferencePipeline)(
        module, variables,
        num_clip_frames=cfg.input.num_clip_frames,
        input_size=cfg.input.image_size,
        pixel_mean=cfg.input.pixel_mean,
        pixel_std=cfg.input.pixel_std,
        thing_class_mask=thing_mask,
        contiguous_to_dataset_id=np.asarray(meta.contiguous_to_dataset_id),
        label_divisor=meta.label_divisor,
        pixel_confidence_threshold=cfg.model.maxtron.test.pixel_confidence_threshold,
        class_threshold_thing=cfg.model.maxtron.test.class_threshold_thing,
        class_threshold_stuff=cfg.model.maxtron.test.class_threshold_stuff,
        overlap_threshold=cfg.model.maxtron.test.overlap_threshold,
        reorder_class_weight=cfg.model.maxtron.test.reorder_class_weight,
        reorder_mask_weight=cfg.model.maxtron.test.reorder_mask_weight,
    )
    evaluator = VIPSegEvaluator(
        categories={
            i: {"isthing": int(thing_mask[i])} for i in range(num_classes)
        },
        label_divisor=meta.label_divisor,
        cost_limit=cfg.model.maxtron.test.cost_limit,
        mem_weight=cfg.model.maxtron.test.mem_weight,
        output_dir=cfg.output_dir,
    )
    stq = STQuality(
        num_classes,
        [ci for ci in range(num_classes) if thing_mask[ci]],
        ignore_label=255,
    ) if compute_stq else None

    ds_to_cont = {ds: i for i, ds in enumerate(meta.contiguous_to_dataset_id)}

    for vi, video in enumerate(videos[: max_videos or len(videos)]):
        frames = np.stack(
            [np.asarray(Image.open(f["file_name"]).convert("RGB"))
             for f in video["frames"]]
        )
        pred_ids, result, embds = pipeline.run_video(frames)

        # prediction segments keyed by the dataset-encoded ids produced by
        # remap_panoptic_to_dataset_ids; categories mapped back to contiguous
        pred_segments = {}
        for sid in np.unique(pred_ids):
            if sid < 0:
                continue
            cat_ds = sid // meta.label_divisor if sid >= meta.label_divisor else sid
            cat = ds_to_cont.get(int(cat_ds), int(cat_ds))
            pred_segments[int(sid)] = {"category_id": int(cat)}

        # GT id maps from panomask PNGs: encode as cat_cont*divisor+inst for
        # things (instance id = raw segment id), cat_cont for stuff
        gt_frames = []
        gt_segments = {}
        for f in video["frames"]:
            pan = rgb2id(np.asarray(Image.open(f["pan_seg_file_name"]).convert("RGB")))
            out = np.full(pan.shape, -1, np.int64)
            for seg in f["segments_info"]:
                cat = ds_to_cont.get(seg["category_id"], None)
                if cat is None:
                    continue
                m = pan == seg["id"]
                if seg.get("isthing", thing_mask[cat]):
                    gid = cat * meta.label_divisor + seg["id"]
                else:
                    gid = cat
                out[m] = gid
                gt_segments[int(gid)] = {
                    "category_id": int(cat),
                    "iscrowd": int(seg.get("iscrowd", 0)),
                }
            gt_frames.append(out)
        gt_ids = np.stack(gt_frames)

        evaluator.process_video(
            video["video_id"], pred_ids, pred_segments, gt_ids, gt_segments,
            frame_names=[f["file_name"] for f in video["frames"]],
        )
        if stq is not None:
            shift = stq.shift
            divisor = meta.label_divisor
            max_ds = max(ds_to_cont) + 1
            ds_lookup = np.full((max_ds + 1,), 255, np.int64)
            for ds, ci in ds_to_cont.items():
                ds_lookup[ds] = ci

            def encode(ids, cats_are_dataset):
                cat = np.where(ids >= divisor, ids // divisor, np.maximum(ids, 0))
                if cats_are_dataset:
                    cat = ds_lookup[np.clip(cat, 0, max_ds)]
                sem = np.where(ids < 0, 255, cat)
                inst = np.where(ids >= divisor, ids % divisor, 0)
                return (sem.astype(np.int64) << shift) + inst

            for gt_f, pr_f in zip(gt_ids, pred_ids):
                stq.update_state(
                    encode(gt_f, False), encode(pr_f, True),
                    sequence_id=video["video_id"],
                )

    results = evaluator.evaluate()
    if stq is not None:
        results["stq"] = stq.result()
    return results


def evaluate_ytvis(cfg, module, variables, max_videos: int | None = None,
                   format_only_path: str | None = None):
    """Whole-video VIS evaluation over the test split — the reference's
    `tools/test_video.py` workflow (`video_inference/test_video.py:49-85`):
    tube-split inference per video, YTVIS submission JSON via
    ``format_only_path`` (the reference's ``--format-only`` server-upload
    path, `docs/TRAIN_EVALUATION_MODELS.md:23`), and devkit AP when the
    split carries GT annotations (train/valid-with-GT only — the public
    val GT is server-side).
    """
    import json

    from ..data.ytvis import results_to_ytvis_json
    from ..evaluation.ytvis_eval import YTVISEvaluator
    from ..models.tube_link.detector import TubeLinkVISInference
    from ..models.video_inference import preprocess_frames

    name = cfg.datasets.test[0]
    videos = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    cont_to_ds = list(getattr(meta, "contiguous_to_dataset_id", []))

    pipeline = TubeLinkVISInference(
        module, variables,
        clip_len=cfg.model.tube_link.clip_len,
        overlap=cfg.model.tube_link.overlap,
        topk=cfg.model.tube_link.test_topk,
    )

    instances_per_video = []
    gt_records = []
    for vi, video in enumerate(videos):
        if max_videos is not None and vi >= max_videos:
            break
        frames = np.stack([
            np.asarray(Image.open(p).convert("RGB"))
            for p in video["file_names"]
        ])
        oh, ow = video["height"], video["width"]
        images, scaled_h, scaled_w, _ = preprocess_frames(
            frames, cfg.input.pixel_mean, cfg.input.pixel_std,
            cfg.input.image_size,
        )
        result = pipeline.run_video(np.asarray(images))
        # OS4 padded logits -> original-resolution probabilities: crop the
        # valid (scaled) region, then PIL-bilinear per frame (host-side,
        # like the reference's interpolate-before-fusion)
        k, v = result["masks"].shape[:2]
        h4 = (scaled_h + 3) // 4
        w4 = (scaled_w + 3) // 4
        probs = 1.0 / (1.0 + np.exp(-result["masks"]))  # logits -> probs
        up = np.zeros((k, v, oh, ow), np.float32)
        for ki in range(k):
            for fi in range(v):
                m = probs[ki, fi][:h4, :w4]
                up[ki, fi] = np.asarray(
                    Image.fromarray(m).resize((ow, oh), Image.BILINEAR))
        labels_ds = (
            np.asarray([cont_to_ds[int(c)] for c in result["labels"]])
            if cont_to_ds else result["labels"])
        instances_per_video.append((
            video["video_id"],
            dict(masks=up, labels=labels_ds, scores=result["scores"]),
        ))
        for ann in video.get("annotations", []):
            gt_records.append(dict(
                video_id=video["video_id"],
                category_id=ann["category_id"],
                segmentations=ann.get("segmentations"),
                areas=ann.get("areas"),
                iscrowd=ann.get("iscrowd", 0),
            ))

    preds = results_to_ytvis_json(instances_per_video)
    out = {"num_videos": len(instances_per_video),
           "num_predictions": len(preds)}
    if format_only_path:
        # submission masks must be RLE of binary {0,1} uint8
        with open(format_only_path, "w") as f:
            json.dump(preds, f)
        out["results_json"] = format_only_path
    if gt_records:
        out.update(YTVISEvaluator().evaluate(gt_records, preds))
    return out


def evaluate_coco_panoptic(cfg, module, variables,
                           max_images: int | None = None):
    """Single-image panoptic PQ over a COCO-panoptic-format split
    (reference `kmax_deeplab/evaluation/panoptic_evaluation.py:80-195`):
    per image — kMaX forward at the padded train size, mask logits
    upsampled (bilinear, matching `kmax_model.py`'s interpolate-before-
    postprocess) to original resolution, vectorized panoptic postprocess,
    PQ (all/things/stuff) against the GT panoptic PNG. Also serves the
    ADE20k / Cityscapes registrations (same record format)."""
    import jax
    import jax.numpy as jnp

    from ..evaluation.pq import pq_compute
    from ..models.postprocess import panoptic_inference
    from ..models.video_inference import preprocess_frames
    from ..ops.resize import resize_bilinear

    name = cfg.datasets.test[0]
    records = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    num_classes = len(meta.contiguous_to_dataset_id)
    thing_mask = np.zeros((num_classes,), bool)
    for _, ci in meta.thing_dataset_id_to_contiguous_id.items():
        thing_mask[ci] = True
    ds_to_cont = {ds: i for i, ds in enumerate(meta.contiguous_to_dataset_id)}
    kt = cfg.model.kmax.test
    divisor = meta.label_divisor

    @jax.jit
    def infer(x):
        out = module.apply(variables, x, train=False)
        return out["pred_logits"][0], out["pred_masks"][0]

    images = []
    for rec in records[: max_images or len(records)]:
        frame = np.asarray(Image.open(rec["file_name"]).convert("RGB"))
        oh, ow = frame.shape[:2]
        x, scaled_h, scaled_w, _ = preprocess_frames(
            frame[None], cfg.input.pixel_mean, cfg.input.pixel_std,
            cfg.input.image_size)
        logits, masks = infer(jnp.asarray(x))
        masks = resize_bilinear(
            masks, cfg.input.image_size,
            align_corners=cfg.input.image_size[1] % 2 == 1,
        )[:scaled_h, :scaled_w]
        masks = resize_bilinear(masks, (oh, ow),
                                align_corners=cfg.input.image_size[1] % 2 == 1)
        result = panoptic_inference(
            logits, masks, jnp.asarray(thing_mask),
            pixel_confidence_threshold=kt.pixel_confidence_threshold,
            class_threshold_thing=kt.class_threshold_thing,
            class_threshold_stuff=kt.class_threshold_stuff,
            overlap_threshold=kt.overlap_threshold,
            reorder_class_weight=kt.reorder_class_weight,
            reorder_mask_weight=kt.reorder_mask_weight,
        )
        # encode prediction ids as cat*divisor + segment_id (things) / cat
        # (stuff), mirroring the video evaluator's dataset encoding
        pan = np.asarray(result.panoptic_seg)
        pred_ids = np.full(pan.shape, -1, np.int64)
        pred_segments = {}
        for valid, sid, cat, isthing in zip(
                np.asarray(result.segment_valid),
                np.asarray(result.segment_id),
                np.asarray(result.segment_category),
                np.asarray(result.segment_isthing)):
            if not valid:
                continue
            gid = int(cat) * divisor + int(sid) if isthing else int(cat)
            pred_ids[pan == sid] = gid
            pred_segments[gid] = {"category_id": int(cat)}

        pan_gt = rgb2id(np.asarray(
            Image.open(rec["pan_seg_file_name"]).convert("RGB")))
        gt = np.full(pan_gt.shape, -1, np.int64)
        gt_segments = {}
        for seg in rec["segments_info"]:
            cat = ds_to_cont.get(seg["category_id"], None)
            if cat is None:
                continue
            m = pan_gt == seg["id"]
            gid = (cat * divisor + seg["id"]
                   if seg.get("isthing", thing_mask[cat]) else cat)
            gt[m] = gid
            gt_segments[int(gid)] = {
                "category_id": int(cat),
                "iscrowd": int(seg.get("iscrowd", 0)),
            }

        # VOID = 0 encoding for the PQ core (ids are >= 0 here)
        images.append((
            np.where(gt < 0, 0, gt + 1),
            np.where(pred_ids < 0, 0, pred_ids + 1),
            {g + 1: i for g, i in gt_segments.items()},
            {p + 1: i for p, i in pred_segments.items()},
        ))

    categories = {i: {"isthing": int(thing_mask[i])}
                  for i in range(num_classes)}
    return pq_compute(images, categories)
