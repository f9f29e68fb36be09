"""End-to-end drives of the offline metric CLIs (V22: eval_dvpq, eval_dstq)
on tiny synthetic fixtures — the VSPW CLIs are driven in test_aux."""
import json
import os
import subprocess
import sys

import numpy as np
from PIL import Image

from axial_vs_tpu.data.panoptic_utils import id2rgb

ROOT = os.path.join(os.path.dirname(__file__), "..")
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def test_eval_dvpq_cli(tmp_path):
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    vid = "v01"
    (gt_root / vid).mkdir(parents=True)
    (pred_root / vid).mkdir(parents=True)
    pan = np.zeros((16, 20), np.int64)
    pan[:, :10] = 1001   # thing cat 1 instance
    pan[:, 10:] = 3      # stuff cat 3
    images, annos, pred_annos = [], [], []
    for fi in range(3):
        name = f"{fi:05d}.png"
        Image.fromarray(id2rgb(pan)).save(gt_root / vid / name)
        Image.fromarray(id2rgb(pan)).save(pred_root / vid / name)
        images.append(dict(id=f"{vid}_{fi}", file_name=name))
        annos.append(dict(image_id=f"{vid}_{fi}", file_name=name,
                          segments_info=[
                              dict(id=1001, category_id=1, iscrowd=0),
                              dict(id=3, category_id=3, iscrowd=0)]))
        pred_annos.append(dict(file_name=name, segments_info=[
            dict(id=1001, category_id=1), dict(id=3, category_id=3)]))
    with open(pred_root / vid / "pred.json", "w") as f:
        json.dump(dict(annotations=pred_annos), f)
    gt_json = tmp_path / "gt.json"
    with open(gt_json, "w") as f:
        json.dump(dict(
            videos=[dict(video_id=vid, images=images, annotations=annos)],
            categories=[dict(id=1, isthing=1), dict(id=3, isthing=0)],
        ), f)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/eval_dvpq.py"),
         "--gt-json", str(gt_json), "--gt-panomasks", str(gt_root),
         "--pred-dir", str(pred_root), "--windows", "1", "2",
         "--num-workers", "0"],
        capture_output=True, text=True, env=ENV, timeout=300)
    assert out.returncode == 0, out.stderr
    # identical pred == gt -> perfect VPQ
    assert "VPQ (mean over [1, 2]): 1.0000" in out.stdout


def test_eval_dstq_cli(tmp_path):
    gt_root = tmp_path / "gt"
    pred_root = tmp_path / "pred"
    dgt_root = tmp_path / "dgt"
    dpred_root = tmp_path / "dpred"
    seq = "s01"
    for r in (gt_root, pred_root, dgt_root, dpred_root):
        (r / seq).mkdir(parents=True)
    png = np.zeros((16, 20, 3), np.uint8)
    png[:, :10, 0] = 1  # thing: semantic ch0=1 ...
    png[:, :10, 1] = 1  # ... instance id 1 (id 0 would be ignored by AQ)
    png[:, 10:, 0] = 2
    depth = (np.full((16, 20), 2000)).astype(np.int32)
    for fi in range(3):
        name = f"{fi:05d}.png"
        Image.fromarray(png).save(gt_root / seq / name)
        Image.fromarray(png).save(pred_root / seq / name)
        Image.fromarray(depth, mode="I").save(dgt_root / seq / name)
        Image.fromarray(depth, mode="I").save(dpred_root / seq / name)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools/eval_dstq.py"),
         "--gt-dir", str(gt_root), "--pred-dir", str(pred_root),
         "--num-classes", "3", "--things", "1",
         "--depth-gt-dir", str(dgt_root), "--depth-pred-dir", str(dpred_root)],
        capture_output=True, text=True, env=ENV, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "STQ: 1.0000" in out.stdout
    assert "DSTQ: 1.0000" in out.stdout
