"""COCO-compatible RLE mask codec (pycocotools is not available in this
environment; the reference depends on it for YTVIS/COCO annotations).

Format notes (public COCO spec): masks are run-length encoded in
column-major (Fortran) order starting with the count of zeros; compressed
strings pack counts as base-6-bit LEB128-style chars offset by 48, with
counts[i] (i >= 2) stored as the difference from counts[i-2].
"""
from __future__ import annotations

import numpy as np


def mask_to_rle_counts(mask: np.ndarray) -> list[int]:
    """(H, W) {0,1} -> uncompressed counts (column-major)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return [0]
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    runs = np.diff(np.concatenate([[0], change, [n]])).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


def rle_counts_to_mask(counts, shape) -> np.ndarray:
    h, w = shape
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


def rle_encode_string(counts) -> str:
    """counts -> compressed char string (pycocotools rleToString)."""
    out = []
    for i, cnt in enumerate(counts):
        x = int(cnt)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == -1 and (c & 0x10) or x == 0 and not (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def rle_decode_string(s) -> list[int]:
    """compressed string -> counts (pycocotools rleFrString)."""
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def decode(rle: dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|bytes|list} -> (H, W) uint8."""
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_decode_string(counts)
    return rle_counts_to_mask(counts, rle["size"])


def encode(mask: np.ndarray) -> dict:
    return {
        "size": list(mask.shape),
        "counts": rle_encode_string(mask_to_rle_counts(mask)),
    }


def area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = rle_decode_string(counts)
    return int(sum(counts[1::2]))


def iou_rle(a: dict, b: dict) -> float:
    ma, mb = decode(a), decode(b)
    inter = int(np.logical_and(ma, mb).sum())
    union = int(np.logical_or(ma, mb).sum())
    return inter / union if union else 0.0
