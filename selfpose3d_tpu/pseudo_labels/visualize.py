"""Pseudo-label visualization stages s6/s8: overlay + GT-compare dumps.

Headless (file-writing) equivalents of the reference's interactive viewers
(ref: pseudo_2d_labels_generation/s6_vis_pseudo_kpt2d.py,
s8_vis_compare_pseudo_kpt2d.py): s6 draws the COCO-17 pseudo 2D keypoints
from the merged annotation json onto their images; s8 draws the Panoptic-15
joints of a GT db pickle and a pseudo-label db pickle side by side for the
same frames, completing the pipeline's visual QA loop.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import pickle
import random
from typing import List, Optional, Sequence

import numpy as np

# COCO-17 skeleton pairs (ref: s6_vis_pseudo_kpt2d.py:55-75)
COCO_PAIRS = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]

# Panoptic-15 limb pairs (matches data/skeleton.py PANOPTIC_LIMBS)
PANOPTIC_PAIRS = [
    (0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (0, 9), (9, 10), (10, 11),
    (2, 6), (2, 12), (6, 7), (7, 8), (12, 13), (13, 14),
]

# per-person bright colors (BGR); cycled past 20 persons
_PERSON_COLORS = [
    (73, 73, 230), (75, 180, 60), (25, 225, 255), (200, 130, 0),
    (48, 130, 245), (180, 30, 145), (240, 240, 70), (230, 50, 240),
    (60, 245, 210), (190, 190, 250), (128, 128, 0), (255, 190, 230),
    (40, 110, 170), (200, 250, 255), (0, 0, 128), (195, 255, 170),
    (0, 128, 128), (255, 128, 128), (128, 0, 0), (128, 192, 255),
]


def draw_skeleton_2d(
    image: np.ndarray,
    kpts: np.ndarray,
    pairs: Sequence,
    color,
    vis_thresh: float = 0.0,
) -> np.ndarray:
    """Draw one person's 2D keypoints + limbs in place.

    kpts: (J, 3) [x, y, conf/vis] — joints with third column <= vis_thresh
    are skipped (ref: s8 draw_2d_keypoints semantics).
    """
    import cv2

    J = kpts.shape[0]
    for a, b in pairs:
        if a >= J or b >= J:
            continue
        if kpts[a, 2] > vis_thresh and kpts[b, 2] > vis_thresh:
            p1 = (int(round(kpts[a, 0])), int(round(kpts[a, 1])))
            p2 = (int(round(kpts[b, 0])), int(round(kpts[b, 1])))
            cv2.line(image, p1, p2, color, 3, cv2.LINE_AA)
    for j in range(J):
        if kpts[j, 2] > vis_thresh:
            pt = (int(round(kpts[j, 0])), int(round(kpts[j, 1])))
            cv2.circle(image, pt, 4, color, 2, cv2.LINE_AA)
            cv2.circle(image, pt, 5, (0, 0, 0), 1, cv2.LINE_AA)
    return image


def _load_image(path: str, width: int, height: int) -> np.ndarray:
    """Image or, when unavailable, a black canvas of the annotated size."""
    import cv2

    from selfpose3d_tpu.utils.zipreader import imread_any

    img = imread_any(path, cv2.IMREAD_COLOR) if path else None
    if img is None:
        img = np.zeros((int(height), int(width), 3), np.uint8)
    return img


def vis_pseudo_kpt2d(
    pseudo_json: str,
    img_dir: str,
    out_dir: str,
    num_samples: int = 50,
    seed: int = 0,
    kp_key: str = "keypoints",
) -> List[str]:
    """s6: overlay the merged COCO-17 pseudo keypoints on their images
    (ref: s6_vis_pseudo_kpt2d.py — batch, headless)."""
    data = json.load(open(pseudo_json))
    by_image = {im["id"]: [] for im in data["images"]}
    for ann in data["annotations"]:
        if kp_key in ann:
            by_image[ann["image_id"]].append(ann)
    images = {im["id"]: im for im in data["images"]}

    rng = random.Random(seed)
    ids = list(images.keys())
    rng.shuffle(ids)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for image_id in ids[:num_samples]:
        im = images[image_id]
        img = _load_image(
            osp.join(img_dir, im["file_name"]), im["width"], im["height"]
        )
        for pi, ann in enumerate(by_image[image_id]):
            kp = np.asarray(ann[kp_key], np.float32).reshape(-1, 3)
            draw_skeleton_2d(
                img, kp, COCO_PAIRS,
                _PERSON_COLORS[pi % len(_PERSON_COLORS)], vis_thresh=0.05,
            )
        out = osp.join(out_dir, f"pseudo_{image_id}.jpg")
        import cv2

        cv2.imwrite(out, img)
        written.append(out)
    return written


def vis_compare_pseudo_kpt2d(
    gt_pkl: str,
    pseudo_pkl: str,
    img_dir: str,
    out_dir: str,
    num_samples: int = 50,
    seed: int = 0,
) -> List[str]:
    """s8: GT vs pseudo Panoptic-15 overlays for the same frames, written as
    side-by-side composites (ref: s8_vis_compare_pseudo_kpt2d.py:266-320,
    headless: every sampled frame is saved instead of keyboard-gated)."""
    import cv2

    gt = {r["key"]: r for r in pickle.load(open(gt_pkl, "rb"))["db"]}
    pseudo = {r["key"]: r for r in pickle.load(open(pseudo_pkl, "rb"))["db"]}
    keys = [k for k in gt.keys() if k in pseudo]

    rng = random.Random(seed)
    rng.shuffle(keys)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for key in keys[:num_samples]:
        panels = []
        for rec in (gt[key], pseudo[key]):
            img = _load_image(
                osp.join(img_dir, rec["image"]),
                rec.get("width", 1920), rec.get("height", 1080),
            )
            persons = []
            for kp, vis in zip(rec["joints_2d"], rec["joints_2d_vis"]):
                kp = np.asarray(kp, np.float32)
                vis = np.asarray(vis, np.float32)
                persons.append(np.concatenate([kp[:, :2], vis[:, 1:2]], 1))
            # stable person-color pairing across the two panels: sort by the
            # x of joint 2 (mid-hip), like the reference (ref: s8 :296-297)
            persons.sort(key=lambda k: float(k[2, 0]))
            for pi, kp in enumerate(persons):
                draw_skeleton_2d(
                    img, kp, PANOPTIC_PAIRS,
                    _PERSON_COLORS[pi % len(_PERSON_COLORS)],
                )
            panels.append(img)
        h = min(p.shape[0] for p in panels)
        panels = [p[:h] for p in panels]
        composite = np.concatenate(panels, axis=1)
        out = osp.join(out_dir, f"compare_{key}.jpg")
        cv2.imwrite(out, composite)
        written.append(out)
    return written


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="pseudo-label visualization (s6 overlay / s8 compare)"
    )
    sub = ap.add_subparsers(dest="stage", required=True)
    p6 = sub.add_parser("s6", help="overlay pseudo COCO keypoints")
    p6.add_argument("--pseudo-json", required=True)
    p6.add_argument("--img-dir", default=".")
    p6.add_argument("--out-dir", required=True)
    p6.add_argument("--num", type=int, default=50)
    p6.add_argument("--kp-key", default="keypoints")
    p8 = sub.add_parser("s8", help="compare GT vs pseudo db pickles")
    p8.add_argument("--gt-pkl", required=True)
    p8.add_argument("--pseudo-pkl", required=True)
    p8.add_argument("--img-dir", default=".")
    p8.add_argument("--out-dir", required=True)
    p8.add_argument("--num", type=int, default=50)
    args = ap.parse_args(argv)

    if args.stage == "s6":
        out = vis_pseudo_kpt2d(
            args.pseudo_json, args.img_dir, args.out_dir,
            num_samples=args.num, kp_key=args.kp_key,
        )
    else:
        out = vis_compare_pseudo_kpt2d(
            args.gt_pkl, args.pseudo_pkl, args.img_dir, args.out_dir,
            num_samples=args.num,
        )
    print(f"wrote {len(out)} images to {osp.dirname(out[0]) if out else '-'}")


if __name__ == "__main__":
    main()
