#!/usr/bin/env python
"""Build a dataset variant with re-rendered endpoint heatmaps (new sigma).

The endpoint-heatmap width is a LABEL-GENERATION parameter (reference
`data/convert_data.py:248-318`, sigma=2 Gaussians) — sweeping it means
re-rendering `labels/sparse_endp/*.png` from the per-tile sparse_seq JSONs.
Everything else (images, seg/instance/orient labels, split file, transform
params) is identical, so the variant root symlinks those and regenerates
only the endpoint maps.

Usage:
  python tools/regen_endp_sigma.py --src /root/data/synth1024 \
      --dst /root/data/synth1024_s3 --sigma 3
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lanemapping_tpu.data.label_gen import endpoint_heatmap  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--sigma", type=float, default=3.0)
    ap.add_argument("--img", type=int, default=1152)
    args = ap.parse_args()

    os.makedirs(os.path.join(args.dst, "labels"), exist_ok=True)
    # share everything that doesn't depend on sigma
    for rel in ("cropped_tiff", "cropped_tiff_param",
                "data_split-shuffle.json", "las",
                "labels/sparse_seq", "labels/sparse_semantic",
                "labels/sparse_instance", "labels/sparse_orient"):
        src = os.path.join(args.src, rel)
        dst = os.path.join(args.dst, rel)
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    seq_dir = os.path.join(args.src, "labels", "sparse_seq")
    out_dir = os.path.join(args.dst, "labels", "sparse_endp")
    os.makedirs(out_dir, exist_ok=True)
    stems = sorted(os.path.splitext(f)[0] for f in os.listdir(seq_dir)
                   if f.endswith(".json"))
    for i, stem in enumerate(stems):
        with open(os.path.join(seq_dir, stem + ".json")) as f:
            recs = json.load(f)
        init_pts = np.array([r["init_vertex"] for r in recs], np.float64)
        end_pts = np.array([r["end_vertex"] for r in recs], np.float64)
        if len(recs):
            hm = endpoint_heatmap(init_pts, end_pts, args.img, args.img,
                                  sigma=args.sigma)
        else:
            hm = np.zeros((args.img, args.img), np.float32)
        Image.fromarray((hm * 255.0).astype(np.uint8)).save(
            os.path.join(out_dir, stem + ".png"))
        if (i + 1) % 200 == 0:
            print(f"[regen_endp] {i + 1}/{len(stems)}", flush=True)
    print(f"[regen_endp] wrote {len(stems)} endpoint maps at sigma="
          f"{args.sigma} under {out_dir}")


if __name__ == "__main__":
    main()
