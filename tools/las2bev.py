#!/usr/bin/env python
"""Offline Las2BEV CLI: a directory of raw ``.las`` tiles -> ``cropped_tiff``
BEV intensity PNGs (the reference's closed-source preprocessing,
`/root/reference/README.md:171-172`), rasterized on the accelerator."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("las_dir")
    ap.add_argument("out_dir", help="output PNG dir (use <root>/cropped_tiff "
                                    "to feed the image datasets)")
    ap.add_argument("--img", type=int, default=1152)
    ap.add_argument("--pc-range", type=float, nargs=6,
                    default=None, metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"))
    ap.add_argument("--gain", type=float, default=None)
    ap.add_argument("--bias", type=float, default=None)
    ap.add_argument("--fill-iters", type=int, default=None)
    ap.add_argument("--max-points", type=int, default=1 << 19)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from lanemapping_tpu.tools.las2bev import (convert_las_directory,
                                               las2bev_params)
    p = las2bev_params()
    if args.pc_range is not None:
        p["pc_range"] = tuple(args.pc_range)
    for k in ("gain", "bias", "fill_iters"):
        if getattr(args, k) is not None:
            p[k] = getattr(args, k)
    stats = convert_las_directory(
        args.las_dir, args.out_dir, img=args.img, pc_range=p["pc_range"],
        gain=p["gain"], bias=p["bias"], fill_iters=p["fill_iters"],
        max_points=args.max_points, batch=args.batch)
    stats.pop("written")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
