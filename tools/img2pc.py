#!/usr/bin/env python
"""BEV-image lane seqs -> 3-D LiDAR-frame seqs (reference
`baseline/utils/coor_img2pc.py:276-284`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img_seq_dir")
    ap.add_argument("bev_img_dir")
    ap.add_argument("params_dir")
    ap.add_argument("--workers", type=int, default=12)
    args = ap.parse_args()

    from lanemapping_tpu.tools.img2pc import convert_directory

    out = convert_directory(args.img_seq_dir, args.bev_img_dir,
                            args.params_dir, n_workers=args.workers)
    print(f"[img2pc] wrote {out}")


if __name__ == "__main__":
    main()
