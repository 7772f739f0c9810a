#!/usr/bin/env python
"""Merge per-tile 3-D lane seqs into a global map (reference
`baseline/utils/merge_lines.py:293-316`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir", help="out_pc_seq_json_dir from tools/img2pc.py")
    ap.add_argument("--downsample", type=float, default=0.6)
    args = ap.parse_args()

    from lanemapping_tpu.tools.merge_lines import merge_directory

    p1, p2 = merge_directory(args.seq_dir, args.downsample)
    print(f"[merge_lines] wrote {p1} and {p2}")


if __name__ == "__main__":
    main()
