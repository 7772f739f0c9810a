#!/usr/bin/env python
"""Offline label generation CLI (reference `data/convert_data.py:440-478`):
dense annotation_seq JSONs -> sparse_{seq,semantic,instance,orient,endp}."""

import argparse
import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir", help="directory of dense annotation_seq JSONs")
    ap.add_argument("--top-k", type=int, default=20)
    ap.add_argument("--col-range", type=int, nargs=2, default=(100, 1000))
    ap.add_argument("--workers", type=int, default=12)
    args = ap.parse_args()

    from lanemapping_tpu.data.label_gen import convert_annotation_file

    out_root = os.path.dirname(os.path.abspath(args.seq_dir))
    files = [os.path.join(args.seq_dir, f)
             for f in sorted(os.listdir(args.seq_dir))
             if f.endswith(".json")
             and os.stat(os.path.join(args.seq_dir, f)).st_size > 0]
    print(f"[convert_data] {len(files)} files -> {out_root}")
    if args.workers > 1:
        with Pool(args.workers) as p:
            p.starmap(convert_annotation_file,
                      [(f, out_root, args.top_k, tuple(args.col_range))
                       for f in files])
    else:
        for f in files:
            convert_annotation_file(f, out_root, args.top_k,
                                    tuple(args.col_range))
    print("[convert_data] done")


if __name__ == "__main__":
    main()
