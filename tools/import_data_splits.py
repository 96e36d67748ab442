#!/usr/bin/env python
"""Import the dataset split filename lists from a StableMTL checkout.

The split lists (data_split/*.txt — per-dataset train/val/test filename
lists incl. the 1/5/10/25/50% label-fraction subsets) are factual data the
eval protocol depends on; they are imported from an upstream checkout at
setup time rather than vendored.

Usage:
    python tools/import_data_splits.py --reference /path/to/StableMTL \
        [--out data_split]
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="path to an astra-vision/StableMTL checkout")
    ap.add_argument("--out", default="data_split")
    args = ap.parse_args()

    src = os.path.join(args.reference, "data_split")
    if not os.path.isdir(src):
        raise SystemExit(f"{src} not found — is --reference a StableMTL "
                         "checkout?")
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        dst_dir = os.path.join(args.out, rel)
        os.makedirs(dst_dir, exist_ok=True)
        for f in files:
            if f.endswith(".txt"):
                shutil.copy2(os.path.join(root, f), os.path.join(dst_dir, f))
                n += 1
    print(f"imported {n} split files into {args.out}/")


if __name__ == "__main__":
    main()
