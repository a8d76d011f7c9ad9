#!/usr/bin/env python
"""Build the reference-crop sample index (replaces reference samples.py:1-13):
class -> [(img_idx, ann_idx)] where box/img area > 0.1 and mask/box > 0.4,
written to samples_0.05_0.25.json for the image-reference datasets."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_root", required=True)
    p.add_argument("--json_file", required=True)
    p.add_argument("--out", default="samples_0.05_0.25.json")
    p.add_argument("--box_img_threshold", type=float, default=0.1)
    p.add_argument("--mask_box_threshold", type=float, default=0.4)
    args = p.parse_args()

    from anyref_tpu.data.coco import build_ref_index
    idx = build_ref_index(args.image_root, args.json_file, args.out,
                          args.box_img_threshold, args.mask_box_threshold)
    print(f"wrote {args.out}: {sum(len(v) for v in idx.values())} samples "
          f"over {len(idx)} classes")


if __name__ == "__main__":
    main()
