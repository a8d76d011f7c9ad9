#!/usr/bin/env python
"""Export CLI: serialize model functions as StableHLO artifacts
(TPU-native replacement for the reference's ONNX export,
segment_anything/utils/onnx.py).

  python tools/export.py sam-decoder --ckpt output/merged --out sam_decoder.hlo
  python tools/export.py generate --ckpt output/merged --out generate.hlo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("what", choices=["sam-decoder", "generate"])
    p.add_argument("--ckpt", required=True, help="orbax params dir")
    p.add_argument("--out", required=True)
    p.add_argument("--preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--num_points", type=int, default=5)
    p.add_argument("--prompt_len", type=int, default=129)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--platform", default=None,
                   help="target platform (tpu/cpu); default = current")
    args = p.parse_args()

    from anyref_tpu import checkpoint, export
    from anyref_tpu.config import anyref_7b, anyref_tiny

    cfg = anyref_7b() if args.preset == "7b" else anyref_tiny()
    params = checkpoint.load_params(args.ckpt)
    if args.what == "sam-decoder":
        export.export_sam_decoder(params["sam"], cfg.sam, args.out,
                                  num_points=args.num_points,
                                  platform=args.platform)
    else:
        export.export_generate(params, cfg, args.out,
                               prompt_len=args.prompt_len,
                               max_new_tokens=args.max_new_tokens,
                               platform=args.platform)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
