#!/usr/bin/env python
"""Single-image demo: text / image-crop / RoI / audio referring segmentation
(the end-to-end path BASELINE.json's "samples.py demo" config describes).

  python tools/demo.py --ckpt output/merged --image cat.jpg \
      --text "the cat on the left" --out mask.png
  python tools/demo.py --ckpt output/merged --image scene.jpg \
      --ref_image crop.jpg --out mask.png
  python tools/demo.py --ckpt output/merged --image scene.jpg \
      --audio meow.wav --out mask.png
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--text", default=None)
    p.add_argument("--ref_image", default=None)
    p.add_argument("--roi", default=None, help="x1,y1,x2,y2 (pixels)")
    p.add_argument("--audio", default=None, help=".wav path")
    p.add_argument("--out", default="mask.png")
    p.add_argument("--max_new_tokens", type=int, default=None,
                   help="decode budget (default: config's 128)")
    p.add_argument("--preset", default="7b", choices=["7b", "tiny"])
    args = p.parse_args()

    from PIL import Image

    from anyref_tpu import checkpoint
    from anyref_tpu.config import anyref_7b, anyref_tiny
    from anyref_tpu.data.avs import load_wav
    from anyref_tpu.data.base import SegDataset, load_image_rgb
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.eval.runner import Predictor, binary_mask
    from anyref_tpu.ops.mel import audio_to_mel_clips
    from anyref_tpu.tokenizer import (AnyRefTokenizer, audio_ref_question,
                                      img_ref_question, seg_question)

    cfg = anyref_7b() if args.preset == "7b" else anyref_tiny()
    params = checkpoint.load_params(args.ckpt)
    tok = AnyRefTokenizer()

    image = load_image_rgb(args.image)
    helper = SegDataset(cfg)
    kwargs = {}
    if args.text:
        q = seg_question(args.text)
    elif args.ref_image:
        q = img_ref_question()
        kwargs["ref_image"] = load_image_rgb(args.ref_image)
    elif args.roi:
        q = img_ref_question()
        box = np.asarray([float(v) for v in args.roi.split(",")])
        box = box / np.asarray([image.shape[1], image.shape[0]] * 2)
        kwargs["ref_bbox"] = box.astype(np.float32)
    elif args.audio:
        q = audio_ref_question()
        kwargs["audio_mels"] = audio_to_mel_clips(load_wav(args.audio))
    else:
        raise SystemExit("give one of --text/--ref_image/--roi/--audio")

    sample = helper.make_sample(image, q, None, None,
                                file_name=args.image, **kwargs)
    batch = Collator(tok, cfg, train=False, roi=args.roi is not None)([sample])
    predictor = Predictor(params, cfg, max_new_tokens=args.max_new_tokens)
    output_ids, masks = predictor.predict(batch)
    text = tok.decode([t for t in output_ids[0].tolist() if t != 2],
                      skip_special=True)
    print("model says:", text)
    m = binary_mask(masks[0], image.shape[0], image.shape[1])
    Image.fromarray((m * 255).astype(np.uint8)).save(args.out)
    print(f"mask -> {args.out} ({m.sum()} px)")


if __name__ == "__main__":
    main()
