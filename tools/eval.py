#!/usr/bin/env python
"""Eval CLI — one front door for every harness (the reference hard-codes
configuration in per-script __main__ blocks: eval_referseg.py:235-256,
eval_coco20i.py:229-240, eval_reason.py, eval_avs_object.py,
eval_refer_inv.py).

  python tools/eval.py referseg --ckpt output/merged --data_root /data \
      --val_datasets refcoco_val,refcocog_test
  python tools/eval.py avs --task object --split test ...
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["referseg", "reason", "coco20i", "avs",
                                    "refer_inv"])
    p.add_argument("--ckpt", required=True, help="orbax params dir")
    p.add_argument("--data_root", default="/data")
    p.add_argument("--out_root", default="eval_out")
    p.add_argument("--val_datasets", default="refcoco_val")
    p.add_argument("--avs_task", default="object", choices=["object", "multi"])
    p.add_argument("--split", default="test")
    p.add_argument("--inv_dataset", default="refcocog")
    p.add_argument("--roi", action="store_true")
    # default matches the reference's committed __main__ configs: 0.1 for
    # referseg/coco20i (eval_referseg.py:253, eval_coco20i.py:236), 0.0 for
    # reason/avs/refer_inv (eval_reason.py:185, eval_refer_inv.py:39)
    p.add_argument("--rephrase_weight", type=float, default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--max_new_tokens", type=int, default=None,
                   help="decode budget (default: config's 128)")
    p.add_argument("--preset", default="7b", choices=["7b", "tiny"])
    args = p.parse_args()

    from anyref_tpu import checkpoint
    from anyref_tpu.config import anyref_7b, anyref_tiny
    from anyref_tpu.eval.runner import Predictor
    from anyref_tpu.tokenizer import AnyRefTokenizer

    cfg = anyref_7b() if args.preset == "7b" else anyref_tiny()
    if args.rephrase_weight is None:
        args.rephrase_weight = \
            0.1 if args.task in ("referseg", "coco20i") else 0.0
    cfg = cfg.scaled(rephrase_weight=args.rephrase_weight)
    params = checkpoint.load_params(args.ckpt)
    predictor = Predictor(params, cfg, max_new_tokens=args.max_new_tokens)
    tok = AnyRefTokenizer()

    if args.task == "referseg":
        from anyref_tpu.eval.referseg import evaluate_referseg
        res = evaluate_referseg(predictor, tok, args.data_root,
                                args.val_datasets, args.out_root, args.limit)
    elif args.task == "reason":
        from anyref_tpu.eval.harnesses import evaluate_reason
        res = evaluate_reason(predictor, tok, args.data_root, args.out_root,
                              args.limit)
    elif args.task == "coco20i":
        from anyref_tpu.eval.harnesses import evaluate_coco20i
        res = evaluate_coco20i(predictor, tok, args.data_root, args.out_root)
    elif args.task == "avs":
        from anyref_tpu.eval.harnesses import evaluate_avs
        res = evaluate_avs(predictor, tok, args.data_root, args.avs_task,
                           args.split, args.out_root, args.limit)
    else:
        from anyref_tpu.eval.harnesses import evaluate_refer_inverse
        res = evaluate_refer_inverse(predictor, tok, args.data_root,
                                     args.inv_dataset, args.split, args.roi,
                                     args.out_root, args.limit)
    print(res)


if __name__ == "__main__":
    main()
