#!/usr/bin/env python
"""Checkpoint conversion CLI: the reference's torch artifacts -> one orbax
params directory loadable by tools/eval.py / tools/demo.py.

  python tools/convert_checkpoint.py --out ckpt/anyref7b \
      --llava_dir LLaVA-Lightning-7B-v1-1 \
      --sam_ckpt SAM/sam_vit_h_4b8939.pth \
      --imagebind_ckpt ImageBind/imagebind_huge.pth \
      --lora_dir output2/refer/checkpoint-4500     # optional PEFT adapter

LoRA adapters merge offline into the base weights (reference
merge_lora.py:58-62 semantics).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def merge_peft_adapter(sd_base: dict, lora_dir: str) -> dict:
    """Fold a PEFT LoRA adapter dir (adapter_model.safetensors/.bin) into an
    HF llama state dict, plus copy any modules_to_save overrides."""
    import json
    import os

    from anyref_tpu.checkpoint import _load_torch_state_dict
    from anyref_tpu.convert import merge_lora_into

    with open(os.path.join(lora_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    alpha, r = acfg.get("lora_alpha", 16), acfg.get("r", 8)
    for name in ("adapter_model.safetensors", "adapter_model.bin"):
        path = os.path.join(lora_dir, name)
        if os.path.exists(path):
            asd = _load_torch_state_dict(path)
            break
    else:
        raise FileNotFoundError(f"no adapter weights in {lora_dir}")

    out = dict(sd_base)
    for k, v in asd.items():
        if "lora_A" in k:
            base_key = (k.replace("base_model.model.", "")
                         .replace(".lora_A.weight", ".weight")
                         .replace(".lora_A.default.weight", ".weight"))
            b_key = k.replace("lora_A", "lora_B")
            if base_key in out and b_key in asd:
                out[base_key] = merge_lora_into(
                    np.asarray(out[base_key], np.float32),
                    np.asarray(v, np.float32),
                    np.asarray(asd[b_key], np.float32), alpha, r)
        elif "modules_to_save" in k:
            base_key = (k.replace("base_model.model.", "")
                         .replace(".modules_to_save.default", ""))
            out[base_key] = v
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--llava_dir", default=None)
    p.add_argument("--sam_ckpt", default=None)
    p.add_argument("--imagebind_ckpt", default=None)
    p.add_argument("--clip_dir", default=None)
    p.add_argument("--lora_dir", default=None)
    p.add_argument("--preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax.numpy as jnp

    from anyref_tpu import checkpoint
    from anyref_tpu.config import anyref_7b, anyref_tiny

    cfg = anyref_7b() if args.preset == "7b" else anyref_tiny()
    dtype = getattr(jnp, args.dtype)

    if args.lora_dir and args.llava_dir:
        # pre-merge the adapter into the HF dir's state dict on disk view
        sd = checkpoint._load_hf_dir(args.llava_dir)
        sd = merge_peft_adapter(sd, args.lora_dir)
        params = checkpoint.assemble_pretrained(
            cfg, sam_ckpt=args.sam_ckpt, imagebind_ckpt=args.imagebind_ckpt,
            clip_dir=args.clip_dir, dtype=dtype)
        from anyref_tpu import convert
        params["llama"] = convert.convert_llama(sd, cfg.llama, dtype=dtype)
        try:
            params["mm_projector"] = convert.convert_mm_projector(sd, dtype=dtype)
        except KeyError:
            pass
    else:
        params = checkpoint.assemble_pretrained(
            cfg, llava_dir=args.llava_dir, sam_ckpt=args.sam_ckpt,
            imagebind_ckpt=args.imagebind_ckpt, clip_dir=args.clip_dir,
            dtype=dtype)
    checkpoint.save_params(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
