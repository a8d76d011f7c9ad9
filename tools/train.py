#!/usr/bin/env python
"""Training CLI (replaces reference train.py + train.sh accelerate launch).

Example (mirrors train.sh):
  python tools/train.py --train_datasets avs_object --data_root /data \
      --output_dir output/avs --per_device_batch_size 6 \
      --grad_accum_steps 8 --learning_rate 5e-5 --max_steps 10000 \
      --rephrase_weight 0.1 --roi --no_mask --add_audio_encoder
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_datasets", default="refer_seg")
    p.add_argument("--data_root", default="/data")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--per_device_batch_size", type=int, default=6)
    p.add_argument("--grad_accum_steps", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--max_steps", type=int, default=10_000)
    p.add_argument("--save_steps", type=int, default=100)
    p.add_argument("--rephrase_weight", type=float, default=0.0)
    p.add_argument("--roi", action="store_true")
    p.add_argument("--no_mask", action="store_true")
    p.add_argument("--itisseg", action="store_true")
    p.add_argument("--add_audio_encoder", action="store_true")
    p.add_argument("--mesh_model_axis", type=int, default=1)
    p.add_argument("--preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llava_dir", default="LLaVA-Lightning-7B-v1-1")
    p.add_argument("--sam_ckpt", default="SAM/sam_vit_h_4b8939.pth")
    p.add_argument("--imagebind_ckpt", default="ImageBind/imagebind_huge.pth")
    p.add_argument("--profile_steps", default="")
    # multi-host (pod-slice) launch: pass --multihost on every worker; on
    # TPU pods jax.distributed.initialize() auto-discovers the coordinator,
    # elsewhere give --coordinator host:port --num_processes N --process_id I
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)

    from anyref_tpu import checkpoint
    from anyref_tpu.config import anyref_7b, anyref_tiny
    from anyref_tpu.train.trainer import TrainConfig, Trainer

    cfg = anyref_7b() if args.preset == "7b" else anyref_tiny()
    cfg = cfg.scaled(rephrase_weight=args.rephrase_weight,
                     audio=cfg.audio if args.add_audio_encoder or "avs" in
                     args.train_datasets else None)

    params = checkpoint.assemble_pretrained(
        cfg, llava_dir=args.llava_dir, sam_ckpt=args.sam_ckpt,
        imagebind_ckpt=args.imagebind_ckpt)

    tc = TrainConfig(
        train_datasets=args.train_datasets, data_root=args.data_root,
        output_dir=args.output_dir,
        per_device_batch_size=args.per_device_batch_size,
        grad_accum_steps=args.grad_accum_steps,
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        max_steps=args.max_steps, save_steps=args.save_steps,
        itisseg=args.itisseg, roi=args.roi, no_mask=args.no_mask,
        mesh_model_axis=args.mesh_model_axis,
        profile_steps=tuple(int(x) for x in args.profile_steps.split(",")
                            if x))
    trainer = Trainer(cfg, tc, params)
    trainer.train()
    # deployment merge (reference merge_lora.py)
    checkpoint.save_params(f"{args.output_dir}/merged", trainer.merged_params())


if __name__ == "__main__":
    main()
