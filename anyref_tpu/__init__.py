"""anyref-tpu: TPU-native any-reference segmentation framework.

Public surface:
    config.anyref_7b / anyref_tiny     model presets
    checkpoint.assemble_pretrained     torch artifacts -> param tree
    models.anyref.train_forward / generate
    eval.runner.Predictor              bucketed batched inference
    serve.Server                       micro-batching serving runtime
    train.trainer.Trainer              training loop (LoRA + AdamW + remat)

See README.md for the architecture and PARITY.md for the component map
against the reference implementation.
"""

__version__ = "0.1.0"
