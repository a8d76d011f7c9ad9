"""Trainer loop smoke: dataset -> accumulate -> step -> checkpoint ->
resume, on the tiny preset with a synthetic in-memory dataset."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.tokenizer import seg_answer, seg_question

CFG = anyref_tiny()


class FakeDataset:
    def __init__(self, n=64):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            self.items.append({
                "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
                "sam_image": rng.standard_normal(
                    (3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
                "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
                "question": seg_question("a cat"),
                "answer": seg_answer("cat"),
                "gt_masks": (rng.random((1, 48, 64)) > 0.5).astype(np.uint8),
                "height": 48, "width": 64, "file_name": "x.jpg",
            })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.mark.slow
def test_trainer_runs_and_resumes(tmp_path):
    from anyref_tpu.train.trainer import TrainConfig, Trainer
    params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    tc = TrainConfig(output_dir=str(tmp_path), per_device_batch_size=1,
                     grad_accum_steps=2, max_steps=2, save_steps=1,
                     log_steps=1, mesh_model_axis=1, resume=False,
                     remat=False)
    trainer = Trainer(CFG, tc, params, dataset=FakeDataset())
    state = trainer.train()
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint-2"))
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs and "loss" in recs[-1]

    # resume continues from the saved step
    tc2 = TrainConfig(output_dir=str(tmp_path), per_device_batch_size=1,
                      grad_accum_steps=2, max_steps=3, save_steps=10,
                      log_steps=1, mesh_model_axis=1, resume=True,
                      remat=False)
    trainer2 = Trainer(CFG, tc2, params, dataset=FakeDataset())
    assert int(trainer2.state.step) == 2
    state2 = trainer2.train()
    assert int(state2.step) == 3

    # deployment merge produces a structurally complete param tree
    merged = trainer2.merged_params()
    base = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
    assert len(jax.tree.leaves(merged)) == len(jax.tree.leaves(base))
