"""SAM automatic mask generation + PhraseCut loader tests."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from anyref_tpu.config import anyref_tiny


@pytest.mark.slow
def test_amg_smoke():
    from anyref_tpu.models import sam as sam_mod
    from anyref_tpu.models.sam.amg import SamAutomaticMaskGenerator, \
        box_nms, build_point_grid
    cfg = anyref_tiny().sam
    params = sam_mod.init(jax.random.key(0), cfg, dtype=jnp.float32)
    gen = SamAutomaticMaskGenerator(params, cfg, points_per_side=4,
                                    points_per_batch=8,
                                    pred_iou_thresh=-10.0,   # keep everything
                                    stability_score_thresh=0.0)
    rng = np.random.default_rng(0)
    recs = gen.generate(rng.integers(0, 255, (96, 128, 3), np.uint8))
    assert isinstance(recs, list)
    for r in recs[:3]:
        assert set(r) >= {"segmentation", "bbox", "area", "predicted_iou",
                          "stability_score"}

    grid = build_point_grid(4)
    assert grid.shape == (16, 2) and grid.min() > 0 and grid.max() < 1

    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                       np.float64)
    keep = box_nms(boxes, np.asarray([0.9, 0.8, 0.7]), 0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_phrasecut(tmp_path):
    from anyref_tpu.data.phrasecut import PhraseCut
    base = tmp_path / "VGPhraseCut_v0"
    (base / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (60, 80, 3), np.uint8)).save(
        base / "images" / "123.jpg")
    tasks = [{"task_id": "t0", "image_id": 123,
              "phrase": "red apple on table",
              "Polygons": [[[[10, 10], [40, 10], [40, 30], [10, 30]]]]}]
    with open(base / "refer_train.json", "w") as f:
        json.dump(tasks, f)
    ds = PhraseCut(str(tmp_path), split="train")
    s = ds[0]
    assert "red apple" in s["question"]
    assert s["gt_masks"][0].sum() > 0
