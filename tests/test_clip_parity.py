"""Golden parity: anyref_tpu CLIP vision tower vs HF CLIPVisionModel,
penultimate-layer patch features (LLaVA select semantics)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from anyref_tpu.config import ClipVisionConfig
from anyref_tpu import convert
from anyref_tpu.models import clip_vit


TINY = ClipVisionConfig(image_size=56, patch_size=14, hidden_size=48,
                        num_layers=3, num_heads=4, intermediate_size=96)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModel
    cfg = HFConfig(hidden_size=TINY.hidden_size,
                   intermediate_size=TINY.intermediate_size,
                   num_hidden_layers=TINY.num_layers,
                   num_attention_heads=TINY.num_heads,
                   image_size=TINY.image_size, patch_size=TINY.patch_size,
                   hidden_act="quick_gelu")
    torch.manual_seed(0)
    m = CLIPVisionModel(cfg)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape) * 0.05)
    m.eval()
    return m


def test_patch_feature_parity(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = convert.convert_clip_vision(sd, TINY)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, TINY.image_size, TINY.image_size)).astype(np.float32)
    with torch.no_grad():
        out = hf_model(torch.from_numpy(x), output_hidden_states=True)
    # LLaVA: hidden_states[-2], drop CLS
    want = out.hidden_states[-2][:, 1:].numpy()
    got = np.asarray(clip_vit.apply_patch_features(params, jnp.asarray(x), TINY))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_preprocess_matches_hf_processor():
    """preprocess_clip_np must reproduce the reference's exact input pipeline
    (utils/coco_instance.py:378-415): CLIPImageProcessor(do_center_crop=False)
    -> torch bilinear force-resize to 224x224 (VERDICT r1 item 6)."""
    import torch
    import torch.nn.functional as F
    from transformers import CLIPImageProcessor

    from anyref_tpu.data.preprocess import preprocess_clip_np

    proc = CLIPImageProcessor(do_center_crop=False,
                              size={"shortest_edge": 224})
    rng = np.random.default_rng(11)
    for hw in ((480, 640), (640, 480), (224, 224), (300, 301), (101, 517)):
        img = rng.integers(0, 256, (*hw, 3), np.uint8)
        want = proc.preprocess(img, return_tensors="pt")["pixel_values"]
        want = F.interpolate(want, size=(224, 224), mode="bilinear",
                             align_corners=False)[0].numpy()
        got = preprocess_clip_np(img)
        # residual diff is fp32 summation order inside the bilinear
        # (ours-as-matmul vs torch interpolate): <=3e-5 on <0.1% of pixels
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)
