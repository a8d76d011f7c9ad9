"""Entry-point smoke tests: run the actual `tools/` scripts (the parity
surface for the reference's train.py / eval_*.py __main__ blocks / demo,
SURVEY §2.3) via runpy with patched argv, on the tiny preset over the
synthetic fixture data root. Library internals are covered elsewhere —
these pin the CLI wiring itself: argument parsing, checkpoint loading,
registry names, and output artifacts."""

import os
import runpy
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from .test_datasets import data_root  # fixture reuse  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_ckpt(tmp_path):
    from anyref_tpu import checkpoint
    from anyref_tpu.config import anyref_tiny
    from anyref_tpu.models import anyref
    params = anyref.init(jax.random.key(0), anyref_tiny(),
                         dtype=jnp.float32)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    checkpoint.save_params(ckpt, params)
    return ckpt


def _run_tool(name, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [name] + list(argv))
    runpy.run_path(os.path.join(REPO, "tools", name), run_name="__main__")


@pytest.mark.slow
def test_demo_cli_text(tmp_path, monkeypatch, capsys):
    from PIL import Image
    ckpt = _tiny_ckpt(tmp_path)
    img = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(img)
    out = tmp_path / "mask.png"
    _run_tool("demo.py",
              ["--ckpt", ckpt, "--image", str(img), "--text", "the cat",
               "--out", str(out), "--preset", "tiny",
               "--max_new_tokens", "4"], monkeypatch)
    printed = capsys.readouterr().out
    assert "model says:" in printed
    assert out.exists()
    m = np.asarray(Image.open(out))
    assert m.shape == (48, 64)


@pytest.mark.slow
def test_demo_cli_requires_a_reference(tmp_path, monkeypatch):
    from PIL import Image
    ckpt = _tiny_ckpt(tmp_path)
    img = tmp_path / "img.png"
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(img)
    with pytest.raises(SystemExit):
        _run_tool("demo.py", ["--ckpt", ckpt, "--image", str(img),
                              "--preset", "tiny"], monkeypatch)


@pytest.mark.slow
def test_eval_cli_referseg(tmp_path, monkeypatch, data_root, capsys):  # noqa: F811
    ckpt = _tiny_ckpt(tmp_path)
    out_root = str(tmp_path / "eval_out")
    _run_tool("eval.py",
              ["referseg", "--ckpt", ckpt, "--data_root", data_root,
               "--val_datasets", "refcoco_val", "--out_root", out_root,
               "--preset", "tiny", "--limit", "1",
               "--max_new_tokens", "4"], monkeypatch)
    assert "refcoco_val" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out_root, "refcoco", "val",
                                       "result.txt"))


@pytest.mark.slow
def test_train_cli(tmp_path, monkeypatch, data_root):  # noqa: F811
    """tools/train.py end-to-end on the fixture refcoco: registry name ->
    loader -> 1 step -> merged deployment save (reference train.sh +
    merge_lora.py flow). assemble_pretrained is patched to random tiny
    init (no released checkpoints ship in this environment)."""
    from anyref_tpu import checkpoint

    def fake_assemble(cfg, **kw):
        from anyref_tpu.models import anyref
        return anyref.init(jax.random.key(1), cfg, dtype=jnp.float32)

    monkeypatch.setattr(checkpoint, "assemble_pretrained", fake_assemble)
    out_dir = str(tmp_path / "out")
    # 8 virtual devices: model axis 4 leaves data axis 2, so the global
    # batch (2) fits the 2-item fixture train split
    _run_tool("train.py",
              ["--preset", "tiny", "--train_datasets", "refer_seg_refcoco",
               "--data_root", data_root, "--output_dir", out_dir,
               "--max_steps", "1", "--grad_accum_steps", "1",
               "--per_device_batch_size", "1", "--save_steps", "1",
               "--mesh_model_axis", "4"], monkeypatch)
    merged = os.path.join(out_dir, "merged")
    assert os.path.isdir(merged)
    params = checkpoint.load_params(merged)
    assert "llama" in params


@pytest.mark.slow
def test_export_cli_sam_decoder(tmp_path, monkeypatch, capsys):
    ckpt = _tiny_ckpt(tmp_path)
    out = str(tmp_path / "sam_decoder.hlo")
    _run_tool("export.py",
              ["sam-decoder", "--ckpt", ckpt, "--out", out,
               "--preset", "tiny", "--num_points", "2"], monkeypatch)
    assert os.path.getsize(out) > 0
    assert "wrote" in capsys.readouterr().out


def test_convert_checkpoint_merge_peft_adapter(tmp_path):
    """merge_peft_adapter folds a PEFT adapter dir into an HF state dict:
    W' = W + (alpha/r) B@A for lora pairs, modules_to_save copied verbatim
    (reference merge_lora.py:58-62 offline-merge semantics)."""
    import json

    import torch

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_checkpoint import merge_peft_adapter

    rng = np.random.default_rng(0)
    base_w = rng.standard_normal((6, 4)).astype(np.float32)
    head_w = rng.standard_normal((5, 6)).astype(np.float32)
    sd_base = {
        "model.layers.0.self_attn.q_proj.weight": torch.tensor(base_w),
        "lm_head.weight": torch.tensor(head_w),
    }
    a = rng.standard_normal((2, 4)).astype(np.float32)
    b = rng.standard_normal((6, 2)).astype(np.float32)
    new_head = rng.standard_normal((5, 6)).astype(np.float32)
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_A.weight": torch.tensor(a),
        "base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_B.weight": torch.tensor(b),
        "base_model.model.lm_head.modules_to_save.default"
        ".weight": torch.tensor(new_head),
    }
    lora_dir = tmp_path / "adapter"
    lora_dir.mkdir()
    with open(lora_dir / "adapter_config.json", "w") as f:
        json.dump({"lora_alpha": 16, "r": 2}, f)
    torch.save(adapter, lora_dir / "adapter_model.bin")

    out = merge_peft_adapter(sd_base, str(lora_dir))
    got = np.asarray(out["model.layers.0.self_attn.q_proj.weight"])
    np.testing.assert_allclose(got, base_w + (16 / 2) * (b @ a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["lm_head.weight"]), new_head)


def test_build_ref_index_cli(tmp_path, monkeypatch, data_root, capsys):  # noqa: F811
    out = str(tmp_path / "samples.json")
    _run_tool("build_ref_index.py",
              ["--image_root", os.path.join(data_root, "coco/train2017"),
               "--json_file",
               os.path.join(data_root,
                            "coco/annotations/instances_train2017.json"),
               "--out", out], monkeypatch)
    assert os.path.exists(out)
    assert "wrote" in capsys.readouterr().out
