"""Checkpoint save/load.

Replaces the reference's HF Trainer + PEFT checkpoint flow
(train.sh --save_steps 100, PeftModel.from_pretrained resume, merge_lora.py):
  * orbax for the native format (params / train state / step);
  * assemble_pretrained() builds a full AnyRef param tree from the original
    torch artifacts (LLaVA HF dir, SAM .pth, ImageBind .pth) when present —
    the same checkpoint set the reference loads (train.py:316-333);
  * LoRA adapters save/restore with the train state and merge offline for
    deployment (merge_lora.py semantics via train.lora.merge).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .config import AnyRefConfig


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params) -> None:
    _checkpointer().save(os.path.abspath(path), params, force=True)


def _restore_numpy(path: str):
    """Restore a checkpoint as host numpy arrays, independent of the
    topology/platform it was saved on. A bare ``restore`` reconstructs the
    SAVED shardings, which fails whenever the restoring process runs a
    different platform or device set (params saved by a CPU process opened
    in a TPU serving process, a pod-sharded train state opened single-chip,
    ...). Restoring to host and letting jit/pjit place the arrays at first
    call is the behavior every caller here actually wants."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    apath = os.path.abspath(path)
    try:
        meta = getattr(ckptr.metadata(apath), "item_metadata", None)
    except Exception:  # pre-metadata orbax layouts
        meta = None
    if meta is None:  # no metadata: fall back to the plain restore
        return ckptr.restore(apath)
    is_leaf = lambda x: hasattr(x, "shape")  # noqa: E731  Array/ScalarMetadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta,
        is_leaf=is_leaf)
    return ckptr.restore(apath, restore_args=restore_args)


def load_params(path: str):
    return _restore_numpy(path)


def save_train_state(ckpt_dir: str, step: int, state, keep: int = 3) -> None:
    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint-{step}")
    _checkpointer().save(path, {"step": step, "lora": state.lora,
                                "dense": state.dense,
                                "opt_state": state.opt_state}, force=True)
    # prune old checkpoints
    entries = sorted(
        (int(d.split("-")[1]) for d in os.listdir(ckpt_dir)
         if d.startswith("checkpoint-")))
    for old in entries[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, f"checkpoint-{old}"),
                      ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(
        (int(d.split("-")[1]) for d in os.listdir(ckpt_dir)
         if d.startswith("checkpoint-")))
    if not entries:
        return None
    return os.path.join(ckpt_dir, f"checkpoint-{entries[-1]}")


def _rebuild_by_name(template, restored):
    """Recursively rebuild ``restored`` (orbax's plain dict/list containers)
    into the container types of ``template``, matching children BY NAME
    (namedtuple fields / dict keys), never by flatten order — order-based
    pairing silently permutes same-shaped leaves (e.g. Adam mu/nu) whenever
    a state's field order differs from orbax's sorted key order."""
    if template is None:
        return None
    if restored is None:
        # orbax collapses leafless containers (optax EmptyState, empty
        # tuples) to None; reuse the template's empty container. A template
        # with real array leaves getting None back is a genuine mismatch.
        if jax.tree.leaves(template):
            raise ValueError(
                f"checkpoint missing data for template node "
                f"{type(template).__name__}")
        return template
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        # namedtuple (optax states): orbax restores these as dicts keyed by
        # field name (or as sequences for older layouts)
        if isinstance(restored, dict):
            missing = [f for f in template._fields if f not in restored]
            if missing:
                raise ValueError(
                    f"checkpoint missing fields {missing} for "
                    f"{type(template).__name__}")
            kids = [_rebuild_by_name(getattr(template, f), restored[f])
                    for f in template._fields]
        else:
            if len(restored) != len(template):
                raise ValueError(
                    f"checkpoint {type(template).__name__} length "
                    f"{len(restored)} != template {len(template)}")
            kids = [_rebuild_by_name(t, r)
                    for t, r in zip(template, restored)]
        return type(template)(*kids)
    if isinstance(template, dict):
        missing = [k for k in template if k not in restored]
        if missing:
            raise ValueError(f"checkpoint missing keys {missing}")
        return {k: _rebuild_by_name(v, restored[k])
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        if isinstance(restored, dict):
            try:
                restored = [restored[str(i)] for i in range(len(template))]
            except KeyError as e:
                raise ValueError(
                    f"checkpoint missing sequence index {e} for template "
                    f"of length {len(template)}") from e
        if len(restored) != len(template):
            # order-based zip would silently truncate a layer-count mismatch
            raise ValueError(
                f"checkpoint sequence length {len(restored)} != template "
                f"length {len(template)}")
        return type(template)(
            _rebuild_by_name(t, r) for t, r in zip(template, restored))
    return restored


def restore_train_state(path: str, template=None):
    """``template``: a pytree with the target container types (optax states
    are namedtuples; orbax alone would restore plain dicts). Children are
    matched by name, not flatten order."""
    restored = _restore_numpy(path)
    if template is None:
        return restored
    return _rebuild_by_name(template, restored)


# ---------------------------------------------------------------------------
# torch artifact loading (conversion entry point)
# ---------------------------------------------------------------------------
def _load_torch_state_dict(path: str) -> dict:
    """Load a .pth / .bin / .safetensors file into {name: np.ndarray}."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    # torch bf16 tensors reject .numpy() ("unsupported ScalarType"); route
    # them through fp32 (exact: bf16 -> fp32 widening loses nothing)
    return {k: (v.float() if v.dtype == torch.bfloat16 else v).numpy()
            for k, v in sd.items()}


def _load_hf_dir(path: str) -> dict:
    """Merge all weight files in an HF model directory.

    HF-Trainer outputs ship non-weight pickles alongside the shards
    (training_args.bin — torch.load(weights_only=True) rejects it), but a
    name whitelist would silently drop standalone weight files like LLaVA's
    mm_projector.bin. So: skip the known non-weight names, and warn-skip
    any .bin that still fails to load as a weights-only state dict instead
    of aborting the whole assembly."""
    skip = {"training_args.bin", "optimizer.bin", "scheduler.bin"}
    out = {}
    for name in sorted(os.listdir(path)):
        if name in skip or "index" in name:
            continue
        if not name.endswith((".safetensors", ".bin")):
            continue
        try:
            out.update(_load_torch_state_dict(os.path.join(path, name)))
        except Exception as e:
            import sys
            sys.stderr.write(f"WARNING: skipping non-weight file "
                             f"{name}: {str(e)[:200]}\n")
    return out


def assemble_pretrained(cfg: AnyRefConfig, *,
                        llava_dir: Optional[str] = None,
                        sam_ckpt: Optional[str] = None,
                        imagebind_ckpt: Optional[str] = None,
                        clip_dir: Optional[str] = None,
                        dtype=None, seed: int = 0) -> dict:
    """Build a full param tree: converted pretrained weights where the
    corresponding artifact exists, fresh init elsewhere (the reference loads
    SAM non-strict and wraps ImageBind in try/FileNotFound — anyref.py:149-154,
    build_sam.py:104-108; same permissiveness here)."""
    import jax.numpy as jnp

    from . import convert
    from .models import anyref as anyref_mod

    dtype = dtype or jnp.bfloat16
    params = anyref_mod.init(jax.random.key(seed), cfg, dtype=dtype)

    if sam_ckpt and os.path.exists(sam_ckpt):
        params["sam"] = convert.convert_sam(_load_torch_state_dict(sam_ckpt),
                                            cfg.sam, dtype=dtype)
    if imagebind_ckpt and os.path.exists(imagebind_ckpt) and cfg.audio:
        params["audio_encoder"] = convert.convert_imagebind_audio(
            _load_torch_state_dict(imagebind_ckpt), cfg.audio, dtype=dtype)
    if llava_dir and os.path.isdir(llava_dir):
        sd = _load_hf_dir(llava_dir)
        params["llama"] = convert.convert_llama(sd, cfg.llama, dtype=dtype)
        try:
            params["mm_projector"] = convert.convert_mm_projector(sd, dtype=dtype)
        except KeyError:
            pass
        # CLIP tower may be embedded in the LLaVA dir or provided separately
        tower = {k.split("vision_tower.", 1)[1]: v for k, v in sd.items()
                 if "vision_tower." in k}
        if tower:
            params["clip"] = convert.convert_clip_vision(tower, cfg.clip,
                                                         dtype=dtype)
        # a fully-merged reference checkpoint (merge_lora.py output) carries
        # SAM, the ImageBind audio branch and the AnyRef heads too
        sam_sd = {k.split("model.visual_model.", 1)[1]: v
                  for k, v in sd.items() if k.startswith("model.visual_model.")}
        if sam_sd:
            params["sam"] = convert.convert_sam(sam_sd, cfg.sam, dtype=dtype)
        ib_sd = {k.split("model.audio_encoder.", 1)[1]: v
                 for k, v in sd.items() if k.startswith("model.audio_encoder.")}
        if ib_sd and cfg.audio:
            params["audio_encoder"] = convert.convert_imagebind_audio(
                ib_sd, cfg.audio, dtype=dtype)
        params.update(convert.convert_anyref_heads(sd, dtype=dtype))
    if clip_dir and os.path.isdir(clip_dir):
        sd = _load_hf_dir(clip_dir)
        params["clip"] = convert.convert_clip_vision(sd, cfg.clip, dtype=dtype)
    return params
