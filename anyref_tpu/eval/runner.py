"""Shared eval predictor: prompt batch -> generated ids + original-size mask
logits.

Structure mirrors the reference eval scripts' inner loop
(eval_referseg.py:122-215) with the TPU split: everything static-shape runs
in one jitted ``generate`` (prefill + SAM encoder dispatched together so XLA
overlaps them, decode scan, batched mask decode, canvas upscale); the
variable-shape tail (crop padded canvas, resize to each image's original
size) runs on host via the same exact-bilinear ops.

Prompt lengths are bucketed to bound recompiles (one compile per bucket).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SAM_PIXEL_MEAN, SAM_PIXEL_STD, AnyRefConfig
from ..models import anyref, clip_vit
from ..ops.resize import postprocess_low_res_np


def _sam_normalize_device(x_u8: jax.Array, resized_sizes: jax.Array):
    """Device-side half of the uint8 serving path (preprocess_sam_u8_np):
    normalize uint8 pixels and re-zero the pad region beyond each row's
    resized extent — exactly the host pipeline's normalize-then-pad order
    (reference segment_anything/modeling/sam.py preprocess)."""
    S = x_u8.shape[-1]
    mean = jnp.asarray(SAM_PIXEL_MEAN, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(SAM_PIXEL_STD, jnp.float32).reshape(1, 3, 1, 1)
    x = (x_u8.astype(jnp.float32) - mean) / std
    nh = resized_sizes[:, 0].reshape(-1, 1, 1, 1)
    nw = resized_sizes[:, 1].reshape(-1, 1, 1, 1)
    row = jnp.arange(S).reshape(1, 1, S, 1)
    col = jnp.arange(S).reshape(1, 1, 1, S)
    return jnp.where((row < nh) & (col < nw), x, 0.0)


def _single_device(params) -> bool:
    """True when the param tree lives on one device (no mesh sharding)."""
    leaf = jax.tree.leaves(params["llama"]["layers"][0])[0]
    try:
        return len(leaf.sharding.device_set) <= 1
    except AttributeError:  # non-committed / numpy leaves
        return True


class Predictor:
    def __init__(self, params, cfg: AnyRefConfig,
                 max_new_tokens: Optional[int] = None,
                 prompt_buckets=(129, 193, 257, 385, 513),
                 batch_buckets=(1, 2, 4, 8),
                 speculative: bool = False,
                 draft_len: Optional[int] = None,
                 max_accept: Optional[int] = None,
                 force_accept: bool = False,
                 mask_fetch_dtype: str = "float32",
                 fetch_segs: Optional[int] = None):
        # buckets = 1 (mod 128): +255 image expansion lands prefill on
        # flash-aligned lengths (384/448/512/640/768). Batch sizes also
        # bucket (pad with dummy rows) so a serving queue never triggers a
        # fresh compile per distinct batch size.
        leaves = jax.tree.leaves(params)
        needs_put = bool(leaves) and not isinstance(leaves[0], jax.Array)
        # drop the flat leaf list NOW: it strong-references every original
        # weight, and holding it across the serving-layout conversion below
        # would pin the untransposed 13 GiB decoder alive while the
        # transposed copy is built -> RESOURCE_EXHAUSTED at 7B on a 16 GiB
        # chip (the conversion frees weight-by-weight precisely so peak HBM
        # stays within one extra projection)
        del leaves
        if needs_put:
            # checkpoint-loaded trees arrive as HOST numpy (load_params's
            # topology-independent restore); commit once, or jit re-uploads
            # the full weight tree on EVERY predict call (~15 GB/query at 7B)
            params = jax.device_put(params)
        self.params = params
        self.cfg = cfg
        self.mnt = max_new_tokens or cfg.max_new_tokens
        self.buckets = sorted(prompt_buckets)
        self.batch_buckets = sorted(batch_buckets)
        self.speculative = speculative
        # speculative knobs (None = anyref.generate defaults); max_accept
        # caps accepted tokens per verify pass — the bench's acceptance-floor
        # sweep runs through the same serving machinery it measures
        self.draft_len = draft_len
        self.max_accept = max_accept
        # bench-ONLY (anyref._speculative_decode): accept exactly max_accept
        # drafts per pass regardless of verification — output is the draft
        # stream, not greedy. Never set on an eval/production path.
        self.force_accept = force_accept
        # serving sets bfloat16: halves the device->host mask readback on the
        # tunnel (the host postprocess upcasts; one bf16 ulp ~0.03 on the
        # logit scale, far inside the sigmoid>0.5 decision margin). Eval
        # keeps float32 so metric numerics are unchanged.
        self.mask_fetch_dtype = jnp.dtype(mask_fetch_dtype)
        # serving fetches only the first fetch_segs mask slots: referring
        # answers carry one [SEG] (reference answer templates emit exactly
        # one, utils/coco_instance.py conversation forms), while the full
        # [B, max_seg_per_sample, 256, 256] readback is 8x the bytes over
        # the serving tunnel. Eval keeps all slots (None).
        self.fetch_segs = fetch_segs
        if speculative and _single_device(params):
            # Serving-layout conversion (transposed + fused decoder weights)
            # CONSUMES the caller's param tree: it rewrites the nested layer
            # dicts in place, weight by weight, because a copy would briefly
            # double the 13 GiB decoder and OOM a 16 GiB chip. Only applied
            # to single-device params: the fused qkv concat would be built
            # eagerly outside any sharding constraint, and Megatron TP needs
            # the per-projection head layout anyway — sharded speculative
            # serving runs on the plain layout (llama.decode_chunk handles
            # both).
            from ..models import llama as llama_mod
            self.params["llama"] = llama_mod.fuse_for_serving(
                llama_mod.transpose_for_serving(self.params["llama"]))
        if not _single_device(params):
            # multi-device params: register the mesh so every Pallas dispatch
            # site shard_map-wraps its kernel (Mosaic custom calls cannot be
            # GSPMD-auto-partitioned — ops/flash.set_kernel_mesh). Process-
            # global by design: tracing happens lazily on the serving device
            # loop's thread, not here.
            from ..ops import flash as _flash
            leaf = jax.tree.leaves(params["llama"]["layers"][0])[0]
            _flash.set_kernel_mesh(leaf.sharding.mesh)
        self._jitted = {}
        self.decode_passes_total = 0
        self.completed_batches = 0
        # wire accounting: bytes staged host->device per predict_async and
        # fetched device->host per complete — lets the serving bench RECORD
        # the per-query wire cost (the axon tunnel moves ~30 MB/s, so these
        # bytes, not host work, bound the measured server path; on real
        # PCIe they are sub-ms — VERDICT r4 #1 attribution)
        self.h2d_bytes_total = 0
        self.d2h_bytes_total = 0

    def _fn(self, keyset):
        if keyset not in self._jitted:
            # batched speculative: rows advance by the minimum accepted
            # length per pass (lossless lockstep, anyref._speculative_decode)
            spec = self.speculative
            kw = {}
            if spec and self.draft_len is not None:
                kw["draft_len"] = self.draft_len
            if spec and self.max_accept is not None:
                kw["max_accept"] = self.max_accept
                if self.force_accept:
                    kw["force_accept"] = True
            low_dtype = self.mask_fetch_dtype

            def run(params, cfg, batch):
                # uint8 images (serving fast path): normalize on device —
                # dtype checks are static under jit, so the float pipeline
                # compiles to exactly the pre-existing program
                batch = dict(batch)
                rs = batch.pop("sam_resized_sizes", None)
                if batch["sam_images"].dtype == jnp.uint8:
                    batch["sam_images"] = _sam_normalize_device(
                        batch["sam_images"], rs)
                for k in ("clip_images", "ref_images"):
                    if k in batch and batch[k].dtype == jnp.uint8:
                        batch[k] = clip_vit.normalize_pixels(
                            batch[k].astype(jnp.float32))
                out = anyref.generate(params, cfg, batch,
                                      max_new_tokens=self.mnt,
                                      speculative=spec, **kw)
                # return ONLY what complete() fetches: XLA dead-code
                # eliminates the rest, and the d2h mask readback can ride
                # the tunnel at the caller-chosen precision/slot count
                low = out.low_res_masks
                if self.fetch_segs is not None:
                    low = low[:, :self.fetch_segs]
                # pack ids + seg_valid + decode_passes into ONE int32 array:
                # each d2h readback pays a tunnel round-trip on top of its
                # bytes, so three small fetches per batch cost ~3 RTTs where
                # one does — and the pass count (the speculative-acceptance
                # diagnostic) rides along for free
                B = out.output_ids.shape[0]
                meta = jnp.concatenate([
                    out.output_ids.astype(jnp.int32),
                    out.seg_valid.astype(jnp.int32),
                    jnp.broadcast_to(
                        out.decode_passes.astype(jnp.int32).reshape(1, 1),
                        (B, 1)),
                ], axis=1)
                return meta, low.astype(low_dtype)

            self._jitted[keyset] = jax.jit(run, static_argnums=(1,))
        return self._jitted[keyset]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, batch: Dict[str, np.ndarray]):
        """batch: collator output (prompt mode). Returns
        (output_ids [B, mnt], masks: list of [n_seg, H, W] logits or None)."""
        return self.complete(self.predict_async(batch))

    def predict_async(self, batch: Dict[str, np.ndarray]):
        """Upload + dispatch only; returns an opaque handle for complete().

        JAX dispatch is async, so the caller can dispatch batch N+1 while
        N's program runs and its results are fetched — the serving device
        loop uses this to hide device->host fetch time and the tunnel's
        slow-dispatch windows (BASELINE.md chip-health section) behind the
        next program's device time, the same 2-deep pipelining bench.py
        uses for the device-program metric."""
        plen = int(batch["prompt_lens"].max())
        bucket = self._bucket(plen)
        ids = batch["input_ids"]
        B = ids.shape[0]
        BB = next((b for b in self.batch_buckets if b >= B),
                  self.batch_buckets[-1])
        BB = max(BB, B)
        # LEFT-pad prompts into the bucket (generate masks pad keys and
        # shifts rope positions; reference left_pad mode); pad the batch dim
        # with copies of row 0 (dropped from outputs).
        left = np.zeros((BB, bucket), ids.dtype)
        for b in range(B):
            n = min(int(batch["prompt_lens"][b]), bucket)
            left[b, bucket - n:] = ids[b, :n]
        left[B:] = left[0]

        def pad_rows(x):
            if x.shape[0] == BB:
                return x
            reps = np.repeat(x[:1], BB - x.shape[0], axis=0)
            return np.concatenate([x, reps], axis=0)

        jbatch = {
            "input_ids": jnp.asarray(left),
            "clip_images": jnp.asarray(pad_rows(batch["clip_images"])),
            "sam_images": jnp.asarray(pad_rows(batch["sam_images"])),
        }
        for k in ("ref_images", "ref_valid", "audio_mels", "audio_valid",
                  "roi_boxes"):
            if k in batch:
                jbatch[k] = jnp.asarray(pad_rows(batch[k]))
        if batch["sam_images"].dtype == np.uint8:
            # device-side normalize needs each row's valid extent to re-zero
            # the pad region (host normalize-then-pad order)
            jbatch["sam_resized_sizes"] = jnp.asarray(
                pad_rows(np.asarray(batch["sam_resized_sizes"], np.int32)))
        keyset = (bucket, BB,
                  tuple(sorted((k, str(v.dtype)) for k, v in jbatch.items())))
        self.h2d_bytes_total += sum(int(v.nbytes) for v in jbatch.values())
        out = self._fn(keyset)(self.params, self.cfg, jbatch)
        return out, batch, B

    def complete(self, handle):
        """Fetch + host postprocess for a predict_async handle."""
        (meta, low_res), batch, B = handle
        self.d2h_bytes_total += int(meta.nbytes) + int(low_res.nbytes)
        meta_np = np.asarray(meta)
        output_ids = meta_np[:B, :self.mnt]
        seg_valid = meta_np[:B, self.mnt:-1]
        # speculative-acceptance diagnostic: decode weight streams this
        # batch (tokens/pass = mnt / passes); serving reports the average
        self.decode_passes_total += int(meta_np[0, -1])
        self.completed_batches += 1
        low = np.asarray(low_res).astype(np.float32)[:B]
        masks: List[Optional[np.ndarray]] = []
        for b in range(low.shape[0]):
            # clamp to the fetched slot count (fetch_segs may trim the slots)
            n = min(int(seg_valid[b].sum()), low.shape[1])
            if n == 0:
                masks.append(None)
                continue
            meta = batch["_meta"][b]
            h, w = int(meta["height"]), int(meta["width"])
            rs = tuple(int(v) for v in batch["sam_resized_sizes"][b])
            masks.append(postprocess_low_res_np(
                low[b, :n], self.cfg.sam.image_size, rs, (h, w)))
        return output_ids, masks


def binary_mask(logits: Optional[np.ndarray], h: int, w: int) -> np.ndarray:
    """sigmoid>0.5 binarize; None (no [SEG] emitted) -> zero mask, mirroring
    the reference fallback (eval_referseg.py:190-195, anyref.py:763-765)."""
    if logits is None:
        return np.zeros((h, w), np.int32)
    return (1.0 / (1.0 + np.exp(-logits[0])) > 0.5).astype(np.int32)
