#!/usr/bin/env python
"""Stage-level performance probe on real TPU hardware.

Measures where each serving query's time goes (SAM encode / CLIP / prefill /
decode weight pass / logits / mask decode) and the cost of speculative verify
chunks vs. single-token decode, to drive the >=5 q/s/chip work with data
rather than guesses. Prints one JSON object per probe.

Usage: python tools/perf_probe.py [stage ...]
  stages: encoders prefill decode chunk generate (default: all)
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(out):
    # under the axon tunnel block_until_ready can return before device
    # completion; a host readback of one element is the reliable fence
    leaf = None
    import jax
    for x in jax.tree.leaves(out):
        if hasattr(x, "shape"):
            leaf = x
            break
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / n


def main():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        return
    stages = set(sys.argv[1:]) or {"encoders", "prefill", "decode", "chunk",
                                   "generate"}
    import jax
    import jax.numpy as jnp

    from anyref_tpu.config import anyref_7b
    from anyref_tpu.models import anyref, llama as llama_mod
    from anyref_tpu.models import sam as sam_mod

    from bench import build, make_batch

    cfg, params = build("7b")
    batch = make_batch(cfg)
    emit = lambda **kw: print(json.dumps(kw), flush=True)

    if "encoders" in stages:
        sam_t = timeit(jax.jit(functools.partial(
            sam_mod.encode_image, cfg=cfg.sam)), params["sam"],
            batch["sam_images"], n=4)
        emit(probe="sam_encode_ms", value=round(sam_t * 1e3, 2))
        clip_fn = jax.jit(lambda p, im: anyref.encode_clip_images(p, cfg, im))
        clip_t = timeit(clip_fn, params, batch["clip_images"], n=8)
        emit(probe="clip_encode_ms", value=round(clip_t * 1e3, 2))

    Lp = batch["input_ids"].shape[1] + cfg.clip.num_patches - 1
    D = cfg.llama.hidden_size
    key = jax.random.key(0)
    embeds = jax.random.normal(key, (1, Lp, D), jnp.bfloat16)
    cache = llama_mod.init_cache(cfg.llama, 1, Lp + 160, dtype=jnp.bfloat16)

    pf = jax.jit(functools.partial(llama_mod.prefill, cfg=cfg.llama))
    if "prefill" in stages:
        t = timeit(lambda: pf(params["llama"], embeds=embeds, cache=cache),
                   n=4)
        emit(probe=f"prefill{Lp}_ms", value=round(t * 1e3, 2))

    def steps(pl, cache, n):
        def body(c, _):
            cache, tok = c
            emb = llama_mod.embed(pl, tok[:, None], dtype=jnp.bfloat16)
            h, cache = llama_mod.decode_step(pl, cfg.llama, emb,
                                             jnp.int32(Lp), cache)
            lg = llama_mod.logits(pl, h[:, 0])
            return (cache, jnp.argmax(lg, -1).astype(jnp.int32)), ()
        (cache, tok), _ = jax.lax.scan(body, (cache, jnp.zeros((1,), jnp.int32)),
                                       None, length=n)
        return tok

    if "decode" in stages:
        f = jax.jit(functools.partial(steps, n=16))
        t = timeit(lambda: f(params["llama"], cache), n=3) / 16
        emit(probe="decode_step_ms", value=round(t * 1e3, 2))

    # serving transforms IN PLACE, measured in sequence: 16 GiB HBM cannot
    # hold two 13.5 GiB decoder variants at once, so there is exactly one
    # resident copy and the plain probes above must run first (the draft0
    # generate probe below therefore runs on the fused layout too)
    params_t = llama_mod.transpose_for_serving(params["llama"])

    if "decode" in stages:
        f = jax.jit(functools.partial(steps, n=16))
        t = timeit(lambda: f(params_t, cache), n=3) / 16
        emit(probe="decode_step_transposed_ms", value=round(t * 1e3, 2))

    params_f = llama_mod.fuse_for_serving(params_t)

    if "prefill" in stages:
        t = timeit(lambda: pf(params_f, embeds=embeds, cache=cache), n=4)
        emit(probe=f"prefill{Lp}_fused_ms", value=round(t * 1e3, 2))
    if "decode" in stages:
        f = jax.jit(functools.partial(steps, n=16))
        t = timeit(lambda: f(params_f, cache), n=3) / 16
        emit(probe="decode_step_fused_ms", value=round(t * 1e3, 2))

    if "chunk" in stages:
        for G in (5, 9, 17, 25, 33):
            def chunk(pl, cache, G=G):
                emb = jax.random.normal(key, (1, G, D), jnp.bfloat16)
                h, cache2 = llama_mod.decode_chunk(pl, cfg.llama, emb,
                                                   jnp.int32(Lp), cache)
                lg = llama_mod.logits(pl, h[0])
                return jnp.argmax(lg, -1)
            t = timeit(jax.jit(chunk), params_f, cache, n=6)
            emit(probe=f"verify_chunk{G}_ms", value=round(t * 1e3, 2))

    if "generate" in stages:
        for draft in (0, 4, 8, 16):
            spec = draft > 0
            pl = params_f if spec else params["llama"]
            p2 = dict(params); p2["llama"] = pl

            def run(p2, batch):
                out = anyref.generate(p2, cfg, batch, max_new_tokens=32,
                                      speculative=spec,
                                      draft_len=max(draft, 1))
                return (out.output_ids, out.decode_passes,
                        out.low_res_masks[:, :1].astype(jnp.bfloat16))
            f = jax.jit(run)
            t = timeit(f, p2, batch, n=6)
            ids, passes, _ = jax.tree.map(np.asarray, f(p2, batch))
            emit(probe=f"generate32_draft{draft}_ms", value=round(t * 1e3, 2),
                 decode_passes=int(passes),
                 qps=round(1.0 / t, 2))


if __name__ == "__main__":
    main()
