import functools, numpy as np, jax
import jax.numpy as jnp
from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.train import lora as lora_mod
from anyref_tpu.train import step as step_mod
from anyref_tpu.data.collator import Collator
from anyref_tpu.tokenizer import AnyRefTokenizer, seg_answer, seg_question, tokenize_prompt

CFG = anyref_tiny()
expr = "the red cat"
tok = AnyRefTokenizer()
rng = np.random.default_rng(0)
col_t = Collator(tok, CFG, train=True)
inst = {
    "clip_image": rng.standard_normal((3, 224, 224)).astype(np.float32),
    "sam_image": rng.standard_normal((3, CFG.sam.image_size, CFG.sam.image_size)).astype(np.float32),
    "sam_resized_size": (CFG.sam.image_size, CFG.sam.image_size),
    "question": seg_question(expr), "answer": seg_answer(expr),
    "gt_masks": (rng.random((1, 48, 64)) > 0.5).astype(np.uint8),
    "height": 48, "width": 64, "file_name": "x.jpg",
}
tbatch = step_mod.device_batch(col_t([inst, inst]))
params = anyref.init(jax.random.key(0), CFG, dtype=jnp.float32)
lora_cfg = lora_mod.LoraConfig()
opt = step_mod.make_optimizer(lr=3e-3, warmup=2, total_steps=1000)
state, frozen = step_mod.init_state(jax.random.key(1), params, lora_cfg, opt)
train_step = jax.jit(step_mod.make_train_step(CFG, lora_cfg, opt, remat=False))
target = tok.encode(seg_answer(expr))
print("target:", target, tok.decode(target), flush=True)
mnt = len(target) + 2
gbatch = {"input_ids": jnp.asarray(np.asarray(tokenize_prompt(tok, seg_question(expr)), np.int32)[None]),
          "clip_images": jnp.asarray(inst["clip_image"][None]),
          "sam_images": jnp.asarray(inst["sam_image"][None])}
gen = jax.jit(functools.partial(anyref.generate, max_new_tokens=mnt), static_argnums=(1,))

def merged(state):
    p = lora_mod.merge_params(state.dense, frozen)
    return {**p, "llama": lora_mod.apply(p["llama"], state.lora, lora_cfg)}

for i in range(400):
    state, m = train_step(state, frozen, tbatch)
    if i % 25 == 24:
        out = gen(merged(state), CFG, gbatch)
        ids = [t for t in np.asarray(out.output_ids)[0].tolist() if t != 2]
        print(f"step {i+1} loss {float(m['loss']):.3f} lm {float(m['lm_loss']):.3f} ids {ids}", flush=True)
        if ids == target:
            print("CONVERGED", flush=True)
            break
