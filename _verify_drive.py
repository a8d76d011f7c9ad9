import os
import numpy as np, jax
import jax.numpy as jnp
from anyref_tpu.config import anyref_tiny
from anyref_tpu.models import anyref
from anyref_tpu.tokenizer import AnyRefTokenizer, seg_question
from anyref_tpu.data.base import SegDataset
from anyref_tpu.data.collator import Collator
from anyref_tpu.eval.runner import Predictor

cfg = anyref_tiny()
params = anyref.init(jax.random.PRNGKey(0), cfg)
tok = AnyRefTokenizer()
helper = SegDataset(cfg)
coll = Collator(tok, cfg, train=False)
rng = np.random.default_rng(0)
img = (rng.random((180, 240, 3)) * 255).astype(np.uint8)
samples = [helper.make_sample(img, seg_question("the red cat"), None, None),
           helper.make_sample(img, seg_question("a longer referring expression about a dog"), None, None)]
pred = Predictor(params, cfg, max_new_tokens=5)
ids2, _ = pred.predict(coll(samples))
ids_single = [pred.predict(coll([s]))[0][0] for s in samples]
for i in range(2):
    a, b = np.asarray(ids2[i]), np.asarray(ids_single[i])
    assert (a == b).all() and (a != 0).any(), (i, a, b)
print("flow1 batched-generate OK", flush=True)

from anyref_tpu.models import sam as sam_mod
x = jnp.asarray(rng.standard_normal((1, 3, cfg.sam.image_size, cfg.sam.image_size)), jnp.float32)
os.environ["ANYREF_FUSED_WINDOW_BLOCK"] = "1"
e1 = sam_mod.encode_image(params["sam"], x, cfg.sam)
os.environ["ANYREF_FUSED_WINDOW_BLOCK"] = "0"
e0 = sam_mod.encode_image(params["sam"], x, cfg.sam)
d = float(jnp.max(jnp.abs(e1.astype(jnp.float32) - e0.astype(jnp.float32))))
assert d < 2e-3, d
print("flow2 fused-vs-unfused encode max diff", d, "OK", flush=True)

from anyref_tpu.train import lora as lora_mod
from anyref_tpu.train.step import (init_state, make_train_step, make_optimizer,
                                   device_batch)
opt = make_optimizer()
state, frozen = init_state(jax.random.PRNGKey(1), params, lora_mod.LoraConfig(), opt)
tcoll = Collator(tok, cfg, train=True)
mask = np.zeros((1, 180, 240), np.float32); mask[0, 40:120, 60:200] = 1
tb = tcoll([helper.make_sample(img, seg_question("the red cat"), "It is [SEG].", mask)])
step = make_train_step(cfg, lora_mod.LoraConfig(), opt)
_, metrics = step(state, frozen, device_batch(tb))
assert np.isfinite(float(metrics["loss"]))
print("flow3 train-step OK loss", float(metrics["loss"]), flush=True)
print("VERIFY PASS", flush=True)
