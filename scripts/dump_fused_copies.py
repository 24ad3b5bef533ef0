"""Print the full HLO 'copy' instructions (with layouts) of the fused-b2
prefix graph, to see whether the extra [1,256,256,96] copies are
layout-changing (run on the TPU backend; compile is server-cached)."""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model, layers
from medsam2_tpu.core import hiera
from medsam2_tpu.core.hiera import _block_apply, _get_pos_embed, _patch_embed_wfold

S = 1024
cfg = get_config("sam2_hiera_t", image_size=S)
params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
trunk = params["image_encoder"]["trunk"]
schedule = cfg.trunk.block_schedule()
rng = np.random.default_rng(0)
frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
pe = _get_pos_embed(trunk, S // 4, S // 4)

def fused_b2(i, bp, x, s):
    if i != 2:
        return _block_apply(bp, x, s)
    old = hiera._FUSED_WINDOW_SIZES
    hiera._FUSED_WINDOW_SIZES = (4,)
    try:
        return _block_apply(bp, x, s)
    finally:
        hiera._FUSED_WINDOW_SIZES = old

def fn(c):
    x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                           frame + c.astype(frame.dtype) * 0)
    x = x + pe.astype(x.dtype)
    for i in range(4):
        x = fused_b2(i, trunk["blocks"][i], x, schedule[i])
    return jnp.sum(x).astype(jnp.float32)

@jax.jit
def run(c):
    def body(c, _):
        return fn(c), 0
    c, _ = jax.lax.scan(body, c, None, length=8)
    return c

txt = run.lower(jnp.float32(0)).compile().as_text()
for line in txt.splitlines():
    ls = line.strip()
    if re.search(r"= \w+\[1,256,256,96\]", ls) or (" copy(" in ls and "256,256" in ls):
        print(ls[:240])
