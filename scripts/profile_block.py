"""Per-piece timing of one Hiera block at each stage geometry @1024 px.

Breaks a MultiScaleBlock into: layernorm, qkv matmul, window partition
(transpose), attention, window unpartition, proj, mlp — to see whether the
sub-peak stage MFU is matmul- or layout-bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._timing import timed, N1, N2  # noqa: E402

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.core.hiera import _block_apply
from medsam2_tpu.ops.attention import attention


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.bfloat16
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    # pick a representative non-transition block per stage
    reps = []
    seen = set()
    for i, spec in enumerate(schedule):
        key = (spec["dim"], spec["window_size"])
        if spec["dim"] == spec["dim_out"] and key not in seen:
            seen.add(key)
            reps.append(i)

    rng = np.random.default_rng(0)
    Hs = S // 4
    for i in reps:
        spec = schedule[i]
        dim = spec["dim"]
        ws = spec["window_size"]
        nh = spec["num_heads"]
        # feature-map extent at this block = S/4 halved per prior q-pool
        pools = sum(1 for s in schedule[:i] if s["q_stride"] is not None)
        H = W = (S // 4) >> pools
        bp = trunk["blocks"][i]
        x0 = jnp.asarray(rng.standard_normal((1, H, W, dim)), dtype)
        print(f"\nblock {i}: dim={dim} heads={nh} ws={ws} fm={H}x{W}", flush=True)

        def dep(c, x=x0):
            return x + c.astype(x.dtype) * 0

        t = timed(lambda c: jnp.sum(_block_apply(bp, dep(c), spec)).astype(jnp.float32),
                  jnp.float32(0))
        print(f"  full block              {t*1e3:7.3f} ms", flush=True)

        t = timed(lambda c: jnp.sum(
            layers.layer_norm_apply(bp["norm1"], dep(c), eps=1e-6)).astype(jnp.float32),
            jnp.float32(0))
        print(f"  layernorm               {t*1e3:7.3f} ms", flush=True)

        def qkv_only(c):
            x = dep(c)
            return jnp.sum(layers.linear_apply(
                bp["attn"]["qkv"], x.reshape(1, H * W, dim))).astype(jnp.float32)
        t = timed(qkv_only, jnp.float32(0))
        print(f"  qkv matmul              {t*1e3:7.3f} ms", flush=True)

        if ws > 0:
            def part_only(c):
                w, _ = layers.window_partition(dep(c), ws)
                return jnp.sum(w).astype(jnp.float32)
            t = timed(part_only, jnp.float32(0))
            print(f"  window_partition        {t*1e3:7.3f} ms", flush=True)

            def part_round(c):
                w, phw = layers.window_partition(dep(c), ws)
                y = layers.window_unpartition(w * 1.000001, ws, phw, (H, W))
                return jnp.sum(y).astype(jnp.float32)
            t = timed(part_round, jnp.float32(0))
            print(f"  partition+unpartition   {t*1e3:7.3f} ms", flush=True)

        d = dim // nh
        if ws > 0:
            G = ((H + ws - 1) // ws) * ((W + ws - 1) // ws)
            n = ws * ws
        else:
            G, n = 1, H * W
        q = jnp.asarray(rng.standard_normal((G, nh, n, d)), dtype)
        k_ = jnp.asarray(rng.standard_normal((G, nh, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((G, nh, n, d)), dtype)

        def attn_only(c):
            return jnp.sum(attention(q + c.astype(dtype) * 0, k_, v)).astype(jnp.float32)
        t = timed(attn_only, jnp.float32(0))
        print(f"  attention ({G}x{n}x{d})   {t*1e3:7.3f} ms", flush=True)

        def mlp_only(c):
            x = layers.layer_norm_apply(bp["norm2"], dep(c), eps=1e-6)
            return jnp.sum(layers.mlp_apply(
                bp["mlp"], x, activation=layers.gelu)).astype(jnp.float32)
        t = timed(mlp_only, jnp.float32(0))
        print(f"  ln2+mlp                 {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
