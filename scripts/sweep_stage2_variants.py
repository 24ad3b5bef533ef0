"""In-graph A/B of lowerings for the high-res Hiera blocks 0-3 @1024.

Block-level slope profile (profile_stage2.py, v5e): block0 0.572 ms,
block1 (q-pool) 1.070 ms, block2 0.491 ms — ~48 GF at 23 TF/s. The window
attentions there run at MXU-pathological shapes (seq 16-64 per window,
M=16/N=64 batched matmuls). Variants:

- base:    production _block_apply path
- packN:   packed-window XLA attention — reshape p consecutive windows into
           one [p*n] token group (contiguous reshape, no transpose), compute
           one [p*n, p*n] logit tile with a block-diagonal additive mask
           (-1e30), fp32 softmax. Exact: attention is zero across windows by
           the mask; padding rows never mix (p divides the window count).
           p is chosen so p*n ~ 128 lanes.
- fused:   ops/window_attention.py Pallas kernel on block2 (ws=4), the
           round-3 isolated winner that regressed in-graph — re-measured
           here to pin *where* the regression lives.

Each variant runs blocks 0..3 inside an 8-iter lax.scan (same context as the
encoder), slope-timed between 8- and 40-iter trip counts.

Usage: python -u scripts/sweep_stage2_variants.py [image_size] [variant ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import layers, sam2_model
from medsam2_tpu.core import hiera
from medsam2_tpu.core.hiera import _block_apply, _get_pos_embed, _patch_embed_wfold

N_SHORT, N_LONG = 8, 40


def timed(fn, carry0):
    ts = {}
    for n in (N_SHORT, N_LONG):
        @jax.jit
        def run(c, n=n):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        jax.block_until_ready(run(carry0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(carry0))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_LONG] - ts[N_SHORT]) / (N_LONG - N_SHORT)


# ---------------------------------------------------------------------------
# Packed-window attention (XLA): group p windows into one lane-filling tile
# ---------------------------------------------------------------------------


def packed_window_attention(q, k, v, pack: int):
    """q [Bn, nq, h, d], k/v [Bn, nk, h, d] per-window tensors ->
    [Bn, nq, h, d], computing attention for `pack` windows per logit tile
    with a block-diagonal mask. Exact vs per-window SDPA."""
    Bn, nq, h, d = q.shape
    nk = k.shape[1]
    G = Bn // pack
    q2 = q.reshape(G, pack * nq, h, d).transpose(0, 2, 1, 3)
    k2 = k.reshape(G, pack * nk, h, d).transpose(0, 2, 1, 3)
    v2 = v.reshape(G, pack * nk, h, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("ghqd,ghkd->ghqk", q2, k2,
                   precision=layers.PRECISION,
                   preferred_element_type=jnp.float32)
    s = s * np.float32(1.0 / np.sqrt(d))
    qi = np.arange(pack * nq) // nq
    ki = np.arange(pack * nk) // nk
    mask = (qi[:, None] == ki[None, :])
    s = jnp.where(mask, s, np.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("ghqk,ghkd->ghqd", p, v2,
                   precision=layers.PRECISION)
    o = o.transpose(0, 2, 1, 3).reshape(Bn, nq, h, d)
    return o


def _attention_block_packed(bp, x, spec, q_stride, pack: int):
    """_attention_block with packed-window SDPA (windows stay on the batch
    axis until the pack reshape, which is contiguous)."""
    B, H, W, _ = x.shape
    num_heads = spec["num_heads"]
    dim_out = spec["dim_out"]
    qkv = layers.linear_apply(bp["qkv"], x.reshape(B, H * W, -1))
    qkv = qkv.reshape(B, H * W, 3, num_heads, dim_out // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if q_stride is not None:
        q = q.reshape(B, H, W, dim_out)
        q = layers.max_pool2d(q, q_stride, q_stride)
        Hq, Wq = q.shape[1], q.shape[2]
        q = q.reshape(B, Hq * Wq, num_heads, dim_out // num_heads)
        H, W = Hq, Wq

    out = packed_window_attention(q, k, v, pack)
    out = out.reshape(B, H, W, dim_out)
    return layers.linear_apply(bp["proj"], out)


def _block_apply_packed(bp, x, spec, pack: int):
    window_size = spec["window_size"]
    q_stride = spec["q_stride"]
    dim, dim_out = spec["dim"], spec["dim_out"]

    shortcut = x
    x = layers.layer_norm_apply(bp["norm1"], x, eps=1e-6)
    if dim != dim_out:
        shortcut = layers.linear_apply(bp["proj"], x)
        if q_stride is not None:
            shortcut = layers.max_pool2d(shortcut, q_stride, q_stride)

    H, W = x.shape[1], x.shape[2]
    pad_hw = (H, W)
    if window_size > 0:
        x, pad_hw = layers.window_partition(x, window_size)

    x = _attention_block_packed(bp["attn"], x, spec, q_stride, pack)

    out_ws = window_size
    if q_stride is not None:
        out_ws = window_size // q_stride[0]
        H, W = shortcut.shape[1], shortcut.shape[2]
        pad_h = (out_ws - H % out_ws) % out_ws if out_ws > 0 else 0
        pad_w = (out_ws - W % out_ws) % out_ws if out_ws > 0 else 0
        pad_hw = (H + pad_h, W + pad_w)
    else:
        H, W = shortcut.shape[1], shortcut.shape[2]
    if window_size > 0:
        x = layers.window_unpartition(x, out_ws, pad_hw, (H, W))

    x = shortcut + x
    x = x + layers.mlp_apply(bp["mlp"],
                             layers.layer_norm_apply(bp["norm2"], x, eps=1e-6),
                             activation=layers.gelu)
    return x


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    which = sys.argv[2:] or ["base", "pack", "fused"]
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    tcfg = cfg.trunk
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)
    schedule = tcfg.block_schedule()
    NB = 4  # blocks 0..3

    # pack factor per block: fill ~128 kv lanes (n = ws^2 kv tokens/window)
    packs = {}
    for i in range(NB):
        n = schedule[i]["window_size"] ** 2
        packs[i] = max(1, 128 // n)

    def prefix(block_fn):
        def fn(c):
            x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                   frame + c.astype(frame.dtype) * 0)
            x = x + pe.astype(x.dtype)
            for i in range(NB):
                x = block_fn(i, trunk["blocks"][i], x, schedule[i])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    variants = {}
    if "base" in which:
        variants["base"] = prefix(lambda i, bp, x, s: _block_apply(bp, x, s))
    if "pack" in which:
        variants["pack(all)"] = prefix(
            lambda i, bp, x, s: _block_apply_packed(bp, x, s, packs[i]))
        variants["pack(b1-3)"] = prefix(
            lambda i, bp, x, s: (_block_apply(bp, x, s) if i == 0 else
                                 _block_apply_packed(bp, x, s, packs[i])))
    if "fused" in which:
        def fused_b2(i, bp, x, s):
            if i != 2:
                return _block_apply(bp, x, s)
            old = hiera._FUSED_WINDOW_SIZES
            hiera._FUSED_WINDOW_SIZES = (4,)
            try:
                return _block_apply(bp, x, s)
            finally:
                hiera._FUSED_WINDOW_SIZES = old
        variants["fused(b2)"] = prefix(fused_b2)

    for name, fn in variants.items():
        t = timed(fn, jnp.float32(0))
        print(f"{name:12s} blocks0-3: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and not os.environ.get("AUDIT") and not os.environ.get("BISECT"):
    main()


def audit(S=1024, which=("base", "fused")):
    """Copy census of the 8-iter prefix graphs (run with AUDIT=1)."""
    from scripts.audit_copies import copy_bytes
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)
    NB = 4

    def prefix(block_fn):
        def fn(c):
            x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                   frame + c.astype(frame.dtype) * 0)
            x = x + pe.astype(x.dtype)
            for i in range(NB):
                x = block_fn(i, trunk["blocks"][i], x, schedule[i])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    def fused_b2(i, bp, x, s):
        if i != 2:
            return _block_apply(bp, x, s)
        old = hiera._FUSED_WINDOW_SIZES
        hiera._FUSED_WINDOW_SIZES = (4,)
        try:
            return _block_apply(bp, x, s)
        finally:
            hiera._FUSED_WINDOW_SIZES = old

    fns = {"base": prefix(lambda i, bp, x, s: _block_apply(bp, x, s)),
           "fused": prefix(fused_b2)}
    for name in which:
        fn = fns[name]

        @jax.jit
        def run(c, fn=fn):
            def body(c, _):
                return fn(c), 0
            c, _ = jax.lax.scan(body, c, None, length=8)
            return c

        txt = run.lower(jnp.float32(0)).compile().as_text()
        per_shape = copy_bytes(txt)
        total = sum(b for _, b in per_shape.values())
        print(f"\n== {name}: {total/1e6:.1f} MB of copies (8 iters) ==")
        for key, (cnt, b) in sorted(per_shape.items(), key=lambda kv: -kv[1][1])[:12]:
            print(f"  {b/1e6:9.2f} MB  x{cnt:3d}  {key}")
        # also count fusion/custom-call boundaries mentioning pallas
        import re
        n_cc = len(re.findall(r"custom-call", txt))
        print(f"  custom-calls: {n_cc}")


if __name__ == "__main__" and os.environ.get("AUDIT") == "1":
    audit()
    sys.exit(0)


def bisect(S=1024):
    """Bisect the fused(b2) regression (run with BISECT=1): time block2 alone
    (constant input) xla vs fused, and blocks 0-2 prefixes, all slope-timed."""
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)
    x2 = jnp.asarray(rng.standard_normal((1, S // 8, S // 8, 192)), jnp.bfloat16)
    bp2 = trunk["blocks"][2]
    sp2 = schedule[2]

    def with_fused(f):
        def g(*a, **k):
            old = hiera._FUSED_WINDOW_SIZES
            hiera._FUSED_WINDOW_SIZES = (4,)
            try:
                return f(*a, **k)
            finally:
                hiera._FUSED_WINDOW_SIZES = old
        return g

    def prefix2(fused):
        def fn(c):
            x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                   frame + c.astype(frame.dtype) * 0)
            x = x + pe.astype(x.dtype)
            for i in range(2):
                x = _block_apply(trunk["blocks"][i], x, schedule[i])
            f = with_fused(_block_apply) if fused else _block_apply
            x = f(bp2, x, sp2)
            return jnp.sum(x).astype(jnp.float32)
        return fn

    def solo(fused):
        def fn(c):
            x = x2 + c.astype(x2.dtype) * 0
            f = with_fused(_block_apply) if fused else _block_apply
            x = f(bp2, x, sp2)
            return jnp.sum(x).astype(jnp.float32)
        return fn

    def attn_only(fused):
        from medsam2_tpu.ops.window_attention import window_attention

        def fn(c):
            x = x2 + c.astype(x2.dtype) * 0
            if fused:
                qkv = layers.linear_apply(bp2["attn"]["qkv"], x)
                out = window_attention(qkv, sp2["num_heads"], 4)
                out = layers.linear_apply(bp2["attn"]["proj"], out)
            else:
                xw, pad_hw = layers.window_partition(x, 4)
                from medsam2_tpu.core.hiera import _attention_block
                out = _attention_block(bp2["attn"], xw, sp2, None)
                out = layers.window_unpartition(out, 4, pad_hw,
                                                (x.shape[1], x.shape[2]))
            return jnp.sum(out).astype(jnp.float32)
        return fn

    for name, fn in [
        ("solo b2 xla", solo(False)), ("solo b2 fused", solo(True)),
        ("attn-only xla", attn_only(False)), ("attn-only fused", attn_only(True)),
        ("blocks0-2 xla", prefix2(False)), ("blocks0-2 fused", prefix2(True)),
    ]:
        t = timed(fn, jnp.float32(0))
        print(f"{name:16s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("BISECT") == "1":
    bisect()
    sys.exit(0)


def bisect2(S=1024):
    """BISECT2=1: localize which upstream block interacts with the fused
    kernel, and whether an optimization_barrier at the block2 boundary fixes
    it (fusion/layout isolation)."""
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    x1 = jnp.asarray(rng.standard_normal((1, S // 4, S // 4, 96)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)

    def with_fused(f):
        def g(*a, **k):
            old = hiera._FUSED_WINDOW_SIZES
            hiera._FUSED_WINDOW_SIZES = (4,)
            try:
                return f(*a, **k)
            finally:
                hiera._FUSED_WINDOW_SIZES = old
        return g

    def chain(blocks, fused_b2, barrier=False, use_frame=True):
        def fn(c):
            if use_frame:
                x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                       frame + c.astype(frame.dtype) * 0)
                x = x + pe.astype(x.dtype)
            else:
                x = x1 + c.astype(x1.dtype) * 0
            for i in blocks:
                x = _block_apply(trunk["blocks"][i], x, schedule[i])
            if barrier:
                x = jax.lax.optimization_barrier(x)
            f = with_fused(_block_apply) if fused_b2 else _block_apply
            x = f(trunk["blocks"][2], x, schedule[2])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    cases = [
        ("b1 -> b2 xla", chain([1], False, use_frame=False)),
        ("b1 -> b2 fused", chain([1], True, use_frame=False)),
        ("b1 -> barrier -> b2 fused", chain([1], True, barrier=True,
                                            use_frame=False)),
        ("b0,b1 -> barrier -> b2 fused", chain([0, 1], True, barrier=True)),
        ("b0,b1 -> b2 fused", chain([0, 1], True)),
    ]
    for name, fn in cases:
        t = timed(fn, jnp.float32(0))
        print(f"{name:30s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("BISECT2") == "1":
    bisect2()
    sys.exit(0)


def bisect3(S=1024):
    """BISECT3=1: is the trigger the patch-embed conv or block0 itself?"""
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((1, S // 4, S // 4, 96)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)

    def with_fused(f):
        def g(*a, **k):
            old = hiera._FUSED_WINDOW_SIZES
            hiera._FUSED_WINDOW_SIZES = (4,)
            try:
                return f(*a, **k)
            finally:
                hiera._FUSED_WINDOW_SIZES = old
        return g

    def run_case(embed, blocks, fused_b2):
        def fn(c):
            if embed == "wfold":
                x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                       frame + c.astype(frame.dtype) * 0)
                x = x + pe.astype(x.dtype)
            elif embed == "conv":
                x = layers.conv2d_apply(trunk["patch_embed"]["proj"],
                                        frame + c.astype(frame.dtype) * 0,
                                        stride=(4, 4), explicit_padding=(3, 3))
                x = x + pe.astype(x.dtype)
            else:
                x = x0 + c.astype(x0.dtype) * 0
            for i in blocks:
                x = _block_apply(trunk["blocks"][i], x, schedule[i])
            f = with_fused(_block_apply) if fused_b2 else _block_apply
            x = f(trunk["blocks"][2], x, schedule[2])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    cases = [
        ("x0 -> b0,b1 -> b2 fused", run_case(None, [0, 1], True)),
        ("x0 -> b0,b1 -> b2 xla", run_case(None, [0, 1], False)),
        ("wfold -> b0,b1 -> b2 fused", run_case("wfold", [0, 1], True)),
        ("conv -> b0,b1 -> b2 fused", run_case("conv", [0, 1], True)),
    ]
    for name, fn in cases:
        t = timed(fn, jnp.float32(0))
        print(f"{name:30s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("BISECT3") == "1":
    bisect3()
    sys.exit(0)


def bisect4(S=1024):
    """BISECT4=1: does the v2 kernel (3-D blocks, 1-D arbitrary grid) avoid
    the conv-upstream pathology?"""
    from medsam2_tpu.ops.window_attention import window_attention_v2
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    trunk = params["image_encoder"]["trunk"]
    schedule = cfg.trunk.block_schedule()
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, S, S, 3)), jnp.bfloat16)
    pe = _get_pos_embed(trunk, S // 4, S // 4)
    bp2, sp2 = trunk["blocks"][2], schedule[2]

    def block2_v2(bp, x, s):
        shortcut = x
        xn = layers.layer_norm_apply(bp["norm1"], x, eps=1e-6)
        qkv = layers.linear_apply(bp["attn"]["qkv"], xn)
        out = window_attention_v2(qkv, s["num_heads"], s["window_size"])
        x = shortcut + layers.linear_apply(bp["attn"]["proj"], out)
        x = x + layers.mlp_apply(bp["mlp"],
                                 layers.layer_norm_apply(bp["norm2"], x, eps=1e-6),
                                 activation=layers.gelu)
        return x

    def prefix(v2):
        def fn(c):
            x = _patch_embed_wfold(trunk["patch_embed"]["proj"],
                                   frame + c.astype(frame.dtype) * 0)
            x = x + pe.astype(x.dtype)
            x = _block_apply(trunk["blocks"][0], x, schedule[0])
            x = _block_apply(trunk["blocks"][1], x, schedule[1])
            x = block2_v2(bp2, x, sp2) if v2 else _block_apply(bp2, x, sp2)
            x = _block_apply(trunk["blocks"][3], x, schedule[3])
            return jnp.sum(x).astype(jnp.float32)
        return fn

    for name, fn in [("blocks0-3 b2 xla", prefix(False)),
                     ("blocks0-3 b2 v2-kernel", prefix(True))]:
        t = timed(fn, jnp.float32(0))
        print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("BISECT4") == "1":
    bisect4()
    sys.exit(0)
