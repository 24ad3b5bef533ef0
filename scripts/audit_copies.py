"""HLO copy audit: compile the production propagation-scan body (and ablated
variants) for the current backend and tally bytes moved by explicit `copy`
instructions, grouped by shape. This quantifies the relayout/aliasing glue
that slope timing can only see in aggregate.

Usage: python scripts/audit_copies.py [image_size] [variant ...]
  variants: full track enc   (default: full)
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import get_config
from medsam2_tpu.core import sam2_model
from medsam2_tpu.api.video_predictor import (
    SAM2VideoPredictor, _encode_frame, _expand_to_objects, _scan_track_run)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8}


def copy_bytes(hlo_text: str):
    """Sum bytes written by copy/copy-start instructions, per shape."""
    per_shape = defaultdict(lambda: [0, 0])
    # e.g.:  %copy.123 = bf16[1,7,4,4096,256]{4,3,2,1,0} copy(...)
    pat = re.compile(r"=\s*(\w+)\[([\d,]*)\][^ ]*\s+copy\(")
    for m in pat.finditer(hlo_text):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * _DTYPE_BYTES[dt]
        key = f"{dt}[{dims}]"
        per_shape[key][0] += 1
        per_shape[key][1] += b
    return per_shape


def report(name, compiled):
    try:
        txt = compiled.as_text()
    except Exception as e:  # tunnel backends can refuse; fall back to HLO dump
        print(f"{name}: as_text failed: {e}")
        return
    per_shape = copy_bytes(txt)
    total = sum(b for _, b in per_shape.values())
    print(f"\n== {name}: {total/1e6:.1f} MB of copies ==")
    for key, (cnt, b) in sorted(per_shape.items(), key=lambda kv: -kv[1][1])[:20]:
        print(f"  {b/1e6:9.2f} MB  x{cnt:3d}  {key}")


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    variants = sys.argv[2:] or ["full"]
    cfg = get_config("sam2_hiera_t", image_size=S)
    params = sam2_model.sam2_init(jax.random.PRNGKey(0), cfg)
    pred = SAM2VideoPredictor(params, cfg, max_cond_frames=1)
    rng = np.random.default_rng(0)
    T = 9
    video = (rng.random((T, S, S, 3)) * 255).astype(np.float32)
    state = pred.init_state(images=video)
    pred.add_new_points(state, frame_idx=0, obj_id=0,
                        points=np.array([[S // 2, S // 2]], np.float32),
                        labels=np.array([1]))
    B = len(state["obj_ids"])
    spec = pred._session_spec(state)
    bank0 = pred._make_bank(spec, B)
    out, bank0 = pred._run_prompt_frame(state, bank0, 0, spec)
    images = state["images"]
    pos_kcache = (sam2_model.make_pos_kcache(params, cfg, spec)
                  if pred.use_kcache else None)
    from medsam2_tpu.core.hiera import _get_pos_embed
    trunk_pe = _get_pos_embed(params["image_encoder"]["trunk"], S // 4, S // 4)
    kw = dict(cfg=cfg, spec=spec, is_eval=True, num_frames=T,
              track_in_reverse=False)
    if os.environ.get("MEDSAM2_KV_STORAGE", "0") == "1":
        kw["kv_storage"] = True
    order = jnp.arange(1, T, dtype=jnp.int32)

    if "full" in variants:
        fn = jax.jit(lambda imgs, bank: _scan_track_run(
            pred.params, imgs, bank, order, pos_kcache, **kw)[0])
        report("FULL scan body (8 frames)", fn.lower(images, bank0).compile())

    if "track" in variants:
        frame0 = jax.lax.dynamic_index_in_dim(images, 1, 0, keepdims=True)
        feats0, pos0 = _encode_frame(pred.params, frame0, cfg=cfg,
                                     trunk_pos_embed=trunk_pe)
        feats0, pos0 = _expand_to_objects(feats0, pos0, B)

        @jax.jit
        def run_track(feats0, bank0):
            def body(bank, t):
                o, bank = sam2_model.track_step(
                    pred.params, cfg, spec, bank, t,
                    is_init_cond_frame=False,
                    current_vision_feats=feats0, current_vision_pos=pos0,
                    multimask_output=False, run_mem_encoder=True,
                    is_cond_frame=False, num_frames=T, is_eval=True,
                    pos_kcache=pos_kcache)
                return bank, o["pred_masks"].astype(jnp.float32)
            return jax.lax.scan(body, bank0, order)[1]
        report("TRACK_KC scan body", run_track.lower(feats0, bank0).compile())

    if "enc" in variants:
        @jax.jit
        def run_enc(imgs):
            def body(c, t):
                frame = jax.lax.dynamic_index_in_dim(imgs, t, 0, keepdims=True)
                feats, _ = _encode_frame(pred.params, frame, cfg=cfg,
                                         trunk_pos_embed=trunk_pe)
                return c + jnp.sum(feats[-1]).astype(jnp.float32), 0
            return jax.lax.scan(body, jnp.float32(0), order)[0]
        report("ENC scan body", run_enc.lower(images).compile())


if __name__ == "__main__":
    main()
