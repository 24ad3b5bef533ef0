"""Stage-level timing of the nuclei instance pipeline (bench_nuclei shape):
prompter forward / point NMS / encode+condition / chunked SAM decode /
bank write / host merge — finds what the 1.27 s/img e2e number is made of.

Usage: python -u scripts/profile_nuclei.py [n_images]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from collections import defaultdict

from medsam2_tpu.configs import get_config
from medsam2_tpu.data.synthetic import synthetic_nuclei
from medsam2_tpu.prompter.dpa_p2pnet import PrompterConfig
from medsam2_tpu.api import nuclei_inference as NI
from medsam2_tpu.state import similarity_bank as sb
from medsam2_tpu.train import recipe_nuclei

T = defaultdict(float)
C = defaultdict(int)


def timed(name, fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    T[name] += time.perf_counter() - t0
    C[name] += 1
    return out


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = get_config("nuclei_256")
    rcfg = recipe_nuclei.NucleiRecipeConfig(
        prompter=PrompterConfig(backbone="pvt_v2_b2"), out_size=cfg.image_size)
    params = recipe_nuclei.init_joint_params(jax.random.PRNGKey(0), cfg, rcfg)
    P = cfg.sam_image_embedding_size ** 2
    bank = sb.init_similarity_bank(rcfg.memory_bank_size, P, cfg.mem_dim,
                                   P * cfg.hidden_dim)
    rng = np.random.default_rng(0)
    samples = [synthetic_nuclei(rng, size=cfg.image_size, num_cells=24)
               for _ in range(n_images + 1)]

    # monkeypatch the stages with timers
    orig_pp, orig_dc, orig_bw = (NI.predict_points, NI.decode_cells,
                                 NI._jit_bank_write)
    NI.predict_points = lambda *a, **k: timed("prompter", orig_pp, *a, **k)
    NI.decode_cells = lambda *a, **k: timed("decode", orig_dc, *a, **k)
    # sub-stages inside decode_cells: encode+condition vs per-chunk decode
    # (timers include the host pull, i.e. device wait + transfer)
    orig_enc, orig_chunk = NI._jit_encode, NI._jit_chunk_decode

    def enc_timed(cfg):
        f = orig_enc(cfg)

        def g(*a, **k):
            out = timed("decode/encode", f, *a, **k)
            T["decode/encode_sync"] += -time.perf_counter()
            jax.block_until_ready(out)
            T["decode/encode_sync"] += time.perf_counter()
            C["decode/encode_sync"] += 1
            return out
        return g

    def chunk_timed(cfg, mb, packed=False):
        f = orig_chunk(cfg, mb, packed)

        def g(*a, **k):
            out = timed("decode/chunk_dispatch", f, *a, **k)
            T["decode/chunk_sync"] += -time.perf_counter()
            jax.block_until_ready(out)
            T["decode/chunk_sync"] += time.perf_counter()
            C["decode/chunk_sync"] += 1
            return out
        return g

    NI._jit_encode = enc_timed
    NI._jit_chunk_decode = chunk_timed
    NI._jit_bank_write = lambda c: (lambda *a: timed("bank_write",
                                                     orig_bw(c), *a))
    orig_nms = NI.point_nms_np
    NI.point_nms_np = lambda *a, **k: timed("point_nms", orig_nms, *a, **k)
    orig_merge = NI.merge_instances
    NI.merge_instances = lambda *a, **k: timed("merge", orig_merge, *a, **k)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    NI.predict_instances(params, cfg, rcfg, samples[0], bank, sub)  # warm
    for k_ in list(T):
        T.pop(k_), C.pop(k_)

    t0 = time.perf_counter()
    npts = 0
    for s in samples[1:]:
        key, sub = jax.random.split(key)
        inst = NI.predict_instances(params, cfg, rcfg, s, bank, sub)
        npts += int(inst.max())
    total = time.perf_counter() - t0
    acc = 0.0
    for name in sorted(T, key=lambda n: -T[n]):
        print(f"{name:12s} {T[name]/n_images*1e3:8.1f} ms/img  "
              f"({C[name]/n_images:.1f} calls/img)", flush=True)
        acc += T[name]
    print(f"{'other':12s} {(total-acc)/n_images*1e3:8.1f} ms/img")
    print(f"{'TOTAL':12s} {total/n_images*1e3:8.1f} ms/img   "
          f"{npts} instances")


if __name__ == "__main__":
    main()
