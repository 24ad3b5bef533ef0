"""Parity tests for prompt encoder, two-way transformer, and mask decoder vs
compact torch oracles re-derived from the reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig
from medsam2_tpu.core import prompt_encoder as pe
from medsam2_tpu.core import transformer as tfm
from medsam2_tpu.core import mask_decoder as md


CFG = SAM2Config(
    trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                      global_att_blocks=(), window_pos_embed_bkg_spatial_size=(3, 3)),
    neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
    image_size=64,  # embedding size 4
)


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------


def test_prompt_encoder_points(rng):
    params = pe.prompt_encoder_init(jax.random.PRNGKey(0), CFG)
    coords = rng.uniform(0, 64, (2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, -1], [1, 2, 3]], np.int32)

    sparse, dense = pe.prompt_encoder_apply(
        params, CFG, points=(jnp.asarray(coords), jnp.asarray(labels)))
    assert sparse.shape == (2, 4, 256)  # 3 points + 1 pad
    assert dense.shape == (2, 4, 4, 256)

    # torch oracle (prompt_encoder.py:79-101)
    gm = t(params["pe_layer"]["gaussian_matrix"])
    pts = t(coords) + 0.5
    pts = torch.cat([pts, torch.zeros(2, 1, 2)], dim=1)
    lbl = torch.cat([t(labels), -torch.ones(2, 1, dtype=torch.int32)], dim=1)
    norm = pts / torch.tensor([64.0, 64.0])
    c = (2 * norm - 1) @ gm * (2 * np.pi)
    emb = torch.cat([torch.sin(c), torch.cos(c)], dim=-1)
    emb[lbl == -1] = 0.0
    emb[lbl == -1] += t(params["not_a_point_embed"]["w"])[0]
    for i in range(4):
        emb[lbl == i] += t(params["point_embeddings"][i]["w"])[0]
    np.testing.assert_allclose(np.asarray(sparse), emb.numpy(), atol=1e-5)

    # no-mask dense: broadcast no_mask_embed
    want_dense = np.broadcast_to(
        np.asarray(params["no_mask_embed"]["w"]).reshape(1, 1, 1, 256), (2, 4, 4, 256))
    np.testing.assert_allclose(np.asarray(dense), want_dense, atol=1e-6)


def test_prompt_encoder_mask_downscaling(rng):
    params = pe.prompt_encoder_init(jax.random.PRNGKey(1), CFG)
    masks = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    _, dense = pe.prompt_encoder_apply(params, CFG, masks=jnp.asarray(masks), batch_size=1)
    assert dense.shape == (1, 4, 4, 256)

    p = params["mask_downscaling"]
    x = t(masks).permute(0, 3, 1, 2)
    x = F.conv2d(x, t(p["conv1"]["w"]).permute(3, 2, 0, 1), t(p["conv1"]["b"]), stride=2)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    x = t(p["ln1"]["scale"])[:, None, None] * x + t(p["ln1"]["bias"])[:, None, None]
    x = F.gelu(x)
    x = F.conv2d(x, t(p["conv2"]["w"]).permute(3, 2, 0, 1), t(p["conv2"]["b"]), stride=2)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + 1e-6)
    x = t(p["ln2"]["scale"])[:, None, None] * x + t(p["ln2"]["bias"])[:, None, None]
    x = F.gelu(x)
    x = F.conv2d(x, t(p["conv3"]["w"]).permute(3, 2, 0, 1), t(p["conv3"]["b"]))
    np.testing.assert_allclose(np.asarray(dense), x.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_dense_embed_force_resize():
    cfg = SAM2Config(trunk=CFG.trunk, neck=CFG.neck, image_size=256, dense_embed_size=16)
    params = pe.prompt_encoder_init(jax.random.PRNGKey(2), cfg)
    _, dense = pe.prompt_encoder_apply(params, cfg, batch_size=2)
    assert dense.shape == (2, 16, 16, 256)


# ---------------------------------------------------------------------------
# Two-way transformer (torch oracle)
# ---------------------------------------------------------------------------


class OracleAttn(nn.Module):
    def __init__(self, dim, heads, downsample=1, kv_in=None):
        super().__init__()
        inner = dim // downsample
        kv_in = kv_in or dim
        self.h = heads
        self.q = nn.Linear(dim, inner)
        self.k = nn.Linear(kv_in, inner)
        self.v = nn.Linear(kv_in, inner)
        self.o = nn.Linear(inner, dim)

    def forward(self, q, k, v):
        def sh(x):
            b, n, c = x.shape
            return x.reshape(b, n, self.h, c // self.h).transpose(1, 2)
        out = F.scaled_dot_product_attention(sh(self.q(q)), sh(self.k(k)), sh(self.v(v)))
        b, h, n, d = out.shape
        return self.o(out.transpose(1, 2).reshape(b, n, h * d))


def load_attn(oracle: OracleAttn, p):
    for name, lin in [("q_proj", oracle.q), ("k_proj", oracle.k),
                      ("v_proj", oracle.v), ("out_proj", oracle.o)]:
        lin.weight.data = t(p[name]["w"]).T
        lin.bias.data = t(p[name]["b"])


class OracleTwoWayBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_pe):
        super().__init__()
        self.skip_pe = skip_pe
        self.self_attn = OracleAttn(dim, heads)
        self.n1, self.n2, self.n3, self.n4 = (nn.LayerNorm(dim) for _ in range(4))
        self.ca_t2i = OracleAttn(dim, heads, 2)
        self.ca_i2t = OracleAttn(dim, heads, 2)
        self.mlp1, self.mlp2 = nn.Linear(dim, mlp_dim), nn.Linear(mlp_dim, dim)

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.n1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.n2(queries + self.ca_t2i(q, k, keys))
        queries = self.n3(queries + self.mlp2(F.relu(self.mlp1(queries))))
        q, k = queries + qpe, keys + kpe
        keys = self.n4(keys + self.ca_i2t(k, q, queries))
        return queries, keys


def test_two_way_transformer_matches_oracle(rng):
    dim, heads, mlp_dim, depth = 32, 4, 64, 2
    params = tfm.two_way_transformer_init(jax.random.PRNGKey(3), depth, dim, heads, mlp_dim)

    blocks = []
    for i, lp in enumerate(params["layers"]):
        ob = OracleTwoWayBlock(dim, heads, mlp_dim, skip_pe=(i == 0))
        load_attn(ob.self_attn, lp["self_attn"])
        load_attn(ob.ca_t2i, lp["cross_attn_token_to_image"])
        load_attn(ob.ca_i2t, lp["cross_attn_image_to_token"])
        for n, src in [(ob.n1, "norm1"), (ob.n2, "norm2"), (ob.n3, "norm3"), (ob.n4, "norm4")]:
            n.weight.data = t(lp[src]["scale"])
            n.bias.data = t(lp[src]["bias"])
        ob.mlp1.weight.data = t(lp["mlp"]["layers"][0]["w"]).T
        ob.mlp1.bias.data = t(lp["mlp"]["layers"][0]["b"])
        ob.mlp2.weight.data = t(lp["mlp"]["layers"][1]["w"]).T
        ob.mlp2.bias.data = t(lp["mlp"]["layers"][1]["b"])
        blocks.append(ob)
    final = OracleAttn(dim, heads, 2)
    load_attn(final, params["final_attn_token_to_image"])
    nf = nn.LayerNorm(dim)
    nf.weight.data = t(params["norm_final_attn"]["scale"])
    nf.bias.data = t(params["norm_final_attn"]["bias"])

    img = rng.standard_normal((2, 4, 4, dim)).astype(np.float32)
    img_pe = rng.standard_normal((2, 4, 4, dim)).astype(np.float32)
    pts = rng.standard_normal((2, 6, dim)).astype(np.float32)

    q_got, k_got = tfm.two_way_transformer_apply(
        params, jnp.asarray(img), jnp.asarray(img_pe), jnp.asarray(pts), heads)

    with torch.no_grad():
        queries = t(pts)
        keys = t(img).reshape(2, 16, dim)
        kpe = t(img_pe).reshape(2, 16, dim)
        for ob in blocks:
            queries, keys = ob(queries, keys, t(pts), kpe)
        q = queries + t(pts)
        k = keys + kpe
        queries = nf(queries + final(q, k, keys))
    np.testing.assert_allclose(np.asarray(q_got), queries.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_got), keys.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Mask decoder
# ---------------------------------------------------------------------------


def test_mask_decoder_shapes_and_selection(rng):
    params = md.mask_decoder_init(jax.random.PRNGKey(4), CFG)
    B, h = 2, CFG.sam_image_embedding_size
    img = jnp.asarray(rng.standard_normal((B, h, h, 256)).astype(np.float32))
    img_pe = jnp.asarray(rng.standard_normal((1, h, h, 256)).astype(np.float32))
    sparse = jnp.asarray(rng.standard_normal((B, 3, 256)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((B, h, h, 256)).astype(np.float32))
    hrf = [jnp.asarray(rng.standard_normal((B, h * 4, h * 4, 32)).astype(np.float32)),
           jnp.asarray(rng.standard_normal((B, h * 2, h * 2, 64)).astype(np.float32))]

    masks, iou, toks, obj = md.mask_decoder_apply(
        params, CFG, img, img_pe, sparse, dense, multimask_output=True,
        high_res_features=hrf)
    assert masks.shape == (B, 3, h * 4, h * 4)
    assert iou.shape == (B, 3)
    assert toks.shape == (B, 3, 256)  # multimask tokens for obj ptr
    assert obj.shape == (B, 1)
    # iou_prediction_use_sigmoid=True
    assert np.all(np.asarray(iou) >= 0) and np.all(np.asarray(iou) <= 1)

    masks1, iou1, toks1, _ = md.mask_decoder_apply(
        params, CFG, img, img_pe, sparse, dense, multimask_output=False,
        high_res_features=hrf)
    assert masks1.shape == (B, 1, h * 4, h * 4)
    assert toks1.shape == (B, 1, 256)


def test_mask_decoder_image_indices_matches_repeat(rng):
    """The static-gather replacement for cell_nums repeat_interleave
    (mask_decoder.py:215-231) must equal explicit repetition."""
    params = md.mask_decoder_init(jax.random.PRNGKey(5), CFG)
    h = CFG.sam_image_embedding_size
    img = jnp.asarray(rng.standard_normal((2, h, h, 256)).astype(np.float32))
    img_pe = jnp.asarray(rng.standard_normal((1, h, h, 256)).astype(np.float32))
    # 3 cells: 2 from image 0, 1 from image 1
    idx = jnp.asarray([0, 0, 1])
    sparse = jnp.asarray(rng.standard_normal((3, 2, 256)).astype(np.float32))
    dense = jnp.asarray(rng.standard_normal((3, h, h, 256)).astype(np.float32))
    hrf = [jnp.asarray(rng.standard_normal((2, h * 4, h * 4, 32)).astype(np.float32)),
           jnp.asarray(rng.standard_normal((2, h * 2, h * 2, 64)).astype(np.float32))]

    m1, i1, _, _ = md.mask_decoder_apply(params, CFG, img, img_pe, sparse, dense,
                                         True, hrf, image_indices=idx)
    img_rep = img[idx]
    hrf_rep = [f[idx] for f in hrf]
    m2, i2, _, _ = md.mask_decoder_apply(params, CFG, img_rep, img_pe, sparse, dense,
                                         True, hrf_rep)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)


def test_dynamic_multimask_stability(rng):
    # stable single mask -> token 0; unstable -> best multimask by IoU
    masks = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    # make batch 0's single mask very stable (all strongly positive)
    masks = masks.at[0, 0].set(5.0)
    # make batch 1's single mask maximally unstable (values straddle +/- delta)
    masks = masks.at[1, 0].set(jnp.where(
        jnp.arange(64).reshape(8, 8) % 2 == 0, 0.01, -5.0))
    iou = jnp.asarray([[0.9, 0.1, 0.8, 0.3], [0.9, 0.2, 0.95, 0.1]], jnp.float32)
    out_masks, out_iou = md._dynamic_multimask_via_stability(masks, iou, 0.05, 0.98)
    np.testing.assert_allclose(np.asarray(out_masks[0, 0]), np.asarray(masks[0, 0]))
    # batch 1 falls back to argmax over multimask IoUs (index 1 -> token 2)
    np.testing.assert_allclose(np.asarray(out_masks[1, 0]), np.asarray(masks[1, 2]))
    assert float(out_iou[1, 0]) == pytest.approx(0.95)
