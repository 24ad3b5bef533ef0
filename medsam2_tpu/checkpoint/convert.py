"""PyTorch -> JAX checkpoint converter for SAM2 weights.

Maps the reference's ``state_dict`` names (as produced by ``SAM2Base`` and
saved under ``ckpt["model"]``, ``build_sam.py:79-89``) onto our param pytree.

Layout transforms:
  - Linear ``[out, in]``            -> ``[in, out]`` (transpose)
  - Conv OIHW                       -> HWIO
  - ConvTranspose ``(in, out, k, k)`` -> ``(k, k, out, in)``
  - LayerNorm weight/bias           -> scale/bias
  - ``pos_embed [1, C, h, w]``      -> ``[h, w, C]``
  - ``maskmem_tpos_enc [M, 1, 1, D]`` -> ``[M, D]``

``convert_state_dict`` is strict: it raises on unconsumed torch keys and on
missing slots, mirroring the reference's strict load.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from medsam2_tpu.configs import SAM2Config


def _linear(sd, prefix):
    p = {"w": jnp.asarray(sd.pop(prefix + ".weight")).T}
    b = prefix + ".bias"
    if b in sd:
        p["b"] = jnp.asarray(sd.pop(b))
    return p


def _conv(sd, prefix):
    w = np.asarray(sd.pop(prefix + ".weight"))
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    b = prefix + ".bias"
    if b in sd:
        p["b"] = jnp.asarray(sd.pop(b))
    return p


def _conv_transpose(sd, prefix):
    w = np.asarray(sd.pop(prefix + ".weight"))  # (in, out, kh, kw)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}  # (kh, kw, out, in)
    b = prefix + ".bias"
    if b in sd:
        p["b"] = jnp.asarray(sd.pop(b))
    return p


def _ln(sd, prefix):
    return {
        "scale": jnp.asarray(sd.pop(prefix + ".weight")),
        "bias": jnp.asarray(sd.pop(prefix + ".bias")),
    }


def _embed(sd, prefix):
    return {"w": jnp.asarray(sd.pop(prefix + ".weight"))}


def _mlp(sd, prefix, num_layers):
    return {"layers": [_linear(sd, f"{prefix}.layers.{i}") for i in range(num_layers)]}


def _attn(sd, prefix):
    return {
        "q_proj": _linear(sd, prefix + ".q_proj"),
        "k_proj": _linear(sd, prefix + ".k_proj"),
        "v_proj": _linear(sd, prefix + ".v_proj"),
        "out_proj": _linear(sd, prefix + ".out_proj"),
    }


def _two_way_transformer(sd, prefix, depth):
    layers = []
    for i in range(depth):
        lp = f"{prefix}.layers.{i}"
        layers.append({
            "self_attn": _attn(sd, lp + ".self_attn"),
            "norm1": _ln(sd, lp + ".norm1"),
            "cross_attn_token_to_image": _attn(sd, lp + ".cross_attn_token_to_image"),
            "norm2": _ln(sd, lp + ".norm2"),
            "mlp": _mlp(sd, lp + ".mlp", 2),
            "norm3": _ln(sd, lp + ".norm3"),
            "norm4": _ln(sd, lp + ".norm4"),
            "cross_attn_image_to_token": _attn(sd, lp + ".cross_attn_image_to_token"),
        })
    return {
        "layers": layers,
        "final_attn_token_to_image": _attn(sd, prefix + ".final_attn_token_to_image"),
        "norm_final_attn": _ln(sd, prefix + ".norm_final_attn"),
    }


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: SAM2Config) -> Dict:
    """Convert a flat torch state dict (numpy values) into our param pytree."""
    sd = dict(sd)
    params: Dict = {}

    # ---- image encoder / trunk ----
    trunk = {
        "patch_embed": {"proj": _conv(sd, "image_encoder.trunk.patch_embed.proj")},
        "pos_embed": jnp.asarray(
            np.asarray(sd.pop("image_encoder.trunk.pos_embed"))[0].transpose(1, 2, 0)),
        "pos_embed_window": jnp.asarray(
            np.asarray(sd.pop("image_encoder.trunk.pos_embed_window"))[0].transpose(1, 2, 0)),
        "blocks": [],
    }
    for i, spec in enumerate(cfg.trunk.block_schedule()):
        bp = f"image_encoder.trunk.blocks.{i}"
        block = {
            "norm1": _ln(sd, bp + ".norm1"),
            "attn": {
                "qkv": _linear(sd, bp + ".attn.qkv"),
                "proj": _linear(sd, bp + ".attn.proj"),
            },
            "norm2": _ln(sd, bp + ".norm2"),
            "mlp": _mlp(sd, bp + ".mlp", 2),
        }
        if spec["dim"] != spec["dim_out"]:
            block["proj"] = _linear(sd, bp + ".proj")
        trunk["blocks"].append(block)
    neck = {
        "convs": [
            _conv(sd, f"image_encoder.neck.convs.{i}.conv")
            for i in range(len(cfg.neck.backbone_channel_list))
        ]
    }
    params["image_encoder"] = {"trunk": trunk, "neck": neck}

    # ---- prompt encoder ----
    pe = "sam_prompt_encoder"
    params["sam_prompt_encoder"] = {
        "pe_layer": {
            "gaussian_matrix": jnp.asarray(
                sd.pop(pe + ".pe_layer.positional_encoding_gaussian_matrix"))
        },
        "point_embeddings": [_embed(sd, f"{pe}.point_embeddings.{i}") for i in range(4)],
        "not_a_point_embed": _embed(sd, pe + ".not_a_point_embed"),
        "no_mask_embed": _embed(sd, pe + ".no_mask_embed"),
        "mask_downscaling": {
            "conv1": _conv(sd, pe + ".mask_downscaling.0"),
            "ln1": _ln(sd, pe + ".mask_downscaling.1"),
            "conv2": _conv(sd, pe + ".mask_downscaling.3"),
            "ln2": _ln(sd, pe + ".mask_downscaling.4"),
            "conv3": _conv(sd, pe + ".mask_downscaling.6"),
        },
    }

    # ---- mask decoder ----
    mdp = "sam_mask_decoder"
    num_mask_tokens = cfg.num_multimask_outputs + 1
    dec = {
        "transformer": _two_way_transformer(sd, mdp + ".transformer", cfg.twoway_depth),
        "iou_token": _embed(sd, mdp + ".iou_token"),
        "mask_tokens": _embed(sd, mdp + ".mask_tokens"),
        "output_upscaling": {
            "dc1": _conv_transpose(sd, mdp + ".output_upscaling.0"),
            "ln": _ln(sd, mdp + ".output_upscaling.1"),
            "dc2": _conv_transpose(sd, mdp + ".output_upscaling.3"),
        },
        "output_hypernetworks_mlps": [
            _mlp(sd, f"{mdp}.output_hypernetworks_mlps.{i}", 3)
            for i in range(num_mask_tokens)
        ],
        "iou_prediction_head": _mlp(sd, mdp + ".iou_prediction_head", cfg.iou_head_depth),
    }
    if cfg.use_high_res_features_in_sam:
        dec["conv_s0"] = _conv(sd, mdp + ".conv_s0")
        dec["conv_s1"] = _conv(sd, mdp + ".conv_s1")
    if cfg.pred_obj_scores:
        dec["obj_score_token"] = _embed(sd, mdp + ".obj_score_token")
        if cfg.pred_obj_scores_mlp:
            dec["pred_obj_score_head"] = _mlp(sd, mdp + ".pred_obj_score_head", 3)
        else:
            dec["pred_obj_score_head"] = _linear(sd, mdp + ".pred_obj_score_head")
    params["sam_mask_decoder"] = dec

    # ---- memory attention ----
    ma = {"layers": []}
    for i in range(cfg.memory_attention.num_layers):
        lp = f"memory_attention.layers.{i}"
        ma["layers"].append({
            "self_attn": _attn(sd, lp + ".self_attn"),
            "cross_attn_image": _attn(sd, lp + ".cross_attn_image"),
            "linear1": _linear(sd, lp + ".linear1"),
            "linear2": _linear(sd, lp + ".linear2"),
            "norm1": _ln(sd, lp + ".norm1"),
            "norm2": _ln(sd, lp + ".norm2"),
            "norm3": _ln(sd, lp + ".norm3"),
        })
    ma["norm"] = _ln(sd, "memory_attention.norm")
    params["memory_attention"] = ma

    # ---- memory encoder ----
    from medsam2_tpu.core.memory import _mask_downsampler_layout
    num_ds_layers, _ = _mask_downsampler_layout(cfg.memory_encoder)
    me = {
        "mask_downsampler": [
            {
                "conv": _conv(sd, f"memory_encoder.mask_downsampler.encoder.{3 * i}"),
                "ln": _ln(sd, f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}"),
            }
            for i in range(num_ds_layers)
        ],
        "mask_out_proj": _conv(sd, f"memory_encoder.mask_downsampler.encoder.{3 * num_ds_layers}"),
        "pix_feat_proj": _conv(sd, "memory_encoder.pix_feat_proj"),
        "fuser": [],
    }
    for i in range(cfg.memory_encoder.fuser_num_layers):
        fp = f"memory_encoder.fuser.layers.{i}"
        dw = np.asarray(sd.pop(fp + ".dwconv.weight"))  # [C, 1, k, k] grouped
        me["fuser"].append({
            "dwconv": {
                "w": jnp.asarray(dw.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(sd.pop(fp + ".dwconv.bias")),
            },
            "norm": _ln(sd, fp + ".norm"),
            "pwconv1": _linear(sd, fp + ".pwconv1"),
            "pwconv2": _linear(sd, fp + ".pwconv2"),
            "gamma": jnp.asarray(sd.pop(fp + ".gamma")),
        })
    if cfg.memory_encoder.out_dim != cfg.memory_encoder.in_dim:
        me["out_proj"] = _conv(sd, "memory_encoder.out_proj")
    params["memory_encoder"] = me

    # ---- top-level embeddings / projections ----
    params["maskmem_tpos_enc"] = jnp.asarray(
        np.asarray(sd.pop("maskmem_tpos_enc")).reshape(cfg.num_maskmem, cfg.mem_dim))
    params["no_mem_embed"] = jnp.asarray(sd.pop("no_mem_embed"))
    params["no_mem_pos_enc"] = jnp.asarray(sd.pop("no_mem_pos_enc"))
    if cfg.use_obj_ptrs_in_encoder:
        params["mask_downsample"] = _conv(sd, "mask_downsample")
        if cfg.use_mlp_for_obj_ptr_proj:
            params["obj_ptr_proj"] = _mlp(sd, "obj_ptr_proj", 3)
        else:
            params["obj_ptr_proj"] = _linear(sd, "obj_ptr_proj")
    if cfg.proj_tpos_enc_in_obj_ptrs:
        params["obj_ptr_tpos_proj"] = _linear(sd, "obj_ptr_tpos_proj")
    if cfg.pred_obj_scores and cfg.use_obj_ptrs_in_encoder:
        params["no_obj_ptr"] = jnp.asarray(sd.pop("no_obj_ptr"))

    if sd:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(sd)[:20]}"
                         f"{' ...' if len(sd) > 20 else ''}")
    return params


def export_state_dict(params: Dict, cfg: SAM2Config) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict`: emit a reference-named flat torch
    state dict (numpy values) from our param pytree. Used for interop and for
    round-trip testing of the converter."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_conv(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_convt(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if "b" in p:
            sd[prefix + ".bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])

    def put_embed(prefix, p):
        sd[prefix + ".weight"] = np.asarray(p["w"])

    def put_mlp(prefix, p):
        for i, lp in enumerate(p["layers"]):
            put_linear(f"{prefix}.layers.{i}", lp)

    def put_attn(prefix, p):
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{prefix}.{n}", p[n])

    trunk = params["image_encoder"]["trunk"]
    put_conv("image_encoder.trunk.patch_embed.proj", trunk["patch_embed"]["proj"])
    sd["image_encoder.trunk.pos_embed"] = np.asarray(trunk["pos_embed"]).transpose(2, 0, 1)[None]
    sd["image_encoder.trunk.pos_embed_window"] = (
        np.asarray(trunk["pos_embed_window"]).transpose(2, 0, 1)[None])
    for i, bp in enumerate(trunk["blocks"]):
        pfx = f"image_encoder.trunk.blocks.{i}"
        put_ln(pfx + ".norm1", bp["norm1"])
        put_linear(pfx + ".attn.qkv", bp["attn"]["qkv"])
        put_linear(pfx + ".attn.proj", bp["attn"]["proj"])
        put_ln(pfx + ".norm2", bp["norm2"])
        put_mlp(pfx + ".mlp", bp["mlp"])
        if "proj" in bp:
            put_linear(pfx + ".proj", bp["proj"])
    for i, cp in enumerate(params["image_encoder"]["neck"]["convs"]):
        put_conv(f"image_encoder.neck.convs.{i}.conv", cp)

    pe = params["sam_prompt_encoder"]
    sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        np.asarray(pe["pe_layer"]["gaussian_matrix"]))
    for i, p in enumerate(pe["point_embeddings"]):
        put_embed(f"sam_prompt_encoder.point_embeddings.{i}", p)
    put_embed("sam_prompt_encoder.not_a_point_embed", pe["not_a_point_embed"])
    put_embed("sam_prompt_encoder.no_mask_embed", pe["no_mask_embed"])
    mdn = pe["mask_downscaling"]
    put_conv("sam_prompt_encoder.mask_downscaling.0", mdn["conv1"])
    put_ln("sam_prompt_encoder.mask_downscaling.1", mdn["ln1"])
    put_conv("sam_prompt_encoder.mask_downscaling.3", mdn["conv2"])
    put_ln("sam_prompt_encoder.mask_downscaling.4", mdn["ln2"])
    put_conv("sam_prompt_encoder.mask_downscaling.6", mdn["conv3"])

    dec = params["sam_mask_decoder"]
    tf = dec["transformer"]
    for i, lp in enumerate(tf["layers"]):
        pfx = f"sam_mask_decoder.transformer.layers.{i}"
        put_attn(pfx + ".self_attn", lp["self_attn"])
        put_ln(pfx + ".norm1", lp["norm1"])
        put_attn(pfx + ".cross_attn_token_to_image", lp["cross_attn_token_to_image"])
        put_ln(pfx + ".norm2", lp["norm2"])
        put_mlp(pfx + ".mlp", lp["mlp"])
        put_ln(pfx + ".norm3", lp["norm3"])
        put_ln(pfx + ".norm4", lp["norm4"])
        put_attn(pfx + ".cross_attn_image_to_token", lp["cross_attn_image_to_token"])
    put_attn("sam_mask_decoder.transformer.final_attn_token_to_image",
             tf["final_attn_token_to_image"])
    put_ln("sam_mask_decoder.transformer.norm_final_attn", tf["norm_final_attn"])
    put_embed("sam_mask_decoder.iou_token", dec["iou_token"])
    put_embed("sam_mask_decoder.mask_tokens", dec["mask_tokens"])
    put_convt("sam_mask_decoder.output_upscaling.0", dec["output_upscaling"]["dc1"])
    put_ln("sam_mask_decoder.output_upscaling.1", dec["output_upscaling"]["ln"])
    put_convt("sam_mask_decoder.output_upscaling.3", dec["output_upscaling"]["dc2"])
    for i, mp in enumerate(dec["output_hypernetworks_mlps"]):
        put_mlp(f"sam_mask_decoder.output_hypernetworks_mlps.{i}", mp)
    put_mlp("sam_mask_decoder.iou_prediction_head", dec["iou_prediction_head"])
    if cfg.use_high_res_features_in_sam:
        put_conv("sam_mask_decoder.conv_s0", dec["conv_s0"])
        put_conv("sam_mask_decoder.conv_s1", dec["conv_s1"])
    if cfg.pred_obj_scores:
        put_embed("sam_mask_decoder.obj_score_token", dec["obj_score_token"])
        if cfg.pred_obj_scores_mlp:
            put_mlp("sam_mask_decoder.pred_obj_score_head", dec["pred_obj_score_head"])
        else:
            put_linear("sam_mask_decoder.pred_obj_score_head", dec["pred_obj_score_head"])

    for i, lp in enumerate(params["memory_attention"]["layers"]):
        pfx = f"memory_attention.layers.{i}"
        put_attn(pfx + ".self_attn", lp["self_attn"])
        put_attn(pfx + ".cross_attn_image", lp["cross_attn_image"])
        put_linear(pfx + ".linear1", lp["linear1"])
        put_linear(pfx + ".linear2", lp["linear2"])
        put_ln(pfx + ".norm1", lp["norm1"])
        put_ln(pfx + ".norm2", lp["norm2"])
        put_ln(pfx + ".norm3", lp["norm3"])
    put_ln("memory_attention.norm", params["memory_attention"]["norm"])

    me = params["memory_encoder"]
    for i, lp in enumerate(me["mask_downsampler"]):
        put_conv(f"memory_encoder.mask_downsampler.encoder.{3 * i}", lp["conv"])
        put_ln(f"memory_encoder.mask_downsampler.encoder.{3 * i + 1}", lp["ln"])
    put_conv(f"memory_encoder.mask_downsampler.encoder.{3 * len(me['mask_downsampler'])}",
             me["mask_out_proj"])
    put_conv("memory_encoder.pix_feat_proj", me["pix_feat_proj"])
    for i, fp in enumerate(me["fuser"]):
        pfx = f"memory_encoder.fuser.layers.{i}"
        put_conv(pfx + ".dwconv", fp["dwconv"])
        put_ln(pfx + ".norm", fp["norm"])
        put_linear(pfx + ".pwconv1", fp["pwconv1"])
        put_linear(pfx + ".pwconv2", fp["pwconv2"])
        sd[pfx + ".gamma"] = np.asarray(fp["gamma"])
    if "out_proj" in me:
        put_conv("memory_encoder.out_proj", me["out_proj"])

    sd["maskmem_tpos_enc"] = np.asarray(params["maskmem_tpos_enc"])[:, None, None, :]
    sd["no_mem_embed"] = np.asarray(params["no_mem_embed"])
    sd["no_mem_pos_enc"] = np.asarray(params["no_mem_pos_enc"])
    if cfg.use_obj_ptrs_in_encoder:
        put_conv("mask_downsample", params["mask_downsample"])
        if cfg.use_mlp_for_obj_ptr_proj:
            put_mlp("obj_ptr_proj", params["obj_ptr_proj"])
        else:
            put_linear("obj_ptr_proj", params["obj_ptr_proj"])
    if cfg.proj_tpos_enc_in_obj_ptrs:
        put_linear("obj_ptr_tpos_proj", params["obj_ptr_tpos_proj"])
    if cfg.pred_obj_scores and cfg.use_obj_ptrs_in_encoder:
        sd["no_obj_ptr"] = np.asarray(params["no_obj_ptr"])
    return sd


def load_torch_checkpoint(path: str, cfg: SAM2Config) -> Dict:
    """Load a reference ``.pt`` checkpoint (``{"model": state_dict}``) into a
    param pytree. Requires torch (CPU) at call time only."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    np_sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_state_dict(np_sd, cfg)
