"""Checkpoint converter tests: round-trip and reference-name coverage."""

import numpy as np
import jax

from medsam2_tpu.configs import SAM2Config, HieraConfig, FpnNeckConfig, sam2_hiera_t
from medsam2_tpu.checkpoint.convert import convert_state_dict, export_state_dict
from medsam2_tpu.core.sam2_model import sam2_init


TINY = SAM2Config(
    trunk=HieraConfig(embed_dim=8, stages=(1, 1, 1, 1), window_spec=(2, 2, 2, 2),
                      global_att_blocks=(2,), window_pos_embed_bkg_spatial_size=(3, 3)),
    neck=FpnNeckConfig(backbone_channel_list=(64, 32, 16, 8)),
    image_size=64,
)


def _tree_equal(a, b, path=""):
    assert type(a) is type(b), f"type mismatch at {path}: {type(a)} vs {type(b)}"
    if isinstance(a, dict):
        assert set(a) == set(b), f"key mismatch at {path}: {set(a)} vs {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        assert len(a) == len(b), f"length mismatch at {path}"
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=f"value mismatch at {path}")


def test_roundtrip_tiny():
    params = sam2_init(jax.random.PRNGKey(0), TINY)
    sd = export_state_dict(params, TINY)
    params2 = convert_state_dict(sd, TINY)
    _tree_equal(params, params2)


def test_roundtrip_hiera_t_structure():
    cfg = sam2_hiera_t(image_size=128)  # small spatial, real param structure
    params = sam2_init(jax.random.PRNGKey(1), cfg)
    sd = export_state_dict(params, cfg)
    params2 = convert_state_dict(sd, cfg)
    _tree_equal(params, params2)


def test_reference_key_names_present():
    """Spot-check that exported names match the reference module tree
    (derived from sam2_base.py / yaml structure) for the hiera_t preset."""
    cfg = sam2_hiera_t(image_size=128)
    params = sam2_init(jax.random.PRNGKey(2), cfg)
    sd = export_state_dict(params, cfg)
    expected = [
        "image_encoder.trunk.patch_embed.proj.weight",
        "image_encoder.trunk.pos_embed",
        "image_encoder.trunk.pos_embed_window",
        "image_encoder.trunk.blocks.0.attn.qkv.weight",
        "image_encoder.trunk.blocks.1.proj.weight",  # first dim-change block
        "image_encoder.trunk.blocks.11.mlp.layers.1.bias",  # depth 12 for tiny
        "image_encoder.neck.convs.3.conv.weight",
        "sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        "sam_prompt_encoder.point_embeddings.3.weight",
        "sam_prompt_encoder.mask_downscaling.6.weight",
        "sam_mask_decoder.transformer.layers.1.cross_attn_image_to_token.out_proj.weight",
        "sam_mask_decoder.iou_token.weight",
        "sam_mask_decoder.mask_tokens.weight",
        "sam_mask_decoder.obj_score_token.weight",
        "sam_mask_decoder.output_upscaling.0.weight",
        "sam_mask_decoder.output_upscaling.3.weight",
        "sam_mask_decoder.conv_s0.weight",
        "sam_mask_decoder.output_hypernetworks_mlps.3.layers.2.weight",
        "sam_mask_decoder.iou_prediction_head.layers.2.bias",
        "sam_mask_decoder.pred_obj_score_head.layers.0.weight",
        "memory_attention.layers.3.cross_attn_image.k_proj.weight",
        "memory_attention.norm.weight",
        "memory_encoder.mask_downsampler.encoder.0.weight",
        "memory_encoder.mask_downsampler.encoder.12.weight",
        "memory_encoder.fuser.layers.1.dwconv.weight",
        "memory_encoder.fuser.layers.1.gamma",
        "memory_encoder.out_proj.weight",
        "memory_encoder.pix_feat_proj.weight",
        "maskmem_tpos_enc",
        "no_mem_embed",
        "no_mem_pos_enc",
        "no_obj_ptr",
        "mask_downsample.weight",
        "obj_ptr_proj.layers.2.weight",
    ]
    for k in expected:
        assert k in sd, f"missing expected reference key: {k}"

    # shape spot checks against known reference shapes
    assert sd["image_encoder.trunk.pos_embed"].shape == (1, 96, 7, 7)
    assert sd["image_encoder.trunk.pos_embed_window"].shape == (1, 96, 8, 8)
    assert sd["maskmem_tpos_enc"].shape == (7, 1, 1, 64)
    assert sd["no_mem_embed"].shape == (1, 1, 256)
    assert sd["sam_mask_decoder.mask_tokens.weight"].shape == (4, 256)
    assert sd["memory_encoder.out_proj.weight"].shape == (64, 256, 1, 1)
    assert sd["mask_downsample.weight"].shape == (1, 1, 4, 4)
    assert sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"].shape == (2, 128)
    assert sd["memory_attention.layers.0.cross_attn_image.k_proj.weight"].shape == (256, 64)
