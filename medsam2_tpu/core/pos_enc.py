"""Position encodings: sine grid PE, random-Fourier prompt PE, axial RoPE.

Reference semantics: ``sam2_train/modeling/position_encoding.py``. RoPE is
implemented with real-valued rotations (cos/sin) instead of complex dtypes —
numerically identical to the reference's ``torch.polar``/``view_as_complex``
path (``position_encoding.py:167-216``) and friendlier to the TPU vector unit.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# PositionEmbeddingSine (position_encoding.py:16-112)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def sine_pos_embed_grid(h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
                        normalize: bool = True, scale: float = 2 * math.pi) -> np.ndarray:
    """[H, W, C] sine/cosine grid embedding; host-side, cached per (H, W).

    Matches ``PositionEmbeddingSine.forward`` exactly: 1-indexed cumsum
    coordinates, normalized by the last coordinate + 1e-6, interleaved
    sin/cos over pairs, channel layout [pos_y ; pos_x].
    """
    npf = num_pos_feats // 2
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack((np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])), axis=3).reshape(h, w, -1)
    pos_y = np.stack((np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])), axis=3).reshape(h, w, -1)
    return np.concatenate((pos_y, pos_x), axis=2)  # [H, W, C]


def sine_pos_embed(h: int, w: int, num_pos_feats: int) -> jnp.ndarray:
    return jnp.asarray(sine_pos_embed_grid(h, w, num_pos_feats))


def get_1d_sine_pe(pos_inds: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sine PE (``sam2_utils.py:60-70``): [..., dim] = [sin ; cos] halves."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos = pos_inds.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)


# ---------------------------------------------------------------------------
# PositionEmbeddingRandom (position_encoding.py:115-158)
# ---------------------------------------------------------------------------


def random_pe_init(key, num_pos_feats: int = 64, scale: float = 1.0):
    if scale is None or scale <= 0.0:
        scale = 1.0
    return {"gaussian_matrix": scale * jax.random.normal(key, (2, num_pos_feats), jnp.float32)}


def random_pe_encode(p, coords: jnp.ndarray) -> jnp.ndarray:
    """Encode [0,1]-normalized coords [..., 2] -> [..., 2*num_pos_feats]."""
    coords = 2.0 * coords.astype(jnp.float32) - 1.0
    coords = coords @ p["gaussian_matrix"]
    coords = 2.0 * jnp.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def random_pe_grid(p, h: int, w: int) -> jnp.ndarray:
    """Dense PE grid [H, W, C] (pixel centers: (i+0.5)/size)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [H, W, 2] (x, y)
    return random_pe_encode(p, grid)


def random_pe_points(p, coords: jnp.ndarray, image_size: Tuple[int, int]) -> jnp.ndarray:
    """Encode unnormalized pixel coords [..., 2] in (x, y) order."""
    scale = jnp.array([1.0 / image_size[1], 1.0 / image_size[0]], jnp.float32)
    return random_pe_encode(p, coords * scale)


# ---------------------------------------------------------------------------
# Axial RoPE (position_encoding.py:167-216), real-valued
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables [end_x*end_y, dim//2] for axial RoPE over a row-major grid."""
    n_freq = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[:n_freq].astype(np.float32) / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    angles_x = np.outer(t_x, freqs)
    angles_y = np.outer(t_y, freqs)
    angles = np.concatenate([angles_x, angles_y], axis=-1)  # [N, dim//2]
    return np.cos(angles), np.sin(angles)


def axial_rope_cos_sin(dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    cos, sin = _axial_rope_cos_sin(dim, end_x, end_y, theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, repeat: int = 1) -> jnp.ndarray:
    """Rotate consecutive channel pairs of ``x`` [..., N*repeat, D] by the tables.

    Matches ``apply_rotary_enc``: pairs are (x[2i], x[2i+1]); with
    ``repeat > 1`` the [N, D/2] tables tile along the sequence axis
    (``repeat_freqs_k`` path for cross-attention to per-frame memories).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf[..., 0::2]
    xi = xf[..., 1::2]
    if repeat > 1:
        cos = jnp.tile(cos, (repeat, 1))
        sin = jnp.tile(sin, (repeat, 1))
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    out = jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
