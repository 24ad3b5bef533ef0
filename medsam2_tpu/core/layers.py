"""Functional neural-net primitives (pure apply fns over param pytrees).

Design: every module is a pair of functions — ``*_init(key, ...) -> params`` and
``*_apply(params, x, ...) -> y`` — with params stored as plain nested dicts. This
keeps the torch->JAX checkpoint converter a direct name mapping, makes modules
trivially usable inside ``lax.scan``/``shard_map``, and leaves all state explicit.

Conventions (TPU-native):
  - Activations are channels-last: images NHWC, tokens [B, N, C].
  - Linear weights are stored ``[in, out]`` (apply is ``x @ w + b``); the
    converter transposes torch's ``[out, in]``.
  - Conv weights are stored HWIO; the converter transposes torch's OIHW.
  - Params are float32; hot-path compute may cast to bfloat16 at module entry.

Numerical-parity notes vs the reference (PyTorch):
  - ``layer_norm`` matches ``nn.LayerNorm`` (biased variance, eps inside sqrt).
  - ``layer_norm_2d`` matches the channels-first LayerNorm2d of
    ``sam2_train/modeling/sam2_utils.py:137-149`` (applied here over the last
    axis of NHWC tensors, which is the same channel axis).
  - ``interpolate`` matches ``torch.nn.functional.interpolate`` with
    ``align_corners=False`` for bilinear/bicubic and exact ``nearest`` index
    arithmetic for nearest.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# For float32 inputs, force exact (6-pass) MXU matmuls — default precision lets
# XLA:TPU truncate fp32 operands to bf16, which breaks checkpoint parity. For
# bfloat16 inputs (the hot path) this flag is a no-op, so there is no perf cost
# where it matters.
PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal on [-2*std, 2*std] matching ``torch.nn.init.trunc_normal_``."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True):
    """Matches ``nn.Linear`` default init: kaiming_uniform(a=sqrt(5)) on the weight
    and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias — both reduce to the same
    fan-in uniform bound."""
    kw, kb = jax.random.split(key)
    p = {"w": _fan_in_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (out_dim,), in_dim)
    return p


def linear_apply(p, x):
    y = jnp.matmul(x, p["w"].astype(x.dtype), precision=PRECISION)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(key, num: int, dim: int):
    """Matches ``nn.Embedding`` default init (standard normal)."""
    return {"w": jax.random.normal(key, (num, dim), jnp.float32)}


def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int], bias: bool = True, groups: int = 1):
    kh, kw = kernel
    fan_in = in_ch // groups * kh * kw
    k1, k2 = jax.random.split(key)
    p = {"w": _fan_in_uniform(k1, (kh, kw, in_ch // groups, out_ch), fan_in)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (out_ch,), fan_in)
    return p


def conv2d_apply(p, x, stride: Tuple[int, int] = (1, 1), padding="SAME_TORCH",
                 explicit_padding: Optional[Tuple[int, int]] = None, groups: int = 1):
    """NHWC conv. ``explicit_padding=(ph, pw)`` mirrors torch's symmetric int padding."""
    if (p["w"].shape[0] == 1 and p["w"].shape[1] == 1 and stride == (1, 1)
            and groups == 1 and (explicit_padding is None
                                 or explicit_padding == (0, 0))):
        # 1x1/stride-1 conv == per-pixel matmul. Lowered as a dot so XLA's
        # layout assignment never sees a convolution here: conv ops pull
        # activations into conv-preferred layouts, which showed up as
        # [1,64,64,256]-class relayout copies around the FPN neck /
        # memory-path boundaries in the audited @1024 scan HLO.
        y = jnp.matmul(x, p["w"][0, 0].astype(x.dtype), precision=PRECISION)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y
    if explicit_padding is not None:
        pad = [(explicit_padding[0], explicit_padding[0]), (explicit_padding[1], explicit_padding[1])]
    elif padding == "VALID":
        pad = [(0, 0), (0, 0)]
    else:
        kh, kw = p["w"].shape[0], p["w"].shape[1]
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=PRECISION,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


@functools.lru_cache(maxsize=32)
def _wfold_map(F: int) -> "np.ndarray":
    """Static 0/1 placement tensor M[a, b, a', beta, r, jr] assembling the
    folded kernel wf[a', beta, (r, c), (jr, o)] = sum_ab w[a, b] M[...]."""
    import numpy as np

    P = F // 2
    M = np.zeros((3, 3, 4, 2, F, P), np.float32)
    for a in range(3):
        for b in range(3):
            for jr in range(P):
                beta, r = divmod(2 * jr + 1 + b, F)
                M[a, b, a + 1, beta, r, jr] = 1.0
    return M


def conv3s2_wfold(p, x, fold: int = 0):
    """3x3/stride-2/pad-1 conv via a width-folded lowering (exact).

    Tiny-channel strided convs (the memory encoder's mask downsampler starts
    at C_in=1 @ full image resolution) lower terribly on TPU: the channel
    (lane) dim is nearly empty. This recasts the conv with ZERO data
    transposes: pad (2,0)/(2,F-2), fold the width by F into channels (a
    contiguous reshape), and emit the F/2 output phases as output channels of
    a [4, 2, F*C -> (F/2)*Cout] conv with stride (2, 1); the output phase
    unfold is again a free reshape. The dense folded kernel does ~F/2x the
    sparse tap MACs, which the MXU absorbs for free at tiny C while lane
    utilization goes from C/128 to F*C/128.

    Derivation: out(i, P*J + jr) = sum_{a,b<3} x[2i-1+a, 2(PJ+jr)-1+b] w[a,b]
    with P = F/2; padding 2 left makes the column F*(J+beta) + r with
    F*beta + r = 2*jr + 1 + b. Requires H even; F auto-picked (fold=0) as the
    largest power of two <= 32 with F | W and F*C <= 256.
    """
    B, H, W, C = x.shape
    w = p["w"]  # [3, 3, C, O]
    O = w.shape[-1]
    if fold == 0:
        fold = 4
        while fold < 32 and W % (fold * 2) == 0 and (fold * 2) * C <= 256:
            fold *= 2
    F, P = fold, fold // 2

    xp = jnp.pad(x, ((0, 0), (2, 0), (2, F - 2), (0, 0)))   # [B, H+2, W+F, C]
    xw = xp.reshape(B, H + 2, (W + F) // F, F * C)

    M = jnp.asarray(_wfold_map(F))
    wf = jnp.einsum("abco,abxyzj->xyzcjo", w, M.astype(w.dtype),
                    precision=PRECISION)
    wf = wf.reshape(4, 2, F * C, P * O)

    y = jax.lax.conv_general_dilated(
        xw, wf.astype(x.dtype), (2, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PRECISION)
    y = y.reshape(B, H // 2, W // 2, O)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int], bias: bool = True):
    kh, kw = kernel
    fan_in = out_ch * kh * kw  # torch fan-in for ConvTranspose2d weight (in, out, kh, kw)
    k1, k2 = jax.random.split(key)
    # Stored as [kh, kw, out, in]: lax.conv_transpose(transpose_kernel=True) wants
    # the *forward* conv's HWIO kernel, whose I is our out and O our in. The
    # converter maps torch's (in, out, kh, kw) via transpose(2, 3, 1, 0).
    p = {"w": _fan_in_uniform(k1, (kh, kw, out_ch, in_ch), fan_in)}
    if bias:
        p["b"] = _fan_in_uniform(k2, (out_ch,), fan_in)
    return p


def conv_transpose2d_apply(p, x, stride: Tuple[int, int]):
    """Matches ``nn.ConvTranspose2d(kernel_size=stride, stride=stride)`` (no padding)."""
    y = jax.lax.conv_transpose(
        x,
        p["w"].astype(x.dtype),
        strides=stride,
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=PRECISION,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis; statistics in fp32 for bf16 safety."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# LayerNorm2d of the reference normalizes the channel axis of NCHW tensors with
# eps inside sqrt of the *biased* variance (sam2_utils.py:144-149). On NHWC that
# is exactly layer_norm over the last axis but with eps=1e-6.
def layer_norm_2d_apply(p, x, eps: float = 1e-6):
    return layer_norm_apply(p, x, eps=eps)


def mlp_init(key, input_dim: int, hidden_dim: int, output_dim: int, num_layers: int):
    """SAM-style MLP (``sam2_utils.py:108-132``): num_layers Linear layers."""
    dims = [input_dim] + [hidden_dim] * (num_layers - 1) + [output_dim]
    keys = jax.random.split(key, num_layers)
    return {"layers": [linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]}


def mlp_apply(p, x, activation: Callable = jax.nn.relu, sigmoid_output: bool = False):
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear_apply(lp, x)
        if i < n - 1:
            x = activation(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def gelu(x):
    """GELU matching ``nn.GELU()`` (exact erf) in fp32/fp64; in bf16/fp16 the
    tanh approximation is used instead.

    Measured on v5e the erf lowering runs ~20 ns/element on the VPU and was
    the single largest encoder cost (~2 ms/frame at 1024 px, 6-8x the matmul
    time it feeds); the tanh form runs 6x faster. Accuracy: vs fp32 exact
    GELU at bf16 inputs, max|err| is 0.0093 for tanh-approx and 0.0098 for
    bf16 exact-erf (bf16 quantization floor 0.0078) — the approximation is
    *no less accurate* than computing erf in bf16, so the hot path loses
    nothing (scripts/profile_gelu.py).
    """
    if x.dtype in (jnp.float32, jnp.float64):
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {"relu": jax.nn.relu, "gelu": gelu}


# ---------------------------------------------------------------------------
# Resize (torch F.interpolate parity)
# ---------------------------------------------------------------------------


def interpolate(x, size: Tuple[int, int], method: str = "bilinear", antialias: bool = False):
    """Resize NHWC ``x`` to spatial ``size``.

    Matches ``F.interpolate(..., align_corners=False)`` for bilinear/bicubic and
    torch's ``nearest`` (floor of scaled source index). ``antialias=True``
    matches torch's antialiased downsampling (both use the same triangle/cubic
    filter scaling convention as jax.image).
    """
    B, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    if method == "nearest":
        # torch nearest: src = floor(dst * H / h) (scale = in/out)
        rows = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
        cols = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
        rows = jnp.clip(rows, 0, H - 1)
        cols = jnp.clip(cols, 0, W - 1)
        return x[:, rows][:, :, cols]
    jax_method = {"bilinear": "linear", "bicubic": "cubic"}[method]
    return jax.image.resize(x, (B, h, w, C), method=jax_method, antialias=antialias)


def bilinear_resize_ac(x, size: Tuple[int, int]):
    """Bilinear resize of NHWC ``x`` matching ``F.interpolate(...,
    mode="bilinear", align_corners=True)``: source coordinate =
    dst * (in-1)/(out-1). Taps/weights are static numpy (shape-only)."""
    B, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x

    def taps(n_in, n_out):
        if n_out == 1:
            src = np.zeros(1)
        else:
            src = np.arange(n_out) * ((n_in - 1) / (n_out - 1))
        i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        f = (src - i0).astype(np.float32)
        return i0, i1, f

    r0, r1, fr = taps(H, h)
    c0, c1, fc = taps(W, w)
    fr = jnp.asarray(fr, x.dtype).reshape(1, h, 1, 1)
    fc = jnp.asarray(fc, x.dtype).reshape(1, 1, w, 1)
    xr = x[:, r0] * (1 - fr) + x[:, r1] * fr
    return xr[:, :, c0] * (1 - fc) + xr[:, :, c1] * fc


def _torch_cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution weights for taps (-1, 0, 1, 2) at fractions ``t`` [N] -> [N, 4]."""
    t = t.astype(np.float64)
    w_m1 = a * (t + 1) ** 3 - 5 * a * (t + 1) ** 2 + 8 * a * (t + 1) - 4 * a
    w_0 = (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
    w_1 = (a + 2) * (1 - t) ** 3 - (a + 3) * (1 - t) ** 2 + 1
    w_2 = 1.0 - w_m1 - w_0 - w_1
    return np.stack([w_m1, w_0, w_1, w_2], axis=-1)


def bicubic_resize_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side bicubic resize of [H, W, C] matching torch's
    ``F.interpolate(mode="bicubic", align_corners=False)`` (a=-0.75 kernel,
    clamped borders). Used for the static Hiera pos-embed interpolation
    (``hieradet.py:272``) so the jitted graph never sees it."""

    def resize_axis(arr, out_size, axis):
        in_size = arr.shape[axis]
        if in_size == out_size:
            return arr
        src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        weights = _torch_cubic_weights(t)  # [out, 4]
        taps = np.stack([np.clip(i0 + d, 0, in_size - 1) for d in (-1, 0, 1, 2)], axis=-1)
        arr_m = np.moveaxis(arr, axis, 0)  # [in, ...]
        gathered = arr_m[taps]  # [out, 4, ...]
        w = weights.reshape(out_size, 4, *([1] * (arr_m.ndim - 1)))
        out = (gathered * w).sum(axis=1)
        return np.moveaxis(out, 0, axis)

    y = resize_axis(x.astype(np.float64), out_h, 0)
    y = resize_axis(y, out_w, 1)
    return y.astype(x.dtype)


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """In-graph bicubic resize of [B, H, W, C] matching torch (a=-0.75,
    align_corners=False). Tap indices/weights are static numpy (shape-only), so
    under jit this lowers to two gathers + weighted sums — cheap and fusible."""

    def axis_plan(in_size, out_size):
        src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        i0 = np.floor(src).astype(np.int64)
        w = _torch_cubic_weights(src - i0).astype(np.float32)  # [out, 4]
        taps = np.stack([np.clip(i0 + d, 0, in_size - 1) for d in (-1, 0, 1, 2)], -1)
        return taps, w

    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    taps_h, w_h = axis_plan(H, out_h)
    taps_w, w_w = axis_plan(W, out_w)
    y = x
    if H != out_h:
        g = y[:, taps_h.reshape(-1)].reshape(B, out_h, 4, W, -1)
        y = jnp.einsum("bhtwc,ht->bhwc", g, jnp.asarray(w_h), precision=PRECISION)
    if W != out_w:
        g = y[:, :, taps_w.reshape(-1)].reshape(B, out_h, out_w, 4, -1)
        y = jnp.einsum("bhwtc,wt->bhwc", g, jnp.asarray(w_w), precision=PRECISION)
    return y


def window_partition(x, window_size: int):
    """[B, H, W, C] -> ([B*nW, ws, ws, C], (Hp, Wp)); pads bottom/right like
    ``backbones/utils.py:16-38``."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    """Inverse of :func:`window_partition` (``backbones/utils.py:41-62``)."""
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def max_pool2d(x, kernel: Tuple[int, int], stride: Tuple[int, int]):
    """NHWC max pool, ceil_mode=False (matches ``nn.MaxPool2d(kernel, stride)``)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, kernel[0], kernel[1], 1),
        (1, stride[0], stride[1], 1),
        "VALID",
    )


def drop_path(key, x, drop_prob: float, deterministic: bool):
    """Stochastic depth (``sam2_utils.py:88-103``); identity when deterministic."""
    if deterministic or drop_prob == 0.0:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape).astype(x.dtype)
    return x * mask / keep
