"""Parity for the fused LN->MLP->residual Pallas kernel (interpret mode —
the compiled kernel runs only on TPU) against the exact library lowering
(``layers.layer_norm_apply`` + ``layers.mlp_apply`` with ``layers.gelu``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medsam2_tpu.core import layers
from medsam2_tpu.ops import fused_mlp


def _params(rng, C, H, dtype=np.float32):
    norm_p = {"scale": jnp.asarray(rng.standard_normal(C), jnp.float32),
              "bias": jnp.asarray(rng.standard_normal(C), jnp.float32)}
    mlp_p = {"layers": [
        {"w": jnp.asarray(rng.standard_normal((C, H)) * 0.05, jnp.float32),
         "b": jnp.asarray(rng.standard_normal(H) * 0.05, jnp.float32)},
        {"w": jnp.asarray(rng.standard_normal((H, C)) * 0.05, jnp.float32),
         "b": jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)},
    ]}
    return norm_p, mlp_p


@pytest.mark.parametrize("dtype,N,C,H,tol", [
    (jnp.float32, 512, 96, 384, 1e-5),
    (jnp.float32, 1280, 192, 768, 1e-5),   # ragged: 1280 -> block 256
    (jnp.bfloat16, 1024, 96, 384, 2e-2),
])
def test_fused_matches_reference(rng, dtype, N, C, H, tol):
    norm_p, mlp_p = _params(rng, C, H)
    x = jnp.asarray(rng.standard_normal((N, C)), dtype)
    ref = fused_mlp._reference(x, norm_p, mlp_p, 1e-6)
    (l1, l2) = mlp_p["layers"]
    got = fused_mlp._pallas_fwd(x, norm_p["scale"], norm_p["bias"],
                                l1["w"], l1["b"], l2["w"], l2["b"], 1e-6,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=tol, atol=tol)


def test_wrapper_falls_back_off_tpu(rng, monkeypatch):
    """On CPU (or with the gate off) the wrapper must take the reference path
    bit-for-bit, including inside jit."""
    monkeypatch.setenv("MEDSAM2_FUSED_MLP", "1")
    norm_p, mlp_p = _params(rng, 96, 384)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 96)), jnp.float32)
    ref = x + layers.mlp_apply(
        mlp_p, layers.layer_norm_apply(norm_p, x, eps=1e-6),
        activation=layers.gelu)
    got = jax.jit(lambda a: fused_mlp.ln_mlp_residual(a, norm_p, mlp_p))(x)
    # jit fusion may re-associate fp32 rounding vs the eager reference
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_custom_vjp_matches_reference_grads(rng):
    norm_p, mlp_p = _params(rng, 96, 384)
    x = jnp.asarray(rng.standard_normal((256, 96)), jnp.float32)

    def loss_ref(a, n, m):
        return jnp.sum(fused_mlp._reference(a, n, m, 1e-6) ** 2)

    def loss_fused(a, n, m):
        return jnp.sum(fused_mlp._ln_mlp_res(a, n, m, 1e-6) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, norm_p, mlp_p)
    # the custom_vjp backward is the reference vjp; forward runs the kernel —
    # on CPU pallas_call would fail to compile, so only check the bwd rule is
    # wired by evaluating through interpret mode via a shim
    import medsam2_tpu.ops.fused_mlp as fm
    orig = fm._pallas_fwd
    fm._pallas_fwd = lambda *a, **k: orig(*a, interpret=True, **{kk: vv for kk, vv in k.items() if kk != "interpret"})
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, norm_p, mlp_p)
    finally:
        fm._pallas_fwd = orig
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
