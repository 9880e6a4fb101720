"""Fused GroupNorm(+activation) for TPU (Pallas).

XLA compiles the framework's two-pass GroupNorm + activation to ~144 GB/s
apparent bandwidth at head shapes (measured: 2.19 ms for [32,80,80,256]
bf16 on v5e, vs a 0.38 ms 2R+1W roofline) — GN+ELU was costing more than
the convolutions around it.  This implementation streams the tensor through
VMEM exactly twice (one read for statistics, one read+write for the fused
affine+activation) as two tiny Pallas kernels:

  kernel 1 (stats):  x strips → per-channel Σx, Σx² accumulated in a VMEM-
                     resident [1, 2, C] f32 block (written to HBM once per
                     batch element — the matmul-accumulator pattern).
  kernel 2 (apply):  per-strip  y = act(x · scale_c + shift_c)  where
                     scale/shift fold the group moments and γ/β; group
                     reduction of the channel sums happens on a [1, C]
                     vector per block — negligible.

Semantics are identical to ``models/layers.GroupNorm`` (reference
``/root/reference/normalization.py:4-35``): moments over (H, W, C/G) in
fp32, var = E[x²]−E[x]², per-channel γ/β, activation applied after.

The op carries a ``jax.custom_vjp`` whose backward is the standard GN
gradient in plain JAX (fp32), so it is usable in training as well as
serving; forward/backward parity with the jnp reference is tested in
interpret mode on CPU (``tests/test_pallas_groupnorm.py``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

# Strip size budget: keep in-flight blocks comfortably inside VMEM with
# Pallas' double buffering (2 in + 2 out per operand).
_STRIP_BYTES = 2 * 1024 * 1024


def _strip_rows(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of h whose [hs, w, c] strip fits the budget."""
    best = 1
    for hs in range(1, h + 1):
        if h % hs == 0 and hs * w * c * itemsize <= _STRIP_BYTES:
            best = hs
    return best


def _act_fn(activation: Optional[str]):
    """Kernel-safe activations: Mosaic has no ``expm1``/``erf`` lowering, so
    elu/swish/gelu are spelled out with exp/tanh (bit-compatible within
    float tolerance; the jnp reference path uses the stock jax.nn ops)."""
    if activation is None:
        return lambda x: x
    if activation == "elu":
        return lambda x: jnp.where(
            x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
    if activation == "relu":
        return lambda x: jnp.maximum(x, 0.0)
    if activation == "relu6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    if activation == "swish":
        return lambda x: x / (1.0 + jnp.exp(-x))
    if activation == "gelu":  # tanh approximation (jax.nn.gelu default)
        return lambda x: 0.5 * x * (
            1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
    raise ValueError(f"unsupported fused activation {activation!r}")


def _stats_kernel(x_ref, out_ref):
    s = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)           # [HS, W, C]
    ps = jnp.sum(x, axis=(0, 1))               # [C]
    pq = jnp.sum(x * x, axis=(0, 1))

    @pl.when(s == 0)
    def _():
        out_ref[0, 0, :] = ps
        out_ref[0, 1, :] = pq

    @pl.when(s > 0)
    def _():
        out_ref[0, 0, :] += ps
        out_ref[0, 1, :] += pq


def _apply_kernel(x_ref, sums_ref, gamma_ref, beta_ref, out_ref, *,
                  groups: int, eps: float, count: int,
                  activation: Optional[str]):
    c = x_ref.shape[-1]
    cg = c // groups
    # Segment matrix seg[c, g] = 1 iff channel c belongs to group g: group
    # reduction of the [1, C] channel sums as a tiny dot (no lane reshapes).
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    seg = (ch // cg == gr).astype(jnp.float32)  # [C, G]

    s1 = sums_ref[0, 0, :][None, :]             # [1, C]
    s2 = sums_ref[0, 1, :][None, :]
    g1 = jnp.dot(s1, seg, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, seg, preferred_element_type=jnp.float32)
    mean_g = g1 / count
    var_g = jnp.maximum(g2 / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # Broadcast group moments back to channels: [1, G] · segᵀ → [1, C].
    mean_c = jnp.dot(mean_g, seg.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, seg.T, preferred_element_type=jnp.float32)

    gamma = gamma_ref[0][None, :].astype(jnp.float32)
    beta = beta_ref[0][None, :].astype(jnp.float32)
    scale = (inv_c * gamma)[0][None, None, :]   # [1, 1, C]
    shift = (beta - mean_c * inv_c * gamma)[0][None, None, :]

    y = x_ref[0].astype(jnp.float32) * scale + shift
    out_ref[0] = _act_fn(activation)(y).astype(out_ref.dtype)


def _fused_forward(x: Array, gamma: Array, beta: Array, groups: int,
                   eps: float, activation: Optional[str],
                   interpret: bool = False) -> Array:
    b, h, w, c = x.shape
    hs = _strip_rows(h, w, c, x.dtype.itemsize)
    grid = (b, h // hs)

    sums = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, hs, w, c), lambda i, s: (i, s, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, s: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(x)

    kernel = functools.partial(_apply_kernel, groups=groups, eps=eps,
                               count=h * w * (c // groups),
                               activation=activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hs, w, c), lambda i, s: (i, s, 0, 0)),
            pl.BlockSpec((1, 2, c), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, s: (0, 0)),
            pl.BlockSpec((1, c), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hs, w, c), lambda i, s: (i, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, sums, gamma.reshape(1, c), beta.reshape(1, c))


def _reference_gn_act(x: Array, gamma: Array, beta: Array, groups: int,
                      eps: float, activation: Optional[str]) -> Array:
    """jnp fallback with identical semantics (two-pass, fp32 stats)."""
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2))
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2))
    cnt = h * w * (c // groups)
    s1g = s1.reshape(n, groups, c // groups).sum(-1, keepdims=True)
    s2g = s2.reshape(n, groups, c // groups).sum(-1, keepdims=True)
    mean = s1g / cnt
    var = jnp.maximum(s2g / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    gamma_g = gamma.reshape(groups, c // groups)[None]
    beta_g = beta.reshape(groups, c // groups)[None]
    scale = (inv * gamma_g).reshape(n, 1, 1, c)
    shift = (beta_g - mean * inv * gamma_g).reshape(n, 1, 1, c)
    out = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return _act_fn(activation)(out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_act(x: Array, gamma: Array, beta: Array, groups: int,
                         eps: float = 1e-5,
                         activation: Optional[str] = None,
                         interpret: bool = False) -> Array:
    """act(GroupNorm(x) · γ + β) with 1R (stats) + 1R1W (apply) HBM traffic."""
    return _fused_forward(x, gamma, beta, groups, eps, activation, interpret)


def _gn_moments(x32: Array, groups: int, eps: float):
    n, h, w, c = x32.shape
    cg = c // groups
    xg = x32.reshape(n, h * w, groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)      # [n,1,G,1]
    var = jnp.maximum(jnp.mean(xg * xg, axis=(1, 3), keepdims=True)
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return xg, mean, inv


def _fwd(x, gamma, beta, groups, eps, activation, interpret):
    y = _fused_forward(x, gamma, beta, groups, eps, activation, interpret)
    return y, (x, gamma, beta)


def _bwd(groups, eps, activation, interpret, res, g):
    """Standard GroupNorm backward (plain JAX, fp32) + activation backward.

    Recomputes the normalized activations from the residuals — cheaper in
    HBM than saving them, and keeps the forward kernel storage-free.
    """
    x, gamma, beta = res
    n, h, w, c = x.shape
    cg = c // groups
    x32 = x.astype(jnp.float32)
    xg, mean, inv = _gn_moments(x32, groups, eps)
    xhat = ((xg - mean) * inv).reshape(n, h, w, c)
    z = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)

    g32 = g.astype(jnp.float32)
    if activation is None:
        dz = g32
    elif activation == "relu":
        dz = g32 * (z > 0)
    elif activation == "elu":
        dz = g32 * jnp.where(z > 0, 1.0, jnp.exp(jnp.minimum(z, 0.0)))
    elif activation == "relu6":
        dz = g32 * ((z > 0) & (z < 6))
    else:
        # Generic fallback: differentiate the activation with jax.
        _, act_vjp = jax.vjp(_act_fn(activation), z)
        (dz,) = act_vjp(g32)

    dgamma = jnp.sum(dz * xhat, axis=(0, 1, 2))
    dbeta = jnp.sum(dz, axis=(0, 1, 2))

    dxhat = (dz * gamma.astype(jnp.float32)).reshape(n, h * w, groups, cg)
    xhat_g = xhat.reshape(n, h * w, groups, cg)
    m = h * w * cg
    sum_dxhat = jnp.sum(dxhat, axis=(1, 3), keepdims=True)
    sum_dxhat_xhat = jnp.sum(dxhat * xhat_g, axis=(1, 3), keepdims=True)
    dx = (inv / m) * (m * dxhat - sum_dxhat - xhat_g * sum_dxhat_xhat)
    dx = dx.reshape(n, h, w, c).astype(x.dtype)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


fused_group_norm_act.defvjp(_fwd, _bwd)
