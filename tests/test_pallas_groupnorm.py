"""Fused GroupNorm+activation Pallas kernel: interpret-mode parity with the
jnp reference (forward and custom-VJP backward), on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.ops.pallas.groupnorm import (
    _fused_forward, _reference_gn_act, fused_group_norm_act)


CASES = [
    # (shape, groups, activation)
    ((2, 8, 8, 256), 32, "elu"),
    ((1, 16, 8, 128), 32, "relu"),
    ((3, 5, 5, 64), 32, None),     # C < 128 lanes
    ((2, 10, 4, 96), 32, "elu"),   # groups capped to divisor (32 | 96)
    ((1, 7, 3, 8), 8, "relu"),     # per-channel (InstanceNorm degenerate)
]


@pytest.mark.parametrize("shape,groups,act", CASES)
def test_forward_matches_reference(shape, groups, act):
    rng = np.random.RandomState(0)
    c = shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1
    x = jnp.asarray(rng.randn(*shape) * 3 + 1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    beta = jnp.asarray(rng.randn(c), jnp.float32)

    want = _reference_gn_act(x, gamma, beta, g, 1e-5, act)
    got = _fused_forward(x, gamma, beta, g, 1e-5, act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_forward_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 256), jnp.bfloat16)
    gamma = jnp.ones(256, jnp.float32)
    beta = jnp.zeros(256, jnp.float32)
    want = _reference_gn_act(x, gamma, beta, 32, 1e-5, "elu")
    got = _fused_forward(x, gamma, beta, 32, 1e-5, "elu", interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("act", [None, "relu", "elu"])
def test_backward_matches_autodiff(act):
    rng = np.random.RandomState(2)
    shape, g = (2, 6, 6, 64), 16
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    beta = jnp.asarray(rng.randn(64), jnp.float32)
    cot = jnp.asarray(rng.randn(*shape), jnp.float32)

    def ref_loss(x, gamma, beta):
        return jnp.sum(_reference_gn_act(x, gamma, beta, g, 1e-5, act) * cot)

    def fused_loss(x, gamma, beta):
        return jnp.sum(fused_group_norm_act(x, gamma, beta, g, 1e-5, act,
                                            True) * cot)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(x, gamma, beta)
    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x, gamma, beta)
    for w, gg, name in zip(want, got, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(w),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_groupnorm_module_uses_reference_path_on_cpu():
    """On the CPU backend the module must take the jnp path (no pallas)."""
    from retinanet_tpu.models.layers import GroupNorm
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    gn = GroupNorm(groups=32, activation="elu")
    params = gn.init(jax.random.PRNGKey(0), x)
    out = gn.apply(params, x)
    want = _reference_gn_act(x, jnp.ones(64), jnp.zeros(64), 32, 1e-5, "elu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
