"""Fused whole-bottleneck serving kernel (ops/pallas/bottleneck.py).

Checks, on the CPU interpreter:
  * the kernel is numerically identical to the flax ResNetBottleneck
    (bf16 rounding points match, so the comparison is exact);
  * the ``fused=True`` module path produces the SAME parameter tree as the
    unfused path (checkpoint compatibility) and the same outputs;
  * training mode and projection blocks never take the fused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.models.resnet import ResNet50, ResNetBottleneck
from retinanet_tpu.ops.pallas.bottleneck import fused_bottleneck


def _randomized_params(block, x, seed=1):
    import flax
    params = block.init(jax.random.PRNGKey(0), x, training=False)["params"]
    flat = flax.traverse_util.flatten_dict(params)
    key = jax.random.PRNGKey(seed)
    for k in flat:
        key, sub = jax.random.split(key)
        if k[-1] in ("gamma", "beta"):
            flat[k] = (jax.random.normal(sub, flat[k].shape) * 0.3
                       + (1.0 if k[-1] == "gamma" else 0.0))
    return flax.traverse_util.unflatten_dict(flat)


def test_fused_kernel_matches_block():
    rng = np.random.RandomState(0)
    b, h, w, f = 2, 16, 12, 16
    c = 4 * f
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    block = ResNetBottleneck(filters=f, project=False)
    params = _randomized_params(block, x)
    ref = block.apply({"params": params}, x, training=False)

    g = lambda *path: params[path[0]][path[1]][path[2]]
    out = fused_bottleneck(
        x,
        g("ConvGN_0", "Conv_0", "kernel"),
        g("ConvGN_0", "GroupNorm_0", "gamma"),
        g("ConvGN_0", "GroupNorm_0", "beta"),
        g("ConvGN_1", "Conv_0", "kernel"),
        g("ConvGN_1", "GroupNorm_0", "gamma"),
        g("ConvGN_1", "GroupNorm_0", "beta"),
        g("ConvGN_2", "Conv_0", "kernel"),
        g("ConvGN_2", "GroupNorm_0", "gamma"),
        g("ConvGN_2", "GroupNorm_0", "beta"),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_fused_module_param_tree_and_output():
    rng = np.random.RandomState(1)
    b, h, w, f = 1, 8, 8, 16
    x = jnp.asarray(rng.randn(b, h, w, 4 * f), jnp.bfloat16)
    plain = ResNetBottleneck(filters=f, project=False)
    fused = ResNetBottleneck(filters=f, project=False, fused=True)
    params = _randomized_params(plain, x)
    fused_params = fused.init(jax.random.PRNGKey(0), x, training=False)
    # Checkpoint compatibility: identical names and shapes.
    assert (jax.tree.map(jnp.shape, fused_params["params"])
            == jax.tree.map(jnp.shape, params))
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))
    # Training mode must take the XLA path (fused has no VJP) — the
    # gradient existing at all proves it.
    def loss(p):
        return jnp.sum(fused.apply(
            {"params": p}, x, training=True).astype(jnp.float32))
    grads = jax.grad(loss)(params)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


def test_projection_blocks_never_fuse():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.bfloat16)
    block = ResNetBottleneck(filters=16, project=True, fused=True)
    params = block.init(jax.random.PRNGKey(0), x, training=False)["params"]
    assert "ConvGN_3" in params  # projection ConvGN exists → XLA path ran
    out = block.apply({"params": params}, x, training=False)
    assert out.shape == (1, 8, 8, 64)


def test_fused_proj_kernel_matches_block():
    """Stride-1 projection kernel (fused_bottleneck_proj) vs the flax
    block with project=True: exact on a single strip (same bf16 rounding
    points), allclose across ragged strips (GN moments accumulate
    per-strip)."""
    from retinanet_tpu.ops.pallas.bottleneck import fused_bottleneck_proj

    rng = np.random.RandomState(5)
    b, h, w, f, cin = 2, 16, 12, 16, 24
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)
    block = ResNetBottleneck(filters=f, project=True)
    params = _randomized_params(block, x)
    ref = np.asarray(block.apply({"params": params}, x, training=False),
                     np.float32)

    g = lambda *path: params[path[0]][path[1]][path[2]]
    args = (x,
            g("ConvGN_1", "Conv_0", "kernel"),
            g("ConvGN_1", "GroupNorm_0", "gamma"),
            g("ConvGN_1", "GroupNorm_0", "beta"),
            g("ConvGN_2", "Conv_0", "kernel"),
            g("ConvGN_2", "GroupNorm_0", "gamma"),
            g("ConvGN_2", "GroupNorm_0", "beta"),
            g("ConvGN_3", "Conv_0", "kernel"),
            g("ConvGN_3", "GroupNorm_0", "gamma"),
            g("ConvGN_3", "GroupNorm_0", "beta"),
            g("ConvGN_0", "Conv_0", "kernel"),
            g("ConvGN_0", "GroupNorm_0", "gamma"),
            g("ConvGN_0", "GroupNorm_0", "beta"))
    out = fused_bottleneck_proj(*args, interpret=True, strip_rows=0)
    np.testing.assert_array_equal(ref, np.asarray(out, np.float32))
    out = fused_bottleneck_proj(*args, interpret=True, strip_rows=6)
    o = np.asarray(out, np.float32)
    np.testing.assert_allclose(ref, o, rtol=5e-2, atol=1e-1)
    assert (ref == o).mean() > 0.98


def test_fused_proj_module_param_tree_and_output():
    """fused_proj=True on the project=True block: identical param tree
    (checkpoint compatibility), equal output, and training still takes the
    XLA path (gradients exist)."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 8, 8, 24), jnp.bfloat16)
    plain = ResNetBottleneck(filters=16, project=True)
    fused = ResNetBottleneck(filters=16, project=True, fused_proj=True,
                             fused_strip_rows=0)
    params = _randomized_params(plain, x)
    fused_params = fused.init(jax.random.PRNGKey(0), x, training=False)
    assert (jax.tree.map(jnp.shape, fused_params["params"])
            == jax.tree.map(jnp.shape, params))
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))

    def loss(p):
        return jnp.sum(fused.apply(
            {"params": p}, x, training=True).astype(jnp.float32))
    grads = jax.grad(loss)(params)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


def test_down_blocks_never_fuse_proj():
    """Stride-2 'down' blocks must stay on XLA even with fused_proj."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 8, 64), jnp.bfloat16)
    block = ResNetBottleneck(filters=16, project="down", fused=True,
                             fused_proj=True)
    params = block.init(jax.random.PRNGKey(0), x, training=False)["params"]
    out = block.apply({"params": params}, x, training=False)
    assert out.shape == (1, 4, 4, 64)


def test_fused_res2_geometry_matches():
    """res2 geometry (filters=64, 256-wide residual): the fused_res2 lever
    applies the kernel to the 64-wide blocks too; bitwise equality on a
    direct input, same as the wider blocks."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 20, 20, 256), jnp.bfloat16)
    plain = ResNetBottleneck(filters=64, project=False)
    fused = ResNetBottleneck(filters=64, project=False, fused=True)
    params = _randomized_params(plain, x)
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_resnet50_fused_res2_flag_reaches_blocks():
    """fused_res2=True widens fusion to filters=64 blocks (smoke: the
    backbone still runs and matches the unfused taps within the same
    whole-backbone tolerance as test_resnet50_fused_matches_unfused)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.bfloat16)
    plain = ResNet50()
    fused = ResNet50(fused_blocks=True, fused_res2=True)
    params = plain.init(jax.random.PRNGKey(0), x, training=False)["params"]
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        np.testing.assert_allclose(r, o, rtol=5e-2, atol=1e-1, err_msg=k)


def test_resnet50_fused_matches_unfused():
    """Whole-backbone equivalence: fused_blocks=True applies the kernel to
    every stride-1 block with filters>=128 and reproduces the unfused
    backbone to bf16 accumulation-order tolerance (CPU interpret).

    Single blocks on direct inputs match bitwise (tests above); through a
    real conv stack the fp32 accumulation ORDER of lax.conv vs jnp.dot
    differs, so activations land on adjacent bf16 values, and GN statistics
    propagate those ULPs multiplicatively through 16 blocks — measured:
    C3 exact, C4 ≤1 ULP, C5 99.7% of elements within 2% with a 0.3% tail
    of ≤0.06-absolute outliers near relu boundaries.  The check is
    therefore absolute-tolerance + near-perfect correlation; bit-placement
    is pinned by the single-block tests."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.bfloat16)
    plain = ResNet50()
    fused = ResNet50(fused_blocks=True)
    params = plain.init(jax.random.PRNGKey(0), x, training=False)["params"]
    assert (jax.tree.map(jnp.shape,
                         fused.init(jax.random.PRNGKey(0), x,
                                    training=False)["params"])
            == jax.tree.map(jnp.shape, params))
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        np.testing.assert_allclose(r, o, rtol=5e-2, atol=1e-1, err_msg=k)
        corr = np.corrcoef(r.ravel(), o.ravel())[0, 1]
        assert corr > 0.9999, (k, corr)


def test_strip_kernel_matches_block():
    """Strip-tiled kernel (strip_rows>0) vs the flax block, including a
    ragged tail strip (h=20, strips of 8 → 8+8+4).  GN moments accumulate
    per-strip, so fp32 summation ORDER differs from the whole-image
    jnp.sum — equality is to bf16-neighbour tolerance, not bitwise."""
    rng = np.random.RandomState(7)
    b, h, w, f = 2, 20, 12, 16
    c = 4 * f
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    block = ResNetBottleneck(filters=f, project=False)
    params = _randomized_params(block, x)
    ref = np.asarray(block.apply({"params": params}, x, training=False),
                     np.float32)

    g = lambda *path: params[path[0]][path[1]][path[2]]
    args = [g(f"ConvGN_{i}", "Conv_0", "kernel") for i in range(3)]
    packed = []
    for i in range(3):
        packed += [g(f"ConvGN_{i}", "Conv_0", "kernel"),
                   g(f"ConvGN_{i}", "GroupNorm_0", "gamma"),
                   g(f"ConvGN_{i}", "GroupNorm_0", "beta")]
    for strip_rows in (8, 20, 64):  # ragged tail / exact h / clamps to whole
        out = np.asarray(
            fused_bottleneck(x, *packed, interpret=True,
                             strip_rows=strip_rows), np.float32)
        np.testing.assert_allclose(ref, out, rtol=2e-2, atol=2e-2,
                                   err_msg=f"strip_rows={strip_rows}")
        # bf16 rounding points match → the overwhelming majority of
        # elements are bit-identical despite the stats-order difference.
        assert (ref == out).mean() > 0.98, strip_rows


def test_resnet50_res2_strips_matches_unfused():
    """fused_res2_strips routes res2 blocks through the strip kernel;
    whole-backbone agreement at the standard fused-backbone tolerance."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.bfloat16)
    plain = ResNet50()
    fused = ResNet50(fused_blocks=True, fused_res2=True, fused_res2_strips=4)
    params = plain.init(jax.random.PRNGKey(0), x, training=False)["params"]
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        np.testing.assert_allclose(r, o, rtol=5e-2, atol=1e-1, err_msg=k)


def test_resnet50_res4_strips_matches_unfused():
    """fused_res4_strips routes res4 (filters=256) identity blocks through
    the strip kernel; whole-backbone agreement at the standard tolerance
    (the bench-adopted serving stack is res2s20 + res3s10 + res4s10)."""
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.bfloat16)
    plain = ResNet50()
    fused = ResNet50(fused_blocks=True, fused_res4_strips=1)
    params = plain.init(jax.random.PRNGKey(0), x, training=False)["params"]
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        np.testing.assert_allclose(r, o, rtol=5e-2, atol=1e-1, err_msg=k)


def test_resnet50_res3_strips_matches_unfused():
    """fused_res3_strips routes res3 (filters=128) identity blocks through
    the strip kernel (res4/res5 stay whole-image); whole-backbone agreement
    at the standard fused-backbone tolerance."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.bfloat16)
    plain = ResNet50()
    fused = ResNet50(fused_blocks=True, fused_res3_strips=3)
    params = plain.init(jax.random.PRNGKey(0), x, training=False)["params"]
    ref = plain.apply({"params": params}, x, training=False)
    out = fused.apply({"params": params}, x, training=False)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        np.testing.assert_allclose(r, o, rtol=5e-2, atol=1e-1, err_msg=k)
