"""Chained Pallas DepthConvBlock kernel vs the conv composition (interpret
mode on CPU; the same kernel runs under Mosaic on real TPU) — and the
SSGVC_PALLAS_DCB=2 model-level gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.layers.blocks import DepthConvBlock
from ssgvc_tpu.ops.pallas_dcb_chain import (_plan_segments, dcb_chain_fused)


def _chain_params(n, c, key=0):
    """n blocks' params with perturbed zero-init tails (so every op
    contributes), in dcb_chain_fused's per-block tuple layout."""
    rng = np.random.default_rng(key)
    x = jnp.zeros((1, 8, 16, c))
    blocks = []
    for j in range(n):
        p = DepthConvBlock(c).init(jax.random.PRNGKey(j), x)["params"]
        p = jax.tree_util.tree_map(
            lambda a: a + 0.01 * jnp.asarray(
                rng.standard_normal(a.shape), a.dtype), p)
        blocks.append((p["dc_0"]["kernel"], p["dc_0"]["bias"],
                       p["dc_2"]["kernel"], p["dc_2"]["bias"],
                       p["dc_3"]["kernel"], p["dc_3"]["bias"],
                       p["ffn_0"]["kernel"], p["ffn_0"]["bias"],
                       p["ffn_2"]["kernel"], p["ffn_2"]["bias"]))
    return blocks


def _ref_chain(x, blocks, q_last=None):
    mod = DepthConvBlock(x.shape[-1])
    names = ("dc_0", "dc_2", "dc_3", "ffn_0", "ffn_2")
    for bp in blocks:
        p = {nm: {"kernel": bp[2 * i], "bias": bp[2 * i + 1]}
             for i, nm in enumerate(names)}
        x = mod.apply({"params": p}, x)
    return x if q_last is None else x * q_last


@pytest.mark.parametrize("n,H", [(2, 12), (3, 12), (4, 16)])
def test_chain_matches_conv_path(n, H):
    C, W = 128, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, C),
                          jnp.float32) * 0.5
    blocks = _chain_params(n, C)
    out = dcb_chain_fused(x, blocks)
    ref = _ref_chain(x, blocks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_chain_q_last_fold():
    C, H, W = 128, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, C),
                          jnp.float32) * 0.5
    q = jnp.linspace(0.5, 1.5, C).reshape(1, 1, 1, C)
    blocks = _chain_params(2, C, key=1)
    out = dcb_chain_fused(x, blocks, q_last=q)
    ref = _ref_chain(x, blocks, q_last=q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_chain_edge_masking_matches_at_every_tile_boundary():
    """Tall thin frame forces multiple grid steps; the N-row halo plus
    per-block zero-masking must reproduce the depthwise zero-padding at the
    frame's top/bottom rows exactly."""
    C, H, W = 128, 24, 16
    x = jax.random.normal(jax.random.PRNGKey(7), (1, H, W, C),
                          jnp.float32)
    blocks = _chain_params(3, C, key=2)
    out = dcb_chain_fused(x, blocks)
    ref = _ref_chain(x, blocks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_plan_segments_splits_oversized_chains():
    # huge activation shapes: no single segment of 4 fits VMEM, but a
    # split plan must still cover all 4 blocks
    plan = _plan_segments(136, 240, 256, 4, itemsize=4)
    assert plan and sum(n for n, _ in plan) == 4
    for n, th in plan:
        assert th + 2 * n <= 3 * th
    # tiny shapes: one segment
    assert _plan_segments(16, 16, 128, 4, itemsize=4) == [(4, 16)]


def test_model_flag2_parity(monkeypatch):
    """SSGVC_PALLAS_DCB=2 routes the DMC chains through the kernel with an
    identical param tree and matching outputs (fp32, interpret mode)."""
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC

    cfg = DMCConfig.variant("performance", ch_d=256, ch_y=128, ch_z=128,
                            ch_recon=320, packed_io=False)
    model = DMC(cfg)
    H = W = 64
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 1))
            > 0.5).astype(jnp.float32)
    dpb = {"frame": jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 3)),
           "feature": jax.random.normal(
               jax.random.PRNGKey(5), (1, H // 8, W // 8, cfg.ch_d)) * 0.1}
    v = model.init(rngs, x, jnp.int32(32), dpb, after_i=False, mask=mask,
                   train=False)
    ref = model.apply(v, x, jnp.int32(32), dpb, after_i=False, mask=mask,
                      train=False)

    monkeypatch.setenv("SSGVC_PALLAS_DCB", "2")
    v2 = model.init(rngs, x, jnp.int32(32), dpb, after_i=False, mask=mask,
                    train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    out = model.apply(v, x, jnp.int32(32), dpb, after_i=False, mask=mask,
                      train=False)
    np.testing.assert_allclose(np.asarray(out["dpb"]["frame"]),
                               np.asarray(ref["dpb"]["frame"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["bpp"]),
                               np.asarray(ref["bpp"]), rtol=1e-4, atol=1e-6)
