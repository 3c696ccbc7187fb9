"""Fused Pallas DepthConvBlock vs the conv composition (interpret mode on
CPU; the same kernel runs under Mosaic on real TPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.layers.blocks import DepthConvBlock
from ssgvc_tpu.ops.pallas_dcb import dcb_fused


def _params_for(mod, x, q=None):
    rng = jax.random.PRNGKey(0)
    args = (x,) if q is None else (x, q)
    p = mod.init(rng, *args)["params"]
    # perturb the zero-init tails so every op contributes
    return jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.asarray(
            np.random.default_rng(1).standard_normal(a.shape), a.dtype), p)


@pytest.mark.parametrize("shortcut,with_q", [(False, False), (True, True)])
def test_dcb_fused_matches_conv_path(shortcut, with_q):
    C, H, W = 128, 12, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, C),
                          jnp.float32) * 0.5
    q = (jnp.linspace(0.5, 1.5, C).reshape(1, 1, 1, C) if with_q else None)
    mod = DepthConvBlock(C, shortcut=shortcut)
    p = _params_for(mod, x, q)
    ref = mod.apply({"params": p}, x, q) if with_q else mod.apply(
        {"params": p}, x)
    out = dcb_fused(x, p["dc_0"]["kernel"], p["dc_0"]["bias"],
                    p["dc_2"]["kernel"], p["dc_2"]["bias"],
                    p["dc_3"]["kernel"], p["dc_3"]["bias"],
                    p["ffn_0"]["kernel"], p["ffn_0"]["bias"],
                    p["ffn_2"]["kernel"], p["ffn_2"]["bias"],
                    q=q, shortcut=shortcut)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_env_flag_switches_block_to_pallas(monkeypatch):
    """SSGVC_PALLAS_DCB=1 routes DepthConvBlock through the kernel with the
    SAME param tree (checkpoint-interchangeable) and matching outputs."""
    C, H, W = 128, 8, 16
    x = jax.random.normal(jax.random.PRNGKey(5), (1, H, W, C),
                          jnp.float32) * 0.5
    mod = DepthConvBlock(C)
    p = _params_for(mod, x)
    ref = mod.apply({"params": p}, x)

    monkeypatch.setenv("SSGVC_PALLAS_DCB", "1")
    p2 = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))
    out = mod.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gate_falls_back_on_unfriendly_shapes(monkeypatch):
    monkeypatch.setenv("SSGVC_PALLAS_DCB", "1")
    # W=30 not sublane-aligned; C=48 not lane-aligned; B=2
    for shape, c in (((1, 8, 30, 128), 128), ((1, 8, 16, 48), 48),
                     ((2, 8, 16, 128), 128)):
        x = jnp.zeros(shape, jnp.float32)
        mod = DepthConvBlock(c)
        p = mod.init(jax.random.PRNGKey(0), x)["params"]
        out = mod.apply({"params": p}, x)  # conv path, must not raise
        assert out.shape == shape


def test_tile_picker_respects_vmem_budget():
    """At full-profile 1080p shapes (H=136, W=240, C=256 after 8x patching)
    the row tile must shrink below 8 — the fixed th=8 working set (~20MB
    fp32) oversubscribed the ~16MB VMEM and is the prime suspect for the
    round-3 Mosaic compile hang."""
    from ssgvc_tpu.ops.pallas_dcb import _pick_tile, _tile_vmem_bytes

    th = _pick_tile(136, 240, 256)
    assert th == 2 and 136 % th == 0  # th=4 estimates ~11.4MB > 9MB budget
    assert _tile_vmem_bytes(th, 240, 256) <= 9 * 1024 * 1024
    # tiny shapes keep large tiles (and the divisibility contract)
    assert _pick_tile(64, 16, 32) == 16
    for h in (6, 10, 14):
        assert h % _pick_tile(h, 16, 32) == 0
