"""Numerical parity of layer blocks vs the reference PyTorch implementation.

The reference (mounted read-only at /root/reference) runs on CPU torch as an
oracle; weights are copied through the generic state_dict converter so these
tests also exercise utils/torch_import.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.layers.blocks import (
    DepthConvBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride2,
    SubpelConv2x,
    wsilu,
)
from ssgvc_tpu.utils.torch_import import convert_state_dict, unflatten

from conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference oracle not mounted"
)

add_reference_to_path()
torch = pytest.importorskip("torch")


def to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def to_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def run_pair(torch_mod, flax_mod, x_nchw, atol=2e-5):
    torch_mod.eval()
    with torch.no_grad():
        ref = torch_mod(torch.from_numpy(x_nchw)).numpy()
    params = {"params": unflatten(convert_state_dict(torch_mod.state_dict()))}
    out = flax_mod.apply(params, jnp.asarray(to_nhwc(x_nchw)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=atol, rtol=1e-5)


def test_wsilu():
    from src.layers.layers import WSiLU

    x = np.random.default_rng(0).normal(size=(2, 7, 5, 3)).astype(np.float32)
    ref = WSiLU()(torch.from_numpy(x)).numpy()
    ours = np.asarray(wsilu(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("in_ch,out_ch,shortcut,force", [
    (8, 8, False, False),
    (8, 12, False, False),
    (8, 8, True, True),
])
def test_depth_conv_block(in_ch, out_ch, shortcut, force):
    from src.layers.layers import DepthConvBlock as TorchDCB

    torch.manual_seed(0)
    tm = TorchDCB(in_ch, out_ch, shortcut=shortcut, force_adaptor=force)
    fm = DepthConvBlock(out_ch, shortcut=shortcut, force_adaptor=force)
    x = np.random.default_rng(1).normal(size=(2, in_ch, 16, 16)).astype(np.float32)
    run_pair(tm, fm, x)


def test_depth_conv_block_quant_step():
    from src.layers.layers import DepthConvBlock as TorchDCB

    torch.manual_seed(1)
    tm = TorchDCB(8, 8)
    tm.eval()
    q = np.random.default_rng(2).uniform(0.5, 1.5, size=(1, 8, 1, 1)).astype(np.float32)
    x = np.random.default_rng(3).normal(size=(1, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), quant_step=torch.from_numpy(q)).numpy()
    params = {"params": unflatten(convert_state_dict(tm.state_dict()))}
    out = DepthConvBlock(8).apply(
        params, jnp.asarray(to_nhwc(x)), quant_step=jnp.asarray(q[:, :, 0, 0]).reshape(1, 1, 1, 8)
    )
    np.testing.assert_allclose(to_nchw(out), ref, atol=2e-5, rtol=1e-5)


def test_subpel_conv2x():
    from src.layers.layers import SubpelConv2x as TorchSubpel

    torch.manual_seed(2)
    tm = TorchSubpel(6, 10, 3, padding=1)
    fm = SubpelConv2x(10, 3, padding=1)
    x = np.random.default_rng(4).normal(size=(2, 6, 8, 8)).astype(np.float32)
    run_pair(tm, fm, x)


def test_residual_block_stride2():
    from src.layers.layers import ResidualBlockWithStride2 as TorchRBS

    torch.manual_seed(3)
    tm = TorchRBS(6, 10)
    fm = ResidualBlockWithStride2(10)
    x = np.random.default_rng(5).normal(size=(2, 6, 16, 16)).astype(np.float32)
    run_pair(tm, fm, x)


def test_residual_block_upsample():
    from src.layers.layers import ResidualBlockUpsample as TorchRBU

    torch.manual_seed(4)
    tm = TorchRBU(6, 10)
    fm = ResidualBlockUpsample(10)
    x = np.random.default_rng(6).normal(size=(2, 6, 8, 8)).astype(np.float32)
    run_pair(tm, fm, x)


@pytest.mark.parametrize("shortcut", [False, True])
def test_depth_conv_block_shiftadd_matches_conv(monkeypatch, shortcut):
    """SSGVC_DW=shiftadd (depthwise 3x3 as 9 shifted multiply-adds) is
    numerically identical to the grouped-conv path and shares its param
    tree — checkpoints are interchangeable across the flag."""
    fm = DepthConvBlock(16, shortcut=shortcut)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 12, 20, 16)).astype(np.float32))
    monkeypatch.setenv("SSGVC_DW", "conv")
    params = fm.init(jax.random.PRNGKey(0), x)
    # randomize the ReZero tails so the depthwise output reaches the output
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(8)
        .standard_normal(p.shape).astype(np.float32), params)
    a = fm.apply(params, x)
    monkeypatch.setenv("SSGVC_DW", "shiftadd")
    params2 = fm.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    b = fm.apply(params, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=2e-6, rtol=1e-5)


def test_depth_conv_block_int8_quantconv(monkeypatch):
    """SSGVC_INT8=1 (W8A8 QuantConv) shares the conv path's param tree
    (checkpoints interchange), is deterministic, and tracks the fp32
    output within quantization tolerance through a full DepthConvBlock."""
    monkeypatch.setenv("SSGVC_DW", "conv")
    fm = DepthConvBlock(16)
    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 12, 20, 16)).astype(np.float32))
    monkeypatch.setenv("SSGVC_INT8", "0")
    params = fm.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(8)
        .standard_normal(p.shape).astype(np.float32), params)
    a = np.asarray(fm.apply(params, x))
    monkeypatch.setenv("SSGVC_INT8", "1")
    params2 = fm.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    b = np.asarray(fm.apply(params, x))
    assert np.array_equal(b, np.asarray(fm.apply(params, x)))  # deterministic
    rel = np.abs(b - a).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.02, f"int8 relative error {rel:.4f} exceeds 2%"
