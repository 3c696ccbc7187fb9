"""Full-model numerical parity vs the reference PyTorch models (eval mode).

Eval mode makes both quantizer twins deterministic (hard round), so whole
forward passes compare directly. Weights flow through the generic converter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig
from ssgvc_tpu.models.dmc import DMC
from ssgvc_tpu.models.dmci import DMCI
from ssgvc_tpu.utils.torch_import import align_params, convert_state_dict

from conftest import add_reference_to_path, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference oracle not mounted"),
]

add_reference_to_path()
torch = pytest.importorskip("torch")


def nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def import_torch_weights(torch_model, flax_model, example_inputs):
    variables = flax_model.init(jax.random.PRNGKey(0), *example_inputs["args"],
                                **example_inputs.get("kwargs", {}))
    flat = convert_state_dict(torch_model.state_dict())
    params = align_params(flat, variables["params"])
    return {"params": params}


# --------------------------------------------------------------------------
# DMC variants (tiny config)
# --------------------------------------------------------------------------

TINY = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)


def _torch_dmc(variant):
    from src.refactor.config import DMCConfig as TorchCfg

    cfg = TorchCfg(**TINY)
    if variant == "performance":
        from src.refactor.seg_video_model import DMC as TorchDMC
    elif variant == "fast":
        from src.refactor.seg_video_model_fast import DMC as TorchDMC
    elif variant == "mask_prop":
        from src.refactor.mask_prop_seg_video_model import DMC as TorchDMC
    else:
        from src.refactor.video_model import DMC as TorchDMC
    torch.manual_seed(7)
    return TorchDMC(cfg)


def _run_torch_dmc(tm, x4, qp, dpb_frame, dpb_feature, after_i):
    tm.eval()
    dpb = {"frame": torch.from_numpy(dpb_frame) if dpb_frame is not None else None,
           "feature": torch.from_numpy(dpb_feature) if dpb_feature is not None else None}
    with torch.no_grad():
        return tm(torch.from_numpy(x4), qp, dpb, after_i=after_i)


@pytest.mark.parametrize("variant,after_i", [
    ("plain", True),
    ("plain", False),
    ("performance", True),
    ("fast", True),
    ("mask_prop", False),
])
def test_dmc_variant_parity(variant, after_i):
    rng = np.random.default_rng(11)
    H = W = 64
    frame = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    mask = (rng.uniform(0, 1, (1, 1, H, W)) > 0.5).astype(np.float32)
    ref_frame = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    ref_feature = rng.normal(size=(1, TINY["ch_d"], H // 8, W // 8)).astype(np.float32)
    qp = 32

    tm = _torch_dmc(variant)
    x4 = np.concatenate([frame, mask], axis=1) if variant != "plain" else frame
    ref = _run_torch_dmc(tm, x4, qp,
                         ref_frame if after_i else None,
                         None if after_i else ref_feature, after_i)

    # reference-faithful rate estimate for the torch-oracle diff
    cfg = DMCConfig.variant(variant, bits_sigma_floor=0.0, **TINY)
    fm = DMC(cfg)
    dpb = {"frame": jnp.asarray(nhwc(ref_frame)),
           "feature": jnp.asarray(nhwc(ref_feature))}
    args = (jnp.asarray(nhwc(frame)), jnp.int32(qp), dpb)
    kwargs = dict(after_i=after_i, mask=jnp.asarray(nhwc(mask)), train=False)
    variables = import_torch_weights(tm, fm, {"args": args, "kwargs": kwargs})
    out = fm.apply(variables, *args, **kwargs)

    np.testing.assert_allclose(
        nhwc(ref["dpb"]["frame"].numpy()), np.asarray(out["dpb"]["frame"]),
        atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(
        nhwc(ref["dpb"]["feature"].numpy()), np.asarray(out["dpb"]["feature"]),
        atol=5e-4, rtol=1e-4)
    # The erf bit estimate is steep around small random-init scales, so tiny
    # fp32 activation diffs amplify; exact bits math is covered by
    # test_entropy_parity.py.
    np.testing.assert_allclose(ref["bpp_y"].numpy(), np.asarray(out["bpp_y"]),
                               atol=3e-3, rtol=1.5e-2)
    np.testing.assert_allclose(ref["bpp_z"].numpy(), np.asarray(out["bpp_z"]),
                               atol=3e-3, rtol=1.5e-2)


def test_dmc_old_parity():
    """The 'old' baseline uses the hardcoded full-width reference model."""
    from src.models.video_model import DMC as TorchDMCOld

    torch.manual_seed(3)
    tm = TorchDMCOld()
    rng = np.random.default_rng(5)
    H = W = 64
    frame = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    ref_frame = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    qp = 40

    ref = _run_torch_dmc(tm, frame, qp, ref_frame, None, True)

    cfg = DMCConfig.variant("old", bits_sigma_floor=0.0)
    fm = DMC(cfg)
    dpb = {"frame": jnp.asarray(nhwc(ref_frame)),
           "feature": jnp.zeros((1, H // 8, W // 8, cfg.ch_d), jnp.float32)}
    args = (jnp.asarray(nhwc(frame)), jnp.int32(qp), dpb)
    kwargs = dict(after_i=True, mask=None, train=False)
    variables = import_torch_weights(tm, fm, {"args": args, "kwargs": kwargs})
    out = fm.apply(variables, *args, **kwargs)

    np.testing.assert_allclose(
        nhwc(ref["dpb"]["frame"].numpy()), np.asarray(out["dpb"]["frame"]),
        atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(ref["bpp"].numpy(), np.asarray(out["bpp"]),
                               atol=2e-3, rtol=2e-3)


# --------------------------------------------------------------------------
# DMCI (full-width reference intra model)
# --------------------------------------------------------------------------

def test_dmci_parity():
    from src.models.image_model import DMCI as TorchDMCI

    torch.manual_seed(9)
    tm = TorchDMCI()
    tm.eval()
    rng = np.random.default_rng(13)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    qp = 21
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), qp)

    fm = DMCI(DMCIConfig())
    args = (jnp.asarray(nhwc(x)), jnp.int32(qp))
    variables = import_torch_weights(tm, fm, {"args": args,
                                              "kwargs": dict(train=False)})
    out = fm.apply(variables, *args, train=False)

    np.testing.assert_allclose(
        nhwc(ref["dpb"]["frame"].numpy()), np.asarray(out["dpb"]["frame"]),
        atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(ref["bpp"].numpy(), np.asarray(out["bpp"]),
                               atol=2e-3, rtol=2e-3)


def test_dmc_accepts_packed_4ch_input():
    """Reference-style (B, H, W, 4) input with the mask as channel 4."""
    rng = np.random.default_rng(21)
    frame = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (1, 64, 64, 1)) > 0.5).astype(np.float32)
    cfg = DMCConfig.variant("performance", **TINY)
    fm = DMC(cfg)
    dpb = {"frame": jnp.asarray(frame),
           "feature": jnp.zeros((1, 8, 8, TINY["ch_d"]), jnp.float32)}
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(frame),
                        jnp.int32(10), dpb, after_i=True,
                        mask=jnp.asarray(mask), train=False)
    out_sep = fm.apply(variables, jnp.asarray(frame), jnp.int32(10), dpb,
                       after_i=True, mask=jnp.asarray(mask), train=False)
    x4 = jnp.concatenate([jnp.asarray(frame), jnp.asarray(mask)], axis=-1)
    out_packed = fm.apply(variables, x4, jnp.int32(10), dpb, after_i=True,
                          mask=None, train=False)
    np.testing.assert_array_equal(np.asarray(out_sep["dpb"]["frame"]),
                                  np.asarray(out_packed["dpb"]["frame"]))


@pytest.mark.parametrize("variant", ["performance", "fast", "mask_prop"])
def test_packed_io_matches_raw(variant):
    """packed_io=True on pre-unshuffled inputs produces the SAME outputs as
    the raw-domain model with the same params (the 8x8 patching is a
    lossless permutation; clip/MSE/conv1 commute with it)."""
    from ssgvc_tpu.ops.pixel import pixel_shuffle, pixel_unshuffle

    tiny = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)
    raw_model = DMC(DMCConfig.variant(variant, **tiny))
    packed_model = DMC(DMCConfig.variant(variant, packed_io=True, **tiny))

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    mask = jnp.asarray((rng.uniform(0, 1, (1, 64, 64, 1)) > 0.6)
                       .astype(np.float32))
    dpb = {"frame": jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)),
                                jnp.float32),
           "feature": jnp.asarray(rng.normal(size=(1, 8, 8, 16)) * 0.1,
                                  jnp.float32)}
    # traced after_i so BOTH feature adaptors get params at init
    params = raw_model.init(jax.random.PRNGKey(0), x, jnp.int32(20), dpb,
                            after_i=jnp.bool_(True), mask=mask,
                            train=False)["params"]

    for after_i in (True, False):
        out_raw = raw_model.apply({"params": params}, x, jnp.int32(20), dpb,
                                  after_i=after_i, mask=mask, train=False)
        dpb_p = {"frame": pixel_unshuffle(dpb["frame"], 8),
                 "feature": dpb["feature"]}
        out_packed = packed_model.apply(
            {"params": params}, pixel_unshuffle(x, 8), jnp.int32(20), dpb_p,
            after_i=after_i, mask=pixel_unshuffle(mask, 8), train=False)

        np.testing.assert_allclose(
            np.asarray(pixel_shuffle(out_packed["dpb"]["frame"], 8)),
            np.asarray(out_raw["dpb"]["frame"]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out_packed["dpb"]["feature"]),
            np.asarray(out_raw["dpb"]["feature"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_packed["bpp"]),
                                   np.asarray(out_raw["bpp"]), rtol=1e-5)
        if variant == "mask_prop":
            # the propagated mask chain must match between domains too
            # (predict_mask unpacks/repacks the 1-ch mask losslessly)
            np.testing.assert_allclose(
                np.asarray(pixel_shuffle(out_packed["mask_pred"], 8)),
                np.asarray(out_raw["mask_pred"]), atol=2e-5)
