"""Color transforms, metrics, video IO, loss semantics, evaluation helpers."""

import io

import numpy as np
import pytest

import jax.numpy as jnp

from ssgvc_tpu.training.loss import (
    compute_lambda,
    rate_distortion_loss,
    roi_mse,
    weighted_mse,
)
from ssgvc_tpu.training.evaluate import bd_rate
from ssgvc_tpu.utils.metrics import calc_msssim, calc_psnr, calc_ssim
from ssgvc_tpu.utils.transforms import (
    rgb2ycbcr,
    rgb2ycbcr_np,
    ycbcr2rgb,
    ycbcr2rgb_np,
    yuv_444_to_420,
)

from conftest import add_reference_to_path, reference_available


def test_color_round_trip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.1, 0.9, (4, 8, 8, 3)).astype(np.float32)
    ycc = rgb2ycbcr(jnp.asarray(rgb))
    back = ycbcr2rgb(ycc)
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-5)
    np.testing.assert_allclose(rgb2ycbcr_np(rgb), np.asarray(ycc), atol=1e-6)
    np.testing.assert_allclose(ycbcr2rgb_np(np.asarray(ycc)), rgb, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_color_matches_reference():
    add_reference_to_path()
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    from src.utils.transforms import rgb2ycbcr as ref_rgb2ycbcr

    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
    ref = ref_rgb2ycbcr(torch.from_numpy(rgb)).numpy()
    ours = np.asarray(rgb2ycbcr(jnp.asarray(rgb.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_yuv420():
    rng = np.random.default_rng(2)
    ycc = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    y, uv = yuv_444_to_420(ycc)
    assert y.shape == (16, 16) and uv.shape == (8, 8, 2)
    np.testing.assert_allclose(uv[0, 0, 0], ycc[:2, :2, 1].mean(), atol=1e-6)


def test_psnr_ssim_msssim():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (192, 192)).astype(np.float32)
    assert calc_psnr(a, a) == 99.9
    ssim_same, _ = calc_ssim(a, a)
    assert ssim_same == pytest.approx(1.0, abs=1e-6)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    assert 20 < calc_psnr(a, b) < 35
    ssim_noisy, _ = calc_ssim(a, b)
    assert ssim_noisy < ssim_same
    ms = calc_msssim(a, b)
    assert 0 < ms < 1


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_msssim_matches_reference():
    add_reference_to_path()
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from src.utils.metrics import calc_msssim as ref_msssim
    except ImportError:
        pytest.skip("reference metrics deps missing")
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 1, (192, 256)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.03, a.shape), 0, 1)
    ref = ref_msssim(a, b, data_range=1.0)
    ours = calc_msssim(a, b, data_range=1.0)
    assert ours == pytest.approx(ref, abs=2e-3)
    # below 176px the reference switches to 4-level HM weights
    # (src/utils/metrics.py:46-52) — the rebuild must track it
    a_s, b_s = a[:128, :128], b[:128, :128]
    assert calc_msssim(a_s, b_s, data_range=1.0) == pytest.approx(
        ref_msssim(a_s, b_s, data_range=1.0), abs=2e-3)


def test_msssim_small_plane_fallback():
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, (128, 128))
    b = np.clip(a + rng.normal(0, 0.03, a.shape), 0, 1)
    ms = calc_msssim(a, b)
    assert 0 < ms < 1
    with pytest.raises(ValueError, match="88px"):
        calc_msssim(a[:64, :64], b[:64, :64])


def test_weighted_mse_torch_semantics():
    """sum(w*se)/sum(w) — verified against torch>=2.7 F.mse_loss(weight=...)."""
    pred = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    tgt = jnp.zeros((2, 2))
    w = jnp.asarray([[1.0, 101.0], [1.0, 101.0]])
    got = float(weighted_mse(pred, tgt, w))
    assert got == pytest.approx(9.95098, abs=1e-4)


def test_compute_lambda():
    lam0 = float(compute_lambda(0, 50.0, 38400.0))
    lam63 = float(compute_lambda(63, 50.0, 38400.0))
    assert lam0 == pytest.approx(50.0, rel=1e-5)
    assert lam63 == pytest.approx(38400.0, rel=1e-5)
    lam32 = float(compute_lambda(32, 50.0, 38400.0))
    assert 50 < lam32 < 38400


def test_rd_loss_mask_weighting():
    rng = np.random.default_rng(5)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    results = {"bpp": jnp.asarray([0.1]), "bpp_y": jnp.asarray([0.08]),
               "bpp_z": jnp.asarray([0.02]), "dpb": {"frame": pred}}
    mask0 = jnp.zeros((1, 8, 8, 1))
    rd0 = rate_distortion_loss(results, tgt, 32, 1.0, 50.0, 38400.0,
                               mask=mask0)
    # all-zero mask falls back to plain mse
    assert float(rd0.mse) == pytest.approx(float(rd0.prev_obj), rel=1e-6)
    mask1 = mask0.at[0, :4].set(1.0)
    rd1 = rate_distortion_loss(results, tgt, 32, 1.0, 50.0, 38400.0,
                               mask=mask1)
    assert float(rd1.mse) != pytest.approx(float(rd1.prev_obj), rel=1e-3)


def test_rd_loss_lambda_normalize():
    """lambda_normalize divides the whole loss by lambda(qp) — a positive
    rescaling (same per-QP optimum, balanced gradient scale)."""
    from ssgvc_tpu.training.loss import compute_lambda

    rng = np.random.default_rng(6)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    results = {"bpp": jnp.asarray([0.1]), "bpp_y": jnp.asarray([0.08]),
               "bpp_z": jnp.asarray([0.02]), "dpb": {"frame": pred}}
    for qp in (0, 32, 63):
        base = rate_distortion_loss(results, tgt, qp, 1.0, 50.0, 38400.0)
        norm = rate_distortion_loss(results, tgt, qp, 1.0, 50.0, 38400.0,
                                    lambda_normalize=True)
        lam = float(compute_lambda(qp, 50.0, 38400.0))
        assert float(norm.loss) == pytest.approx(float(base.loss) / lam,
                                                 rel=1e-5)
        # metrics other than the loss are unscaled
        assert float(norm.bpp) == pytest.approx(float(base.bpp), rel=1e-6)
        assert float(norm.mse) == pytest.approx(float(base.mse), rel=1e-6)


def test_qp_gain_ramp_init():
    from ssgvc_tpu.models.common import qp_gain_ramp_init

    import jax

    init = qp_gain_ramp_init(lo=0.3, hi=4.0)
    t = np.asarray(init(jax.random.PRNGKey(0), (64, 16)))
    assert t.shape == (64, 16)
    assert t[0, 0] == pytest.approx(0.3, rel=1e-5)
    assert t[-1, 0] == pytest.approx(4.0, rel=1e-5)
    assert np.all(np.diff(t[:, 0]) > 0)          # strictly rising in qp
    assert np.allclose(t, t[:, :1])              # constant across channels
    inv = np.asarray(qp_gain_ramp_init(lo=0.3, hi=4.0, inverse=True)(
        jax.random.PRNGKey(0), (64, 16)))
    np.testing.assert_allclose(inv * t, 1.0, rtol=1e-5)


def test_roi_mse():
    pred = jnp.ones((1, 4, 4, 3)) * 0.5
    tgt = jnp.zeros((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0].set(1.0)
    assert float(roi_mse(pred, tgt, mask)) == pytest.approx(0.25, abs=1e-6)


def test_bd_rate():
    # test curve needs ~26% less rate at equal quality
    rate_a = [100, 200, 400, 800]
    psnr_a = [30, 33, 36, 39]
    rate_t = [74, 148, 296, 592]
    psnr_t = [30, 33, 36, 39]
    bd = bd_rate(rate_a, psnr_a, rate_t, psnr_t)
    assert bd == pytest.approx(-26.0, abs=1.0)


def test_video_io(tmp_path):
    from ssgvc_tpu.utils.video_io import (
        PNGReader,
        PNGWriter,
        YUV420Reader,
        YUV420Writer,
    )

    rng = np.random.default_rng(6)
    frames = [rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
              for _ in range(3)]
    w = PNGWriter(str(tmp_path / "png"))
    for f in frames:
        w.write_one_frame(f)
    r = PNGReader(str(tmp_path / "png"))
    for f in frames:
        got = r.read_one_frame()
        np.testing.assert_allclose(got, f, atol=1 / 255.0)
    assert r.read_one_frame() is None

    yw = YUV420Writer(str(tmp_path / "v.yuv"))
    y_plane = frames[0][..., 0]
    uv = rng.uniform(0, 1, (8, 12, 2)).astype(np.float32)
    yw.write_one_frame(y_plane, uv)
    yw.close()
    yr = YUV420Reader(str(tmp_path / "v.yuv"), 16, 24)
    y2, uv2 = yr.read_one_frame()
    np.testing.assert_allclose(y2, y_plane, atol=1 / 255.0)
    np.testing.assert_allclose(uv2, uv, atol=1 / 255.0)
    assert yr.read_one_frame() is None
    yr.close()


def test_cli_overrides_strict_unknown_keys(tmp_path):
    """Typo'd CLI keys raise instead of silently no-oping (epochs vs
    max_iters once trained 25 epochs unnoticed); unknown YAML keys stay
    tolerated for reference-config compatibility."""
    import pytest
    import yaml as _yaml
    from ssgvc_tpu.config import load_config

    y = tmp_path / "c.yaml"
    y.write_text(_yaml.safe_dump({"epochs": 2, "not_a_real_key": 5}))
    cfg = load_config(str(y), ["epochs=3", "dataset.batch_size=2"])
    assert cfg.epochs == 3 and cfg.dataset.batch_size == 2

    with pytest.raises(KeyError, match="max_iters"):
        load_config(str(y), ["max_iters=3"])
    with pytest.raises(KeyError, match="unknown config section"):
        load_config(str(y), ["dataset2.batch_size=1"])
