"""On-device synthetic clip generator: shape, range and distribution parity
with the host numpy generator (data/dataset.py SyntheticClipDataset)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssgvc_tpu.data.dataset import SyntheticClipDataset
from ssgvc_tpu.data.device_synth import sample_qp, synth_batch


def test_synth_batch_shapes_and_ranges():
    out = synth_batch(jax.random.PRNGKey(0), batch=4, size=64, seq_len=3)
    assert out["frames"].shape == (4, 3, 64, 64, 3)
    assert out["masks"].shape == (4, 3, 64, 64, 1)
    f = np.asarray(out["frames"])
    m = np.asarray(out["masks"])
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert set(np.unique(m)) <= {0.0, 1.0}
    # every clip contains at least one object
    assert (m.reshape(4, -1).max(axis=1) == 1.0).all()


def test_synth_batch_is_jit_stable_and_fresh():
    a = synth_batch(jax.random.PRNGKey(1), batch=2, size=64, seq_len=2)
    b = synth_batch(jax.random.PRNGKey(2), batch=2, size=64, seq_len=2)
    # different keys -> different data
    assert float(jnp.abs(a["frames"] - b["frames"]).max()) > 1e-3
    # same key -> deterministic
    c = synth_batch(jax.random.PRNGKey(1), batch=2, size=64, seq_len=2)
    assert float(jnp.abs(a["frames"] - c["frames"]).max()) == 0.0


def test_objects_move_between_frames():
    out = synth_batch(jax.random.PRNGKey(3), batch=8, size=64, seq_len=4)
    m = np.asarray(out["masks"])
    # at least half the clips have a mask that changes frame-to-frame
    moved = (np.abs(m[:, 1:] - m[:, :-1]).reshape(8, -1).max(axis=1) > 0)
    assert moved.sum() >= 4


def test_distribution_parity_with_numpy_generator():
    """Mask coverage and frame statistics match the host generator within
    loose tolerances (same distribution, not bit-equal)."""
    size, T, n = 64, 4, 24
    host = SyntheticClipDataset(num_clips=n, seq_len=T, crop_size=size,
                                seed=11, texture="smooth")
    hf, hm = zip(*[host[i] for i in range(n)])
    hf, hm = np.stack(hf), np.stack(hm)
    d = synth_batch(jax.random.PRNGKey(11), batch=n, size=size, seq_len=T)
    df, dm = np.asarray(d["frames"]), np.asarray(d["masks"])

    assert abs(hm.mean() - dm.mean()) < 0.10          # object coverage
    assert abs(hf.mean() - df.mean()) < 0.05          # luma/chroma level
    assert abs(hf.std() - df.std()) < 0.05            # contrast
    # spatial high-frequency energy (what the codec actually codes)
    hg = np.abs(np.diff(hf[..., 0], axis=-1)).mean()
    dg = np.abs(np.diff(df[..., 0], axis=-1)).mean()
    assert abs(hg - dg) < 0.02


def test_sample_qp_distribution():
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    qps = np.asarray(jax.vmap(sample_qp)(keys))
    assert qps.min() >= 0 and qps.max() <= 63
    eval_qps = np.asarray([8, 20, 32, 44, 56])
    near = (np.abs(qps[:, None] - eval_qps[None, :]).min(axis=1) <= 3)
    assert 0.55 < near.mean() < 0.95  # ~70% near + uniform spillover


def test_roi_subset_mask_is_informative_subset():
    """Class-filter mode: masks are a strict subset of painted content on
    average (some moving objects stay unmasked, like Waymo's YOLO class
    filter), never empty, and both generators agree on coverage."""
    size, T, n = 64, 4, 24
    d_all = synth_batch(jax.random.PRNGKey(7), batch=n, size=size, seq_len=T)
    d_sub = synth_batch(jax.random.PRNGKey(7), batch=n, size=size, seq_len=T,
                        roi_subset=True)
    cov_all = float(np.asarray(d_all["masks"]).mean())
    cov_sub = float(np.asarray(d_sub["masks"]).mean())
    assert cov_sub < cov_all * 0.95          # some objects left out
    # per-clip: never an empty ROI (object 0 is always masked)
    per_clip = np.asarray(d_sub["masks"]).reshape(n, -1).mean(axis=1)
    assert (per_clip > 0).all()

    host = SyntheticClipDataset(num_clips=n, seq_len=T, crop_size=size,
                                seed=7, texture="smooth", roi_subset=True)
    hm = np.stack([host[i][1] for i in range(n)])
    assert (hm.reshape(n, -1).mean(axis=1) > 0).all()
    assert abs(hm.mean() - cov_sub) < 0.10   # distribution parity


def test_roi_subset_frames_unchanged():
    """roi_subset changes ONLY the mask: painted frames must be identical
    for the same host seed (appearance distribution shared, so the mask
    carries pixel-uninferable information)."""
    a = SyntheticClipDataset(num_clips=2, seq_len=2, crop_size=64, seed=3,
                             texture="smooth", roi_subset=False)
    b = SyntheticClipDataset(num_clips=2, seq_len=2, crop_size=64, seed=3,
                             texture="smooth", roi_subset=True)
    fa, ma = a[0]
    fb, mb = b[0]
    np.testing.assert_allclose(fa, fb)
    assert mb.sum() <= ma.sum()
