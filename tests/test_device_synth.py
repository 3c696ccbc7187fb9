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
