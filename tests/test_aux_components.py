"""Auxiliary subsystems: lidar projection, vimeo datasets, transforms,
debug probe, visualization, checkpoint save/restore."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_lidar_projection_round_trip():
    from ssgvc_tpu.data.lidar import (
        build_laser_proto,
        build_range_image_blobs,
        project_top_lidar,
    )

    h_ri, w_ri = 4, 8
    ri = np.zeros((h_ri, w_ri, 4), np.float32)
    cp = np.zeros((h_ri, w_ri, 6), np.int64)
    # two valid points projecting into a 32x48 FRONT image
    ri[0, 0, 0] = 30.0      # range
    ri[0, 0, 1] = 0.5       # intensity
    cp[0, 0] = [1, 10, 5, 0, 0, 0]
    ri[2, 3, 0] = 75.0
    cp[2, 3] = [1, 47, 31, 0, 0, 0]
    # an invalid point (range 0) and a point on another camera
    cp[1, 1] = [1, 1, 1, 0, 0, 0]
    ri[3, 3, 0] = 10.0
    cp[3, 3] = [2, 5, 5, 0, 0, 0]

    blobs = build_range_image_blobs(ri, cp)
    frame = build_laser_proto(*blobs)
    proj = project_top_lidar(frame, 32, 48)
    assert proj.shape == (32, 48, 3)
    assert proj[5, 10, 0] == 1.0
    assert proj[5, 10, 1] == pytest.approx(30 / 75)
    assert proj[31, 47, 0] == 1.0
    assert proj[1, 1, 0] == 0.0   # range 0 filtered
    assert proj[5, 5, 0] == 0.0   # other camera filtered
    assert proj[..., 0].sum() == 2.0


def test_vimeo_dataset(tmp_path):
    from PIL import Image
    from ssgvc_tpu.data.vimeo import Vimeo90kDataset, Vimeo90kImageDataset

    rng = np.random.default_rng(0)
    for seq in ("00001/0001", "00001/0002"):
        d = tmp_path / "sequences" / seq
        d.mkdir(parents=True)
        for i in range(1, 8):
            img = (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"im{i}.png")

    ds = Vimeo90kDataset(str(tmp_path), crop_size=32)
    assert len(ds) == 2
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert frames.shape == (7, 32, 32, 3)
    assert masks.shape == (7, 32, 32, 1) and masks.sum() == 0

    img_ds = Vimeo90kImageDataset(str(tmp_path), crop_size=32)
    frame = img_ds.__getitem__(1, rng=np.random.default_rng(2))
    assert frame.shape == (32, 32, 3)


def test_sequence_transforms():
    from ssgvc_tpu.data.video_transform import (
        ColorJitterSequence,
        Compose,
        RandomCropTransform,
        RandomHorizontalFlipSequence,
        RandomRotationSequence,
        RGBtoYUVTransform,
    )

    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (3, 16, 20, 3)).astype(np.float32)

    out = RandomCropTransform(8)(frames, rng=np.random.default_rng(0))
    assert out.shape == (3, 8, 8, 3)

    flipped = RandomHorizontalFlipSequence(p=1.0)(frames)
    np.testing.assert_array_equal(flipped[:, :, ::-1], frames)

    rot = RandomRotationSequence(quarter_turns=(1,))(frames)
    assert rot.shape == (3, 20, 16, 3)

    jit = ColorJitterSequence()(frames, rng=np.random.default_rng(1))
    assert jit.shape == frames.shape and jit.min() >= 0 and jit.max() <= 1

    ycc = RGBtoYUVTransform("444")(frames)
    assert ycc.shape == frames.shape
    y, uv = RGBtoYUVTransform("420")(frames)
    assert y.shape == (3, 16, 20) and uv.shape == (3, 8, 10, 2)

    comp = Compose([RandomCropTransform(8), RandomHorizontalFlipSequence(0.0)])
    assert comp(frames, rng=np.random.default_rng(2)).shape == (3, 8, 8, 3)


def test_debug_probe(tmp_path):
    from ssgvc_tpu.utils.debug import DebugProbe, tree_norm, tree_stats

    params = {"a": {"kernel": jnp.ones((3, 3))}, "b": jnp.zeros(5)}
    assert tree_norm(params) == pytest.approx(3.0)
    stats = tree_stats(params)
    assert stats["a/kernel"]["norm"] == pytest.approx(3.0)

    probe = DebugProbe(enabled=True, save_dir=str(tmp_path))
    batch = {"frames": np.zeros((1, 2, 8, 8, 3))}
    ok = probe.after_step(batch, {"loss": 1.0})
    assert ok
    bad = probe.after_step(batch, {"loss": float("nan")})
    assert not bad
    assert any(f.startswith("bad_batch") for f in os.listdir(tmp_path))


def test_finite_check_passthrough():
    from ssgvc_tpu.utils.debug import finite_check

    x = jnp.ones((4, 4))
    out = jax.jit(lambda v: finite_check(v, "test") * 2)(x)
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((4, 4)))


def test_visualize_q_scale(tmp_path):
    from ssgvc_tpu.utils.visualize import save_recon_panel, visualize_q_scale

    q = np.random.default_rng(0).uniform(0.5, 2.0, (64, 32)).astype(np.float32)
    paths = visualize_q_scale(q, str(tmp_path), make_gif=False)
    assert os.path.exists(paths["stats"])

    ycc = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    p = save_recon_panel(ycc, ycc, str(tmp_path / "panel.png"))
    assert os.path.exists(p)


def test_checkpoint_round_trip(tmp_path):
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_trainstate_checkpoint_restore_with_template(tmp_path):
    """The CLI resume path: a saved TrainState (NamedTuple, stored by orbax
    as a field-name dict) must restore against a fresh template NamedTuple.
    Regression: target=tuple(template) raised a structure mismatch."""
    from ssgvc_tpu.training.trainer import TrainState
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    state = TrainState(
        params_p={"enc": {"w": jnp.ones((2, 2))}},
        params_i={"dec": {"b": jnp.zeros((3,))}},
        opt_state=(jnp.zeros(()),),
        step=jnp.int32(11),
        alm_mu=jnp.float32(0.5),
        alm_h_accum=jnp.float32(0.0),
        alm_h_count=jnp.float32(0.0),
    )
    path = save_checkpoint(str(tmp_path / "ts"), state)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, target=template)
    assert isinstance(restored, TrainState)
    assert int(restored.step) == 11
    np.testing.assert_array_equal(
        np.asarray(restored.params_p["enc"]["w"]), np.ones((2, 2)))


def test_create_optimizers():
    import optax
    from ssgvc_tpu.training.optimizers import aux_label, create_optimizers

    assert aux_label(("bit_estimator_z", "f1", "h")) == "aux"
    assert aux_label(("encoder", "conv1", "kernel")) == "main"
    tx = create_optimizers(total_iters=100)
    params = {"encoder": {"kernel": jnp.ones((4, 4))},
              "bit_estimator_z": {"h": jnp.ones((8, 2))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    moved = jax.tree_util.tree_map(lambda u: float(jnp.abs(u).sum()), updates)
    assert moved["encoder"]["kernel"] > 0
    assert moved["bit_estimator_z"]["h"] > 0


def test_checkpoint_manager(tmp_path):
    from ssgvc_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), monitor="val/loss", top_k=2)
    for step, loss in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 1.0)]:
        mgr.save({"w": jnp.float32(step)}, {"val/loss": loss}, step)
    assert os.path.exists(os.path.join(tmp_path, "last"))
    # top-2 kept: losses 1.0 (step4) and 3.0 (step2)
    assert os.path.exists(os.path.join(tmp_path, "step4"))
    assert os.path.exists(os.path.join(tmp_path, "step2"))
    assert not os.path.exists(os.path.join(tmp_path, "step1"))
    assert mgr.best_path.endswith("step4")


def test_profiling_utils():
    from ssgvc_tpu.utils.profiling import (
        AverageMeter,
        device_memory_stats,
        param_summary,
        timed,
    )

    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == pytest.approx(3.5)

    stats = device_memory_stats()
    assert len(stats) >= 1

    params = {"encoder": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
              "head": {"bias": jnp.ones(8)}}
    table = param_summary(params)
    assert "TOTAL" in table and "296" in table

    f = jax.jit(lambda x: x * 2)
    dt = timed(f, jnp.ones((8, 8)), iters=2)
    assert dt >= 0


def test_torch_import_helpers():
    from ssgvc_tpu.utils.torch_import import (
        inflate_input_conv,
        normalize_prefix,
        torch_key_to_flax_path,
    )

    assert torch_key_to_flax_path("enc.dec.0.dc.2.weight") == (
        "enc", "dec_0", "dc_2", "weight")

    sd = {"p_frame_model.encoder.conv1.weight": 1,
          "p_frame_model.encoder.conv1.bias": 2,
          "other.thing": 3}
    out = normalize_prefix(sd, {"encoder.conv1.weight", "encoder.conv1.bias"})
    assert "encoder.conv1.weight" in out

    k = np.ones((1, 1, 3, 8), np.float32)
    k4 = inflate_input_conv(k, extra_in=1, mode="zero")
    assert k4.shape == (1, 1, 4, 8)
    assert (k4[:, :, 3] == 0).all()
    k4m = inflate_input_conv(k, extra_in=1, mode="mean")
    assert (k4m[:, :, 3] == 1).all()


def test_lidar_projection_legacy3_channels():
    """mode='legacy3': depth/intensity/elongation channel semantics of the
    OLD reference pipeline (src/dataset/waymo_dataset.py:20-79)."""
    import numpy as np
    from ssgvc_tpu.data.lidar import (
        build_laser_proto,
        build_range_image_blobs,
        project_top_lidar,
    )
    from ssgvc_tpu.data.waymo_proto import FRONT

    ri = np.zeros((2, 3, 4), np.float32)
    cp = np.zeros((2, 3, 6), np.int64)
    ri[0, 0] = (15.0, 1.2, 0.6, 0)   # range, intensity, elongation
    cp[0, 0] = (FRONT, 5, 7, 0, 0, 0)
    frame = build_laser_proto(*build_range_image_blobs(ri, cp))

    proj = project_top_lidar(frame, 32, 48, mode="legacy3")
    np.testing.assert_allclose(proj[7, 5], [15.0 / 75.0, 1.2 / 1.5, 0.6 / 1.5],
                               rtol=1e-6)
    assert np.isclose(proj.sum(), proj[7, 5].sum())  # only one return lands


def test_vimeo_mp4_dataset_round_trip(tmp_path):
    """MP4-backed Vimeo loader decodes via cv2 (present in this image):
    list file + sequences_mp4 layout, crop, YCbCr, zero masks."""
    cv2 = pytest.importorskip("cv2")
    from ssgvc_tpu.data.vimeo import Vimeo90kMP4Dataset

    rng = np.random.default_rng(0)
    (tmp_path / "sequences_mp4" / "00001").mkdir(parents=True)
    names = ["00001/0001", "00001/0002"]
    for n in names:
        p = str(tmp_path / "sequences_mp4" / (n + ".mp4"))
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 48))
        assert w.isOpened()
        for _ in range(7):
            w.write((rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8))
        w.release()
    (tmp_path / "sep_trainlist.txt").write_text("\n".join(names) + "\n")

    ds = Vimeo90kMP4Dataset(str(tmp_path), crop_size=32)
    assert len(ds) == 2
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert frames.shape == (7, 32, 32, 3)
    assert frames.dtype == np.float32 and frames.max() <= 1.0
    assert masks.shape == (7, 32, 32, 1) and masks.sum() == 0


def test_profile_model_cfgs():
    from ssgvc_tpu.config import MODEL_PROFILES, profile_model_cfgs

    for name in MODEL_PROFILES:
        dmc_cfg, dmci_cfg = profile_model_cfgs(name, variant="plain")
        assert dmc_cfg.ch_d >= dmc_cfg.ch_y
        assert dmci_cfg.qp_num == 64
    full_dmc, full_dmci = profile_model_cfgs("full")
    tiny_dmc, tiny_dmci = profile_model_cfgs("tiny")
    assert full_dmc.ch_d > tiny_dmc.ch_d
    assert full_dmci.enc_dec > tiny_dmci.enc_dec
    with pytest.raises(ValueError):
        profile_model_cfgs("nope")


def test_restore_fills_rebuild_default_leaves(tmp_path):
    """A checkpoint saved before a rebuild-only param existed (e.g. z_gain)
    must still restore against a template that has it — the leaf keeps its
    (identity) init value (round-3 advisor finding)."""
    from ssgvc_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    old = {"params": {"enc": {"w": jnp.ones((2, 2))}}}
    path = save_checkpoint(str(tmp_path / "old"), old)
    template = {"params": {"enc": {"w": jnp.zeros((2, 2))},
                           "z_gain": jnp.full((4,), 1.0)}}
    restored = restore_checkpoint(path, target=template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["enc"]["w"]),
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(restored["params"]["z_gain"]),
                                  np.ones((4,)))

    # a genuinely missing non-default leaf still raises
    bad_template = {"params": {"enc": {"w": jnp.zeros((2, 2))},
                               "brand_new": jnp.zeros((1,))}}
    with pytest.raises(Exception):
        restore_checkpoint(path, target=bad_template)


def _write_mp4(path, n_frames=8, size=(64, 48), seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, size)
    assert w.isOpened()
    for _ in range(n_frames):
        w.write(rng.uniform(0, 255, (size[1], size[0], 3)).astype(np.uint8))
    w.release()


def test_vimeo_septuplet_mp4_dataset(tmp_path):
    """Reference Vimeo90kSeptupletDataset layout:
    sequences/<a>/<b>/<b>.mp4 + sep list with '<a>/<b>' entries."""
    pytest.importorskip("cv2")
    from ssgvc_tpu.data.vimeo import Vimeo90kSeptupletDataset

    for seq in ("00001/0010", "00001/0011"):
        base = os.path.basename(seq)
        _write_mp4(str(tmp_path / "sequences" / seq / f"{base}.mp4"),
                   n_frames=9)
    (tmp_path / "sep_trainlist.txt").write_text("00001/0010\n00001/0011\n")

    ds = Vimeo90kSeptupletDataset(str(tmp_path), n_frames=7, crop_size=32)
    assert len(ds) == 2
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(1))
    assert frames.shape == (7, 32, 32, 3)
    assert masks.shape == (7, 32, 32, 1) and masks.sum() == 0


def test_vimeo_split_generation_and_frame_cache(tmp_path):
    """generate_train_test_split + frame-count cache + flat-dir MP4 mode
    (reference dataset_vimeo.py:325-418)."""
    pytest.importorskip("cv2")
    from ssgvc_tpu.data.vimeo import (Vimeo90kMP4Dataset,
                                      cache_video_frames_info,
                                      generate_train_test_split,
                                      load_video_frames_info)

    for i in range(5):
        # one clip too short for a 7-frame window -> filtered by the cache
        _write_mp4(str(tmp_path / f"clip{i}.mp4"),
                   n_frames=4 if i == 4 else 8, seed=i)
    train, test = generate_train_test_split(str(tmp_path), train_split=0.8)
    assert len(train) == 4 and len(test) == 1
    assert (tmp_path / "sep_trainlist.txt").exists()

    info = cache_video_frames_info(
        [str(tmp_path / f"clip{i}.mp4") for i in range(5)],
        str(tmp_path / "cache.txt"))
    assert set(info.values()) == {8, 4}
    assert load_video_frames_info(str(tmp_path / "cache.txt")) == info

    ds = Vimeo90kMP4Dataset(str(tmp_path), crop_size=32, n_frames=7,
                            use_cache=True)
    # every surviving entry decodes to a 7-frame window
    assert all("clip" in p for p in ds.paths)
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(2))
    assert frames.shape == (7, 32, 32, 3)


def test_make_datamodule_vimeo_septuplet_dispatch(tmp_path):
    """make_datamodule routes dataset_type=vimeo_septuplet to the mp4
    loader (reference UnifiedVideoDataModule dispatch)."""
    pytest.importorskip("cv2")
    from ssgvc_tpu.config import DatasetConfig
    from ssgvc_tpu.data.dataset import make_datamodule

    for seq in ("00001/0010", "00001/0011", "00001/0012"):
        base = os.path.basename(seq)
        _write_mp4(str(tmp_path / "sequences" / seq / f"{base}.mp4"),
                   n_frames=6)
    (tmp_path / "sep_trainlist.txt").write_text(
        "00001/0010\n00001/0011\n00001/0012\n")

    cfg = DatasetConfig(dataset_type="vimeo_septuplet",
                        data_dir=str(tmp_path), batch_size=2, seq_len=4,
                        crop_size=32, train_val_test_split=(1.0, 0.0, 0.0))
    dm = make_datamodule(cfg)
    batch = next(dm.train_iter())
    assert batch["frames"].shape == (2, 4, 32, 32, 3)
    assert batch["masks"].shape == (2, 4, 32, 32, 1)


def test_load_pretrained_accepts_orbax_dmci_dir(tmp_path):
    """image_checkpoint_path pointing at a repo-native orbax dir (a DMCI
    pretrained with this framework) initializes params_i from it — the
    from-scratch counterpart of the reference's cvpr2025_image.pth.tar
    (trainer_seg_video_model.py:825-846)."""
    import jax
    import jax.numpy as jnp

    from ssgvc_tpu.config import TrainConfig
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.utils.checkpoint import load_pretrained, save_checkpoint

    cfg = TrainConfig(model_profile="tiny")
    cfg.precision = "fp32"
    trainer = Trainer(cfg, total_iters=1)
    state0 = trainer.init_state(jax.random.PRNGKey(3))
    marked = jax.tree_util.tree_map(lambda x: x + 1.5, state0.params_i)
    path = str(tmp_path / "dmci_pretrain")
    save_checkpoint(path, {"params_i": jax.device_get(marked)})

    cfg.image_checkpoint_path = path
    state = load_pretrained(trainer, cfg)
    got = jax.tree_util.tree_leaves(state.params_i)
    want = jax.tree_util.tree_leaves(marked)
    assert all(np.allclose(np.asarray(g), np.asarray(w))
               for g, w in zip(got, want))


def test_vimeo_frame_cache_split_merge_and_nested_keys(tmp_path):
    """Round-4 review findings: (a) constructing the test split must not
    evict the train split's cache rows (only MISSING entries are counted,
    merged with the loaded cache); (b) nested sequences_mp4/<a>/<b>.mp4
    layouts must not collide on basename."""
    pytest.importorskip("cv2")
    from ssgvc_tpu.data.vimeo import (Vimeo90kMP4Dataset,
                                      load_video_frames_info)

    # nested layout: two DIFFERENT clips with the same basename
    _write_mp4(str(tmp_path / "sequences_mp4" / "00001" / "0266.mp4"),
               n_frames=8, seed=0)
    _write_mp4(str(tmp_path / "sequences_mp4" / "00055" / "0266.mp4"),
               n_frames=4, seed=1)  # too short for a 7-frame window
    (tmp_path / "sep_trainlist.txt").write_text("00001/0266\n")
    (tmp_path / "sep_testlist.txt").write_text("00055/0266\n")

    ds_train = Vimeo90kMP4Dataset(str(tmp_path), split="train", crop_size=32,
                                  n_frames=7, use_cache=True)
    assert len(ds_train.paths) == 1  # 8-frame clip kept

    # the 4-frame clip with the SAME basename must be filtered out
    with pytest.raises(RuntimeError, match="no mp4 clips"):
        Vimeo90kMP4Dataset(str(tmp_path), split="test", crop_size=32,
                           n_frames=7, use_cache=True)

    # cache now holds BOTH entries under collision-free relative keys
    info = load_video_frames_info(str(tmp_path / "video_frames_cache.txt"))
    assert len(info) == 2 and sorted(info.values()) == [4, 8]

    # re-constructing train must not re-count (cache hit: rows preserved)
    ds_again = Vimeo90kMP4Dataset(str(tmp_path), split="train", crop_size=32,
                                  n_frames=7, use_cache=True)
    assert len(ds_again.paths) == 1


def test_layer_forensics_and_cpu_cross_check():
    """DebugProbe forensics: per-module activation stats via
    capture_intermediates (torch conv-hook equivalent) and the CPU
    cross-check both work on a tiny DMC forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.utils.debug import cpu_cross_check, layer_forensics

    tiny = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)
    model = DMC(DMCConfig.variant("performance", **tiny))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    m = jnp.asarray((rng.uniform(0, 1, (1, 64, 64, 1)) > 0.7), jnp.float32)
    dpb = {"frame": x, "feature": jnp.zeros((1, 8, 8, 16), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), x, jnp.int32(32), dpb,
                        after_i=True, mask=m, train=False)["params"]

    stats = layer_forensics(model, {"params": params}, x, jnp.int32(32),
                            dpb, after_i=True, mask=m, train=False)
    assert stats, "no intermediates captured"
    assert all(s["nonfinite"] == 0 for s in stats.values())
    assert any("encoder" in k or "decoder" in k or "recon" in k
               for k in stats)

    def fwd(x, m):
        out = model.apply({"params": params}, x, jnp.int32(32), dpb,
                          after_i=True, mask=m, train=False)
        return {"frame": out["dpb"]["frame"], "bpp": out["bpp"]}

    diffs = cpu_cross_check(fwd, x, m, atol=1e-3)
    assert diffs and max(diffs.values()) < 1e-3  # same backend here: exact
