"""Data pipeline: TFRecord framing, proto walker, mask cache, clip windows."""

import numpy as np
import pytest

from ssgvc_tpu.data import tfrecord, waymo_proto
from ssgvc_tpu.data.build_cache import (
    atomic_save_npz,
    build_cache,
    union_instance_masks,
)
from ssgvc_tpu.data.dataset import (
    ClipDataModule,
    SyntheticClipDataset,
    WaymoClipDataset,
)


def make_fake_waymo_tfrecord(path, n_frames=6, hw=(64, 96), seed=0):
    rng = np.random.default_rng(seed)
    records = []
    for _ in range(n_frames):
        rgb = (rng.uniform(0, 1, (hw[0], hw[1], 3)) * 255).astype(np.uint8)
        jpeg = waymo_proto.encode_jpeg(rgb)
        records.append(waymo_proto.build_frame_proto(jpeg))
    tfrecord.write_records(str(path), records)
    return records


def test_tfrecord_round_trip(tmp_path):
    path = tmp_path / "a.tfrecord"
    payloads = [b"hello", b"x" * 1000, b""]
    tfrecord.write_records(str(path), payloads)
    got = list(tfrecord.read_records(str(path), verify_crc=True))
    assert got == payloads
    assert tfrecord.count_records(str(path)) == 3
    offs = tfrecord.record_offsets(str(path))
    with open(path, "rb") as f:
        assert tfrecord.read_record_at(f, offs[1]) == payloads[1]


def test_proto_walker_round_trip():
    jpeg = waymo_proto.encode_jpeg(np.zeros((16, 16, 3), np.uint8))
    frame = waymo_proto.build_frame_proto(jpeg, context_name="seg-123")
    assert waymo_proto.parse_front_jpeg(frame) == jpeg
    assert waymo_proto.parse_context_name(frame) == "seg-123"
    rgb = waymo_proto.decode_jpeg(jpeg)
    assert rgb.shape == (16, 16, 3)


def test_reference_tfrecord_compat(tmp_path):
    """Our writer's records parse with the reference's vendored reader."""
    import sys
    from conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        pytest.skip("no reference")
    sys.path.insert(0, f"{REFERENCE_ROOT}/ext/simple-waymo-open-dataset-reader")
    try:
        from simple_waymo_open_dataset_reader import WaymoDataFileReader
    except Exception:
        pytest.skip("vendored reader not importable (protobuf version)")
    path = tmp_path / "b.tfrecord"
    make_fake_waymo_tfrecord(path, n_frames=3)
    frames = list(WaymoDataFileReader(str(path)))
    assert len(frames) == 3
    assert frames[0].images[0].name == 1  # FRONT


def test_union_instance_masks():
    a = np.zeros((32, 32), np.float32)
    a[4:20, 4:20] = 0.9
    b = np.zeros((32, 32), np.float32)
    b[0:2, 0:2] = 0.9  # tiny blob below min_area
    out = union_instance_masks([(a, 2), (b, 2), (a, 7)], (32, 32),
                               classes_keep=(0, 2, 5), min_area=16)
    assert out[10, 10] == 1
    assert out[1, 1] == 0  # filtered by area
    out2 = union_instance_masks([(a, 7)], (32, 32))
    assert out2.sum() == 0  # class filtered


def test_build_cache_and_dataset(tmp_path):
    tf_path = tmp_path / "clip.tfrecord"
    make_fake_waymo_tfrecord(tf_path, n_frames=6, hw=(64, 96))
    cache = tmp_path / "seg_cache"

    def fake_segmenter(rgb):
        m = np.zeros(rgb.shape[:2], np.float32)
        m[10:40, 20:60] = 1.0
        return [(m, 2)]

    stats = build_cache(str(tf_path), str(cache), segmenter=fake_segmenter)
    assert stats["written"] == 6
    # idempotent skip
    stats2 = build_cache(str(tf_path), str(cache), segmenter=fake_segmenter)
    assert stats2["skipped"] == 6 and stats2["written"] == 0

    ds = WaymoClipDataset([str(tf_path)], seg_cache_dir=str(cache),
                          seq_len=4, slide=1, crop_size=32, strict_masks=True)
    assert len(ds) == 3  # 6 frames, windows of 4, stride 1
    frames, masks = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert frames.shape == (4, 32, 32, 3)
    assert masks.shape == (4, 32, 32, 1)
    assert frames.min() >= 0.0 and frames.max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}


def test_strict_masks_raises(tmp_path):
    tf_path = tmp_path / "clip.tfrecord"
    make_fake_waymo_tfrecord(tf_path, n_frames=4)
    ds = WaymoClipDataset([str(tf_path)], seg_cache_dir=str(tmp_path / "none"),
                          seq_len=4, crop_size=None, strict_masks=True)
    with pytest.raises(FileNotFoundError):
        ds.__getitem__(0)
    ds2 = WaymoClipDataset([str(tf_path)], seg_cache_dir=str(tmp_path / "none"),
                           seq_len=4, crop_size=None, strict_masks=False)
    _, masks = ds2.__getitem__(0)
    assert masks.sum() == 0


def test_synthetic_datamodule():
    ds = SyntheticClipDataset(num_clips=10, seq_len=3, crop_size=64)
    dm = ClipDataModule(ds, batch_size=2, split=(0.8, 0.2, 0.0), seed=1)
    assert len(dm.train_indices) == 8 and len(dm.val_indices) == 2
    batch = next(dm.train_iter())
    assert batch["frames"].shape == (2, 3, 64, 64, 3)
    assert batch["masks"].shape == (2, 3, 64, 64, 1)
    # deterministic clips
    f1, m1 = ds.__getitem__(3)
    f2, m2 = ds.__getitem__(3)
    np.testing.assert_array_equal(f1, f2)
    assert m1.any()


def test_small_split_still_yields_batches():
    """Splits smaller than batch_size must not spin forever (regression)."""
    ds = SyntheticClipDataset(num_clips=10, seq_len=2, crop_size=32)
    dm = ClipDataModule(ds, batch_size=4, split=(0.8, 0.2, 0.0), seed=0)
    assert len(dm.val_indices) == 2  # smaller than batch_size
    batch = next(dm.val_iter(loop=True))
    assert batch["frames"].shape[0] == 4


def test_multi_host_sampler_shards_are_disjoint_and_cover():
    """ClipDataModule(rank, world) = torch DistributedSampler semantics:
    same-seed hosts permute identically, stride into disjoint shards whose
    union covers the epoch, wrap-padded to equal length (the reference's
    Lightning DDP injected this sampler implicitly)."""
    ds = SyntheticClipDataset(num_clips=11, seq_len=2, crop_size=32)
    world = 3
    dms = [ClipDataModule(ds, batch_size=1, split=(1.0, 0.0, 0.0), seed=7,
                          rank=r, world=world) for r in range(world)]
    # reproduce each host's first-epoch order via the same derivation
    per_epoch = []
    for dm in dms:
        rng = np.random.default_rng(dm.seed)
        order = rng.permutation(dm.train_indices)
        per_host = -(-len(order) // world)
        per_epoch.append(np.resize(order, per_host * world)[dm.rank::world])
    lens = {len(o) for o in per_epoch}
    assert lens == {4}  # ceil(11/3), wrap-padded
    union = np.concatenate(per_epoch)
    assert set(union.tolist()) == set(dms[0].train_indices.tolist())
    # disjoint up to the wrap-pad: only ONE duplicated sample total
    assert len(union) - len(set(union.tolist())) == 1
    assert all(dm.steps_per_epoch() == 4 for dm in dms)
    # iterators actually yield those shards (batch of 1 -> sample per step)
    for dm, expect in zip(dms, per_epoch):
        it = dm.train_iter(loop=False)
        got = [next(it) for _ in range(4)]
        assert all(b["frames"].shape[0] == 1 for b in got)


def test_multi_host_sampler_rank_validation():
    ds = SyntheticClipDataset(num_clips=4, seq_len=2, crop_size=32)
    try:
        ClipDataModule(ds, rank=2, world=2)
    except ValueError as e:
        assert "rank" in str(e)
    else:
        raise AssertionError("rank >= world must raise")
