"""Configuration schema mirroring the reference's OmegaConf dataclasses.

Public surface parity: the same ``video_compression_config.yaml`` keys
(trainer_seg_video_model.py:386-467) load unchanged; CLI ``key=value`` dotted
overrides merge on top (we use OmegaConf when available, plain YAML+dataclass
merge otherwise).

Model configs (DMCIConfig/DMCConfig) match src/refactor/config.py and add
tiny-profile constructors for tests plus TPU knobs (compute dtype).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


# --------------------------- model configs ---------------------------

@dataclass(frozen=True)
class DMCIConfig:
    """Intra codec (reference src/refactor/config.py:6-12, image_model.py)."""
    patch_size: int = 8
    src: int = 3 * 8 * 8
    enc_dec: int = 368
    N: int = 256
    z_channel: int = 128
    qp_num: int = 64
    dtype: str = "float32"  # computation dtype: float32 | bfloat16
    # Geometric QP ramp for the per-QP gain tables at INIT. The reference
    # initializes them to ones (src/models/video_model.py:201-202) because it
    # always finetunes from DCVC-RT checkpoints whose tables already encode
    # the rate ladder; training from scratch with ones gives a flat RD
    # response for a long time. Checkpoint import overwrites these either way.
    qp_ramp_init: bool = True

    @staticmethod
    def tiny() -> "DMCIConfig":
        return DMCIConfig(patch_size=8, src=3 * 8 * 8, enc_dec=32, N=16,
                          z_channel=8, qp_num=64)


@dataclass(frozen=True)
class DMCConfig:
    """Inter codec (reference src/refactor/config.py:15-26)."""
    patch_size: int = 8
    src: int = 3 * 8 * 8
    ch_d: int = 256
    ch_y: int = 128
    ch_z: int = 128
    ch_recon: int = 320
    qp_shift: Tuple[int, int, int] = (0, 8, 4)
    extra_qp: int = 8
    qp_num: int = 64
    dtype: str = "float32"
    # variant conditioning (replaces the reference's four copied model files):
    #   mask_mode: none | sft_latent (performance) | film_hyper (fast/mask_prop)
    #   mask_source: gt | propagated (mask_prop)
    mask_mode: str = "none"
    mask_source: str = "gt"
    # 'old' keeps src/models/video_model.py op-order quirks (encoder 2-block
    # conv2 stack, decoder quant-after-conv, y padded before SFT-free hyper).
    legacy_old: bool = False
    # packed_io: frames/masks/dpb-frames enter and leave in the PACKED
    # (pixel-unshuffled, H/8 x W/8 x 192) domain. The 8x8 patching is a
    # lossless permutation, so the codec math is identical, but the hot loop
    # sheds ~1.5 ms/frame of 1080p layout copies (profiled): callers
    # unshuffle once per batch instead of the model (un)shuffling per frame.
    # (mask_source='propagated' works too: DMC.predict_mask unpacks just
    # the 1-ch mask for the bilinear FCN and repacks the logits.)
    packed_io: bool = False
    # Sigma floor for the DIFFERENTIABLE rate estimate, matching the real
    # coder's scale-table minimum (coding/codec.py scale_min=0.11): the
    # coder clamps every sigma up to the first table row, so an estimate
    # using the raw (smaller) sigma overcharges nonzero symbols there —
    # measured 13-24% real-UNDER-estimate at QP8 on r05 trained
    # checkpoints. 0.0 = reference-faithful (the reference never reconciled
    # its estimator with a working coder; its get_y_gaussian_bits clamps
    # only at 1e-5 — src/models/common_model.py:36-40).
    bits_sigma_floor: float = 0.11
    # Geometric QP ramp for q_encoder/q_decoder at INIT (see DMCIConfig.
    # qp_ramp_init — same rationale; from-scratch variable-rate training).
    qp_ramp_init: bool = True
    # recon_residual: from-scratch training aid. Zero-inits the decoder's
    # final projection and the recon head and adds skip connections (decoder
    # += ctx, recon += previous decoded frame), so a fresh model reconstructs
    # the previous frame EXACTLY at step 0 (~27-30 dB copy-prev bound on the
    # synthetic clips) instead of spending its whole budget climbing out of a
    # random init (measured: 16 dB after 6k CPU steps without it). Same
    # parameter tree/shapes as the default, but NOT for imported reference
    # checkpoints (their trained head + the skip would double the signal).
    recon_residual: bool = False

    @staticmethod
    def variant(name: str, **kw) -> "DMCConfig":
        presets = {
            "old": dict(mask_mode="none", mask_source="gt", legacy_old=True),
            "plain": dict(mask_mode="none", mask_source="gt"),
            "performance": dict(mask_mode="sft_latent", mask_source="gt"),
            "fast": dict(mask_mode="film_hyper", mask_source="gt"),
            "mask_prop": dict(mask_mode="film_hyper", mask_source="propagated"),
        }
        if name not in presets:
            raise ValueError(
                f"Unknown dmc_variant={name!r}. Expected one of "
                f"{sorted(presets)}")
        return DMCConfig(**{**presets[name], **kw})

    @staticmethod
    def tiny(**kw) -> "DMCConfig":
        base = dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16)
        base.update(kw)
        return DMCConfig(**base)


#: Named model-size profiles shared by the CLI tools and the RD experiment
#: harness. "full" is the reference's published size (src/refactor/config.py);
#: the smaller tiers exist because the 1-core CPU host cannot compile/train
#: the full model in useful time — same architecture, fewer channels.
MODEL_PROFILES = {
    "full": dict(dmc={}, dmci={}),
    "tiny": dict(dmc=dict(ch_d=16, ch_y=8, ch_z=8, ch_recon=16),
                 dmci=dict(enc_dec=32, N=16, z_channel=8)),
    "rd-tiny": dict(dmc=dict(ch_d=32, ch_y=16, ch_z=16, ch_recon=32),
                    dmci=dict(enc_dec=48, N=32, z_channel=32)),
    "rd-mid": dict(dmc=dict(ch_d=64, ch_y=32, ch_z=32, ch_recon=96),
                   dmci=dict(enc_dec=96, N=64, z_channel=32)),
    # half the reference's published width (ch_d 256 -> 128): the step
    # between rd-mid and full that shows the training recipe transfers
    # toward the published model size (VERDICT r04 #6)
    "rd-half": dict(dmc=dict(ch_d=128, ch_y=64, ch_z=64, ch_recon=160),
                    dmci=dict(enc_dec=184, N=128, z_channel=64)),
}


def profile_model_cfgs(profile: str, variant: str = "performance",
                       dtype: str = "float32", **dmc_overrides):
    """(DMCConfig, DMCIConfig) for a named size profile — the one place the
    size tiers are defined, so a checkpoint trained at any tier can be
    reloaded by name from every entry point (encode/decode CLIs, rd_*)."""
    if profile not in MODEL_PROFILES:
        raise ValueError(f"Unknown profile {profile!r}; expected one of "
                         f"{sorted(MODEL_PROFILES)}")
    p = MODEL_PROFILES[profile]
    dmc = DMCConfig.variant(variant, dtype=dtype,
                            **{**p["dmc"], **dmc_overrides})
    dmci = DMCIConfig(dtype=dtype, **p["dmci"])
    return dmc, dmci


# --------------------------- training configs ---------------------------

@dataclass
class OptimizerConfig:
    optimizer_type: str = "adamw"
    base_lr: float = 1e-4
    min_lr: float = 1e-5
    aux_lr: float = 5e-4
    weight_decay: float = 0.01
    warmup_iters: int = 0


@dataclass
class CompressionConfig:
    lambda_min: float = 50.0
    lambda_max: float = 38400.0
    q_levels: int = 64
    index_map: List[int] = field(default_factory=lambda: [0, 1, 0, 2, 0, 2, 0, 2])
    weights_map: Dict[int, float] = field(
        default_factory=lambda: {0: 0.5, 1: 1.2, 2: 0.9})


@dataclass
class DatasetConfig:
    dataset_type: str = "waymo"
    data_dir: str = "./dataset/waymo"
    seg_cache_dir: str = "seg_cache"
    batch_size: int = 4
    num_workers: int = 0
    n_frames: int = 4
    seq_len: Optional[int] = 4
    slide: int = 1
    crop: Any = field(default_factory=lambda: [128, 128])
    crop_size: Optional[int] = 128
    yuv_format: str = "444"
    train_val_test_split: Tuple[float, float, float] = (0.9, 0.1, 0.0)
    train_split: float = 0.9
    use_cache: bool = True
    strict_masks: bool = False
    synthetic: bool = False           # synthetic frames when no TFRecords exist
    synthetic_num_clips: int = 64


@dataclass
class TrainConfig:
    """Top-level schema (reference VideoCompressionConfig,
    trainer_seg_video_model.py:424-467)."""
    epochs: int = 25
    dtype: str = "float32"
    accumulation_steps: int = 8
    grad_clip: float = 5.0

    log_interval: int = 50
    val_check_interval: float = 1.0
    save_top_k: int = 3

    out_dir: str = "out"
    image_checkpoint_path: str = ""
    video_checkpoint_path: str = ""
    psnrm_target_path: Optional[str] = None
    psnrm_default_db: float = 35.0
    dmc_variant: str = "performance"
    build_cache: bool = False
    constraint_opt: bool = False
    mask_train: bool = False
    roi_weight: float = 100.0         # ROI MSE weight (1 + w*mask)
    # divide the RD loss by lambda(qp): same per-QP optimum, balanced
    # gradients across mixed-QP batches (from-scratch recipe knob; the
    # reference finetunes pretrained weights and never needs it)
    lambda_normalize: bool = False
    # init-time quantizer-gain calibration (training/calibrate.py): fresh
    # inits only, no effect on restored/imported checkpoints
    calibrate_gains: bool = True
    # from-scratch recipe: recon = prev frame + zero-init correction, so
    # training starts at the copy-previous bound (DMCConfig.recon_residual;
    # docs/FROM_SCRATCH_TRAINING.md). Leave False when finetuning imported
    # reference weights — their trained head plus the skip doubles the signal
    recon_residual: bool = False

    exp_name: str = "video-compression-waymo"
    model_profile: str = "full"       # full | tiny (CI/smoke runs)
    log_dir: str = "./logs"
    seed: int = 42
    precision: str = "bf16-mixed"     # TPU: bf16 compute, fp32 params/entropy
    num_devices: int = 1
    resume_from_checkpoint: Optional[str] = None

    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    compression: CompressionConfig = field(default_factory=CompressionConfig)

    # ALM / constrained-optimization hyperparams. The reference also parses
    # wmse_target / lagr_ema_alpha / mask_fg_weight but only ever reads them
    # from commented-out code (trainer_seg_video_model.py:943,977,516-528) —
    # those are intentionally NOT part of this schema (unknown YAML keys are
    # tolerated by the merge, so reference configs still load).
    lagr_rho: float = 5.0
    lagr_init_lambda: float = 1.0   # initial ALM dual variable mu
    lagr_lambda_max: float = 1e3    # clamp for mu in the dual ascent
    alm_penalty_scale: float = 0.3


def _merge_into_dataclass(obj, data: dict):
    for key, value in data.items():
        if not hasattr(obj, key):
            continue  # tolerate unknown keys like the reference's schema merge
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _merge_into_dataclass(current, value)
        else:
            setattr(obj, key, value)
    return obj


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> TrainConfig:
    """YAML file + dotted CLI overrides -> TrainConfig."""
    cfg = TrainConfig()
    data: dict = {}
    if yaml_path:
        import yaml
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
    # accept the reference's num_gpus spelling
    if "num_gpus" in data:
        data["num_devices"] = data.pop("num_gpus")
    _merge_into_dataclass(cfg, data)
    for ov in overrides or []:
        if "=" not in ov:
            continue
        key, _, raw = ov.partition("=")
        if key == "num_gpus":
            key = "num_devices"
        import yaml
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.split(".")
        # CLI overrides are STRICT: a typo'd key (e.g. max_iters for epochs)
        # silently training for 25 epochs is exactly the failure mode the
        # tolerant YAML merge must not extend to explicit flags.
        for comp in parts[:-1]:
            if not hasattr(node, comp):
                raise KeyError(f"unknown config section {comp!r} in "
                               f"override {ov!r}")
            node = getattr(node, comp)
        if not hasattr(node, parts[-1]):
            raise KeyError(f"unknown config key {key!r} in override {ov!r} "
                           f"(did you mean one of "
                           f"{sorted(vars(node))[:8]}...?)")
        setattr(node, parts[-1], value)
    return cfg
