"""Probe: can the P-model learn to beat frame-copy when rate pressure is
negligible? Pins lambda to a huge constant so the RD loss is effectively
pure distortion. If PSNR climbs past the ~26 dB copy baseline the machinery
is fine and flat-RD is a staged-training problem; if it stalls ~13 dB there
is a structural bug."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, jax, jax.numpy as jnp
from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
from ssgvc_tpu.training.trainer import Trainer
from ssgvc_tpu.data.dataset import ClipDataModule, SyntheticClipDataset
from ssgvc_tpu.utils.checkpoint import restore_checkpoint

variant = sys.argv[1] if len(sys.argv) > 1 else "plain"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500

cfg = TrainConfig(dmc_variant=variant, accumulation_steps=1)
cfg.precision = "fp32"
cfg.optimizer.base_lr = 7e-4
cfg.roi_weight = 1.0
cfg.compression.lambda_min = 1e5   # distortion-only probe
cfg.compression.lambda_max = 1e5
tr = Trainer(cfg, total_iters=steps,
             dmc_cfg=DMCConfig.variant(variant, ch_d=32, ch_y=16, ch_z=16, ch_recon=32),
             dmci_cfg=DMCIConfig(enc_dec=48, N=32, z_channel=32))
ds = SyntheticClipDataset(num_clips=512, seq_len=4, crop_size=64, seed=3, texture="smooth")
dm = ClipDataModule(ds, batch_size=4, split=(0.95, 0.05, 0.0), seed=3)
it = dm.train_iter()
first = {k: jnp.asarray(v) for k, v in next(it).items()}

# copy-baseline on this data
f = np.asarray(first["frames"])
cp = 10*np.log10(1.0/np.mean((f[:,1:]-f[:,:-1])**2))
print(f"copy-baseline psnr on train batch: {cp:.2f} dB", flush=True)

ck = restore_checkpoint('/root/repo/artifacts/rd_ckpt_performance')
state = tr.init_state(jax.random.PRNGKey(0), first, params_i=ck['params_i'])
step = tr.jit_train_step()
rng = jax.random.PRNGKey(1)
t0 = time.perf_counter()
for i in range(steps):
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    rng, sub = jax.random.split(rng)
    state, aux = step(state, batch, jnp.int32(32), sub)
    if i % 100 == 0:
        mse = float(aux["mse"]); psnr = 10*np.log10(1.0/max(mse,1e-9))
        print(f"step {i}: loss {float(aux['loss']):.1f} bpp {float(aux['bpp']):.4f} "
              f"P-psnr {psnr:.2f} ({time.perf_counter()-t0:.0f}s)", flush=True)
