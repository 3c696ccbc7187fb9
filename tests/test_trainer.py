"""Trainer smoke tests: GOP scan loss, 3-group optimizer, DP mesh execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
from ssgvc_tpu.training.trainer import Trainer, param_label


def tiny_trainer(**cfg_kw):
    cfg = TrainConfig(**cfg_kw)
    cfg.precision = "fp32"
    cfg.dataset.batch_size = 8
    return Trainer(
        cfg, total_iters=100,
        dmc_cfg=DMCConfig.variant(cfg.dmc_variant, **dict(
            ch_d=16, ch_y=8, ch_z=8, ch_recon=16)),
        dmci_cfg=DMCIConfig.tiny(),
    )


def make_batch(b=8, t=3, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "frames": jnp.asarray(rng.uniform(0, 1, (b, t, hw, hw, 3)),
                              jnp.float32),
        "masks": jnp.asarray(
            (rng.uniform(0, 1, (b, t, hw, hw, 1)) > 0.7).astype(np.float32)),
    }


def test_param_labels():
    assert param_label(("bit_estimator_z", "f1", "h")) == "aux"
    assert param_label(("mask_sft", "conv1", "kernel")) == "probe"
    assert param_label(("q_sft",)) == "probe"
    assert param_label(("mask_predictor", "net_0", "kernel")) == "probe"
    assert param_label(("encoder", "conv1", "kernel")) == "backbone"


@pytest.mark.parametrize("variant", ["performance", "mask_prop"])
def test_train_step_runs_and_updates(variant):
    tr = tiny_trainer(dmc_variant=variant)
    batch = make_batch()
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    # snapshot before stepping: the step donates its input state
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params_p)
    step = tr.jit_train_step()
    state2, aux = step(state, batch, jnp.int32(17), jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["bpp"]))
    assert float(aux["psnr"]) > 0
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(np.sum(np.abs(x))), jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - b, state2.params_p, before), 0.0)
    assert delta > 0


def test_eval_step_deterministic():
    tr = tiny_trainer(dmc_variant="performance")
    batch = make_batch(seed=3)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    ev = tr.jit_eval_step()
    a1 = ev(state, batch, jnp.int32(30), jax.random.PRNGKey(5))
    a2 = ev(state, batch, jnp.int32(30), jax.random.PRNGKey(9))
    # eval path ignores noise rng (hard rounding)
    assert float(a1["loss"]) == pytest.approx(float(a2["loss"]), rel=1e-6)


def test_constraint_opt_mode():
    tr = tiny_trainer(dmc_variant="performance", constraint_opt=True)
    batch = make_batch(seed=4)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    step = tr.jit_train_step()
    state2, aux = step(state, batch, jnp.int32(10), jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    # dual accumulators were consumed by the update
    assert float(state2.alm_h_count) == 0.0


def test_mask_train_mode():
    tr = tiny_trainer(dmc_variant="mask_prop", mask_train=True)
    batch = make_batch(seed=5)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    step = tr.jit_train_step()
    _, aux = step(state, batch, jnp.int32(12), jax.random.PRNGKey(3))
    assert np.isfinite(float(aux["loss"]))


def test_batch_sharded_over_mesh():
    tr = tiny_trainer(dmc_variant="performance", num_devices=8)
    assert tr.mesh.devices.size == 8  # virtual CPU mesh from conftest
    from ssgvc_tpu.parallel.mesh import shard_batch
    batch = shard_batch(tr.mesh, make_batch(b=8))
    shard_devices = {d.id for d in batch["frames"].sharding.device_set}
    assert len(shard_devices) == 8
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    step = tr.jit_train_step()
    state2, aux = step(state, batch, jnp.int32(8), jax.random.PRNGKey(4))
    assert np.isfinite(float(aux["loss"]))


def test_training_overfits_one_batch():
    """Overfit-one-batch sanity: with a raised lr, repeated steps on one
    fixed batch at one qp must reduce its RD loss. Catches broken gradients,
    optimizer mislabeling, or detach bugs in the GOP rollout."""
    from ssgvc_tpu.training.trainer import Trainer
    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig

    cfg = TrainConfig(dmc_variant="performance")
    cfg.precision = "fp32"
    cfg.optimizer.base_lr = 3e-3
    tr = Trainer(cfg, total_iters=10_000,
                 dmc_cfg=DMCConfig.variant("performance", ch_d=16, ch_y=8,
                                           ch_z=8, ch_recon=16),
                 dmci_cfg=DMCIConfig.tiny())

    batch = make_batch(b=4, t=3, hw=64, seed=11)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    step = tr.jit_train_step()
    ev = tr.jit_eval_step()

    fixed_qp = jnp.int32(40)
    before = float(ev(state, batch, fixed_qp, jax.random.PRNGKey(1))["loss"])
    rng = jax.random.PRNGKey(2)
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, fixed_qp, sub)
        assert np.isfinite(float(aux["loss"]))
    after = float(ev(state, batch, fixed_qp, jax.random.PRNGKey(1))["loss"])
    assert after < before
