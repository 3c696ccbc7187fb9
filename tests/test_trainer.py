"""Trainer smoke tests: GOP scan loss, 3-group optimizer, DP mesh execution."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles dominate

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
from ssgvc_tpu.training.trainer import Trainer, param_label


def tiny_trainer(**cfg_kw):
    # default accumulation off: most tests assert an immediate update
    cfg_kw.setdefault("accumulation_steps", 1)
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
    """MASK_TRAIN: only mask_predictor params move; loss is the BCE alone
    (reference trainer_seg_video_model.py:1080-1098)."""
    tr = tiny_trainer(dmc_variant="mask_prop", mask_train=True)
    batch = make_batch(seed=5)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params_p)
    step = tr.jit_train_step()
    state2, aux = step(state, batch, jnp.int32(12), jax.random.PRNGKey(3))
    assert np.isfinite(float(aux["loss"]))

    from flax.traverse_util import flatten_dict
    deltas = {
        "/".join(str(p) for p in k): float(np.sum(np.abs(np.asarray(a) - b)))
        for (k, a), b in zip(sorted(flatten_dict(state2.params_p).items()),
                             [v for _, v in
                              sorted(flatten_dict(before).items())])
    }
    moved = {k for k, d in deltas.items() if d > 0}
    assert moved, "mask_predictor params should update"
    assert all("mask_predictor" in k for k in moved), (
        f"non-mask_predictor params moved: "
        f"{[k for k in moved if 'mask_predictor' not in k][:5]}")


def test_grad_accumulation_equivalence():
    """accumulation_steps=2: two micro-steps on batches A, B apply exactly
    ONE optimizer update on the mean of the two micro-gradients (reference
    steps on the accumulation boundary with loss/acc_steps,
    trainer_seg_video_model.py:1100-1148)."""
    import optax

    batch_a = make_batch(b=2, seed=21)
    batch_b = make_batch(b=2, seed=22)
    qp = jnp.int32(25)
    rng_a, rng_b = jax.random.PRNGKey(7), jax.random.PRNGKey(8)

    tr_acc = tiny_trainer(accumulation_steps=2)
    state = tr_acc.init_state(jax.random.PRNGKey(0), batch_a)
    params0 = jax.device_get(state.params_p)
    step = tr_acc.jit_train_step()
    state, _ = step(state, batch_a, qp, rng_a)
    # no optimizer step yet: params unchanged after the first micro-batch
    mid = jax.device_get(state.params_p)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.array_equal(a, b), params0, mid))
    state, _ = step(state, batch_b, qp, rng_b)
    acc_params = jax.device_get(state.params_p)

    # manual: mean of the two micro-gradients through the base (acc=1) tx
    tr_one = tiny_trainer(accumulation_steps=1)

    def grad_of(batch, rng):
        def loss_fn(p):
            return tr_one.gop_loss(p, state.params_i, batch["frames"],
                                   batch["masks"], qp, rng, train=True,
                                   eval_mode=False)
        return jax.grad(loss_fn, has_aux=True)(params0)[0]

    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0,
                                    grad_of(batch_a, rng_a),
                                    grad_of(batch_b, rng_b))
    updates, _ = tr_one.tx.update(g_mean, tr_one.tx.init(params0), params0)
    expected = optax.apply_updates(params0, updates)

    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (ke, e) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(acc_params), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(expected), key=key)):
        # atol 3e-4: MultiSteps accumulates a running mean (a + (b-a)/2) vs
        # the manual (a+b)/2 — fp32 ordering noise through Adam's rsqrt.
        # Worst case is ~2x the lr-sized step on ONE element when a
        # near-zero gradient flips sign between the two orderings (the r05
        # bits_sigma_floor maximum() adds a kink where gradients land
        # exactly at zero, which made a 1/512-element flip show up).
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4,
                                   err_msg=f"param {ka}")


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


def test_recon_residual_threads_from_train_config():
    """CLI-facing contract: TrainConfig.recon_residual reaches the DMC
    config in both profile branches (the e2e journey and any from-scratch
    CLI run rely on this; docs/FROM_SCRATCH_TRAINING.md)."""
    tr = Trainer(TrainConfig(model_profile="tiny", recon_residual=True),
                 total_iters=1)
    assert tr.dmc_cfg.recon_residual is True
    tr2 = Trainer(TrainConfig(model_profile="tiny"), total_iters=1)
    assert tr2.dmc_cfg.recon_residual is False
