"""Worker for tests/test_mesh.py::test_two_process_data_parallel_step.

Launched twice (process_id 0/1) with the coordinator env set, so
``maybe_init_distributed`` must trigger ``jax.distributed.initialize`` by
itself, the mesh must span both processes' devices, and ``shard_batch`` must
take its process-local branch (``jax.make_array_from_process_local_data``).
One real data-parallel Trainer step then runs SPMD over gloo — the rebuild's
counterpart of the reference's multi-node Lightning DDP launch
(/root/reference/lrz.md).

Prints ``DIST_OK loss=<float>`` on success; the launcher asserts both
processes print the same loss (replicated-state consistency).
"""

import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssgvc_tpu.parallel import mesh as mesh_mod

    assert mesh_mod.maybe_init_distributed(), \
        "coordinator env must trigger distributed init"
    assert jax.process_count() == 2, jax.process_count()
    mesh = mesh_mod.make_mesh()
    assert mesh.devices.size == 4, mesh.devices.size  # 2 procs x 2 local

    from ssgvc_tpu.config import DMCConfig, DMCIConfig, TrainConfig
    from ssgvc_tpu.training.trainer import Trainer

    cfg = TrainConfig(dmc_variant="performance", accumulation_steps=1)
    cfg.precision = "fp32"
    cfg.dataset.batch_size = 4
    tr = Trainer(
        cfg, total_iters=10,
        dmc_cfg=DMCConfig.variant("performance", ch_d=8, ch_y=8, ch_z=8,
                                  ch_recon=8),
        dmci_cfg=DMCIConfig.tiny(),
        mesh=mesh,
    )

    # Each process contributes its LOCAL half of the global batch of 4 —
    # deterministic per-process content so the run is reproducible.
    pid = jax.process_index()
    rng = np.random.default_rng(100 + pid)
    local = {
        "frames": rng.uniform(0, 1, (2, 2, 64, 64, 3)).astype(np.float32),
        "masks": (rng.uniform(0, 1, (2, 2, 64, 64, 1)) > 0.7
                  ).astype(np.float32),
    }
    batch = mesh_mod.shard_batch(mesh, local)
    assert batch["frames"].shape == (4, 2, 64, 64, 3)  # global shape

    state = tr.init_state(jax.random.PRNGKey(0), batch)
    step = tr.jit_train_step()
    state2, aux = step(state, batch, jnp.int32(20), jax.random.PRNGKey(1))
    loss = float(aux["loss"])
    assert np.isfinite(loss)
    print(f"DIST_OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
