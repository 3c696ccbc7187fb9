"""parallel/mesh.py: mesh construction, sharding helpers, multi-host gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssgvc_tpu.parallel import mesh as mesh_mod


def test_make_mesh_and_shard_batch():
    m = mesh_mod.make_mesh()
    n = m.devices.size
    batch = {"frames": np.zeros((2 * n, 3, 8, 8, 3), np.float32)}
    sharded = mesh_mod.shard_batch(m, batch)
    assert sharded["frames"].shape == (2 * n, 3, 8, 8, 3)
    # batch axis is sharded over the data axis
    sh = sharded["frames"].sharding
    assert sh.spec[0] == "data"


def test_make_mesh_truncates():
    m = mesh_mod.make_mesh(1)
    assert m.devices.size == 1


def test_maybe_init_distributed_noop_single_process(monkeypatch):
    """Without SSGVC_DIST/coordinator env the multi-host path must be a
    no-op (single-process semantics unchanged)."""
    monkeypatch.delenv("SSGVC_DIST", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert mesh_mod.maybe_init_distributed() in (False, True)  # True only if
    # a previous test initialized it; either way no exception and mesh works
    assert mesh_mod.make_mesh().devices.size >= 1


def test_replicated_sharding():
    m = mesh_mod.make_mesh()
    sh = mesh_mod.replicated(m)
    x = jax.device_put(jnp.ones((4, 4)), sh)
    np.testing.assert_array_equal(np.asarray(x), np.ones((4, 4)))
