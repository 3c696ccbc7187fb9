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


@pytest.mark.slow
def test_two_process_data_parallel_step():
    """Launch TWO real processes that discover each other through the
    coordinator env, span one 4-device mesh, and run one SPMD train step —
    proving maybe_init_distributed + shard_batch's process-local branch are
    live code (reference counterpart: multi-node DDP, /root/reference/lrz.md).
    """
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}  # never dial the TPU relay
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs, losses = [], []
    for p in procs:
        try:
            # generous: two fresh JAX processes compile serially on this
            # 1-core host, often while a training marathon owns the core
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
        line = [ln for ln in out.splitlines() if ln.startswith("DIST_OK")]
        assert line, f"no DIST_OK in worker output:\n{out}"
        losses.append(float(line[0].split("loss=")[1]))
    # SPMD: both processes computed the same global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


def test_replicated_sharding():
    m = mesh_mod.make_mesh()
    sh = mesh_mod.replicated(m)
    x = jax.device_put(jnp.ones((4, 4)), sh)
    np.testing.assert_array_equal(np.asarray(x), np.ones((4, 4)))


def test_make_mesh_rejects_too_many_devices():
    # round-3 verdict item #8: a clear error instead of silent truncation
    n = len(jax.devices())
    with pytest.raises(ValueError, match="requested but only"):
        mesh_mod.make_mesh(n + 1)


def test_spatial_sharded_pframe_matches_single_device():
    """parallel/spatial.py: single-stream P-frame with the H axis sharded
    over the mesh must match the unsharded forward (XLA SPMD inserts the
    depthwise-3x3 halo exchanges; bpp reduces with a psum). Latency-scaling
    counterpart of the throughput-scaling data mesh."""
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.parallel.spatial import jit_spatial_pframe, shard_rows

    m = mesh_mod.make_mesh()
    n = m.devices.size
    cfg = DMCConfig.variant("performance", ch_d=16, ch_y=8, ch_z=8,
                            ch_recon=16)
    model = DMC(cfg)
    h = 8 * 8 * n  # 8 rows/device after the 8x8 patching
    w = 64
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (1, h, w, 3), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 1))
            > 0.7).astype(jnp.float32)
    dpb = {"frame": jax.random.uniform(jax.random.PRNGKey(2), (1, h, w, 3)),
           "feature": jax.random.normal(
               jax.random.PRNGKey(3), (1, h // 8, w // 8, cfg.ch_d)) * 0.1}
    params = model.init({"params": k, "noise": k}, x, jnp.int32(32), dpb,
                        after_i=False, mask=mask, train=False)["params"]

    ref = model.apply({"params": params}, x, jnp.int32(32), dpb,
                      after_i=False, mask=mask, train=False)

    fn = jit_spatial_pframe(model, m)
    dpb_s, (x_s, m_s) = shard_rows(m, dpb), shard_rows(m, (x, mask))
    out_dpb, bpp = fn(params, x_s, m_s, jnp.int32(32), dpb_s)

    assert out_dpb["frame"].sharding.spec[1] == "data"
    # bpp reduces via psum over row slabs: summation order differs from the
    # single-device reduction, fp32 noise only
    np.testing.assert_allclose(np.asarray(bpp), np.asarray(ref["bpp"]),
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dpb["frame"]),
                               np.asarray(ref["dpb"]["frame"]),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_dpb["feature"]),
                               np.asarray(ref["dpb"]["feature"]),
                               rtol=2e-5, atol=2e-4)


def test_2d_mesh_data_x_spatial_pframe():
    """2-D data x spatial mesh: B sharded over 'data', H over 'spatial';
    per-sample bpp and recons must match single-device."""
    from ssgvc_tpu.config import DMCConfig
    from ssgvc_tpu.models.dmc import DMC
    from ssgvc_tpu.parallel.spatial import jit_spatial_pframe, shard_rows

    n = jax.device_count()
    if n % 2:
        pytest.skip("needs an even device count")
    spatial = n // 2
    m = mesh_mod.make_mesh(axis_names=("data", "spatial"), spatial=spatial)
    assert m.shape == {"data": 2, "spatial": spatial}

    cfg = DMCConfig.variant("plain", ch_d=16, ch_y=8, ch_z=8, ch_recon=16)
    model = DMC(cfg)
    b, h, w = 2, 8 * 8 * spatial, 32
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (b, h, w, 3), jnp.float32)
    dpb = {"frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3)),
           "feature": jax.random.normal(
               jax.random.PRNGKey(3), (b, h // 8, w // 8, cfg.ch_d)) * 0.1}
    params = model.init({"params": k, "noise": k}, x, jnp.int32(32), dpb,
                        after_i=False, train=False)["params"]
    ref = model.apply({"params": params}, x, jnp.int32(32), dpb,
                      after_i=False, train=False)

    fn = jit_spatial_pframe(model, m, axis="spatial", batch_axis="data")
    mask = jnp.zeros((b, h, w, 1), jnp.float32)
    dpb_s, (x_s, m_s) = (shard_rows(m, dpb, "spatial", "data"),
                         shard_rows(m, (x, mask), "spatial", "data"))
    out_dpb, bpp = fn(params, x_s, m_s, jnp.int32(32), dpb_s)

    assert bpp.shape == (b,)
    np.testing.assert_allclose(np.asarray(bpp), np.asarray(ref["bpp"]),
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dpb["frame"]),
                               np.asarray(ref["dpb"]["frame"]),
                               rtol=2e-5, atol=1e-4)


def test_make_mesh_2d_validates_divisibility():
    with pytest.raises(ValueError, match="must divide"):
        mesh_mod.make_mesh(axis_names=("data", "spatial"),
                           spatial=jax.device_count() + 1)
