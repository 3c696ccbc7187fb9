"""Spatial (H-axis) sharding for single-stream 1080p inference.

The data-parallel mesh (parallel/mesh.py) scales THROUGHPUT: independent
streams per device. This module scales LATENCY for one stream: the frame's
H dimension is sharded over the mesh, every conv runs on its row slab, and
XLA's SPMD partitioner inserts the halo exchanges the 3x3 depthwise convs
need at slab boundaries (one row each way over ICI) plus the final psum for
the bpp reduction. Nothing model-side changes — the same flax module runs
unmodified; sharding is applied purely at the jit boundary.

The reference has no counterpart (its only strategy is DDP throughput
scaling, trainer_seg_video_model.py:1487-1489); this is the TPU-native
answer to "one camera, lower latency": conv halo traffic rides ICI and
grows with the CUT (W x C), not the slab area.

Constraints: per-device row count must stay divisible by the 8x8 patching
(H / n_devices % 8 == 0 in pixel space — 1088 rows over 8 devices = 136
each, fine), and B stays unsharded (1 for single-stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def row_sharding(mesh: Mesh, axis: str = "data",
                 batch_axis: str = None) -> NamedSharding:
    """NHWC activation sharding: H (dim 1) split over ``axis``; on a 2-D
    data x spatial mesh pass ``batch_axis`` to shard B (dim 0) as well."""
    return NamedSharding(mesh, P(batch_axis, axis))


def jit_spatial_pframe(model, mesh: Mesh, axis: str = "data",
                       batch_axis: str = None):
    """Jitted P-frame forward with H-sharded activations.

    Returns ``fn(params, frame, mask, qp, dpb) -> (new_dpb, bpp)`` where
    frame/mask/dpb entries are NHWC with H sharded over ``axis`` and params
    are replicated. Works in both packed_io and pixel-space modes (the
    sharded dim is H in whatever domain the model ingests).

    On a 2-D mesh (``make_mesh(axis_names=("data", "spatial"), spatial=M)``)
    pass ``axis="spatial", batch_axis="data"``: each device row serves a
    group of streams, each stream's frame split M ways — combined
    throughput x latency scaling.
    """
    rows = row_sharding(mesh, axis, batch_axis)
    rep = NamedSharding(mesh, P())
    bpp_sh = NamedSharding(mesh, P(batch_axis))  # per-sample bpp (B,)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rows, rows, rep, {"frame": rows, "feature": rows}),
        out_shardings=({"frame": rows, "feature": rows}, bpp_sh),
    )
    def fn(params, frame, mask, qp, dpb):
        out = model.apply({"params": params}, frame, qp, dpb,
                          after_i=False, mask=mask, train=False)
        return out["dpb"], out["bpp"]

    return fn


def shard_rows(mesh: Mesh, tree, axis: str = "data", batch_axis: str = None):
    """Device-put NHWC arrays with H-axis (and optional B-axis) sharding."""
    sh = row_sharding(mesh, axis, batch_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
