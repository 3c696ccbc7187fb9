"""Numerical forensics — the TPU-native DebugProbe.

Rebuild of the reference's DebugProbe (trainer_seg_video_model.py:79-379):
NaN/inf guards after every stage, param/grad-norm stats, bad-batch dumps.
The torch version hooks conv modules; in JAX the equivalents are:

  * ``finite_check`` — an inline guard usable under jit
    (jax.debug + checkify-free: returns the array, optionally halting via
    error callback on the host), mirroring _finite_check
    (src/refactor/seg_video_model.py:152-156).
  * ``tree_norm`` / ``tree_stats`` — global/param-wise norms of params or
    grads (DebugProbe.model_grad_norm, :290-310).
  * ``dump_bad_batch`` — serialize the offending batch + metrics to .npz
    (DebugProbe.save_bad_batch, :312-340).
  * ``wrap_step_with_guard`` — wraps a train step: when any returned metric
    goes non-finite, dumps the batch and raises.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def finite_check(x: jnp.ndarray, tag: str, enabled: bool = True) -> jnp.ndarray:
    """Print a host-side warning when ``x`` contains non-finite values.
    Usable inside jit (jax.debug.print fires via host callback)."""
    if not enabled:
        return x
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print(
            "[NaNGuard] non-finite activations after " + tag +
            " (min={mn}, max={mx})",
            mn=jnp.nanmin(x), mx=jnp.nanmax(x)),
        lambda: None)
    return x


def tree_norm(tree) -> float:
    """Global L2 norm over a pytree (grad/param norm logging)."""
    sq = sum(float(jnp.sum(jnp.square(x.astype(jnp.float32))))
             for x in jax.tree_util.tree_leaves(tree))
    return float(np.sqrt(sq))


def tree_stats(tree, top_k: int = 10) -> Dict[str, Dict[str, float]]:
    """Per-leaf {norm, max_abs, has_nonfinite}, sorted by norm."""
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(tree) if isinstance(tree, dict) else {
        (str(i),): v for i, v in enumerate(jax.tree_util.tree_leaves(tree))}
    stats = {}
    for path, leaf in flat.items():
        arr = np.asarray(leaf, np.float32)
        stats["/".join(map(str, path))] = {
            "norm": float(np.linalg.norm(arr)),
            "max_abs": float(np.abs(arr).max()) if arr.size else 0.0,
            "nonfinite": int((~np.isfinite(arr)).sum()),
        }
    return dict(sorted(stats.items(), key=lambda kv: -kv[1]["norm"])[:top_k])


def dump_bad_batch(save_dir: str, batch: Dict, metrics: Dict,
                   step: int) -> str:
    """Serialize the failing batch + scalar metrics for offline repro."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"bad_batch_step{step}.npz")
    arrays = {k: np.asarray(v) for k, v in batch.items()}
    arrays.update({f"metric_{k}": np.asarray(float(v))
                   for k, v in metrics.items()
                   if np.ndim(v) == 0})
    np.savez_compressed(path, **arrays)
    return path


class DebugProbe:
    """Host-side training guard: detects non-finite losses, dumps batches.

    Unlike the torch version's conv hooks, per-stage guards live in the
    models (finite_check); this probe watches the step outputs.
    """

    def __init__(self, enabled: bool = False, save_dir: str = "./out/debug",
                 log_every: int = 1, save_bad_batch: bool = True):
        self.enabled = enabled
        self.save_dir = save_dir
        self.log_every = log_every
        self.save_bad = save_bad_batch
        self.step = 0

    def after_step(self, batch: Dict, metrics: Dict,
                   grads=None) -> bool:
        """Returns True when everything is finite. On failure, dumps the
        batch (if configured) and returns False."""
        if not self.enabled:
            return True
        self.step += 1
        bad = [k for k, v in metrics.items()
               if np.ndim(v) == 0 and not np.isfinite(float(v))]
        if bad:
            print(f"[DebugProbe] non-finite metrics at step {self.step}: {bad}")
            if grads is not None:
                for name, st in tree_stats(grads, top_k=5).items():
                    print(f"[DebugProbe]   grad {name}: {st}")
            if self.save_bad:
                path = dump_bad_batch(self.save_dir, batch, metrics, self.step)
                print(f"[DebugProbe] batch dumped to {path}")
            return False
        if self.step % self.log_every == 0 and grads is not None:
            print(f"[DebugProbe] step {self.step} grad_norm="
                  f"{tree_norm(grads):.3e}")
        return True


def layer_forensics(model, variables, *args, top_k: int = 20,
                    **kwargs) -> Dict[str, Dict[str, float]]:
    """Per-module activation forensics — the JAX equivalent of the torch
    DebugProbe's conv forward hooks (trainer_seg_video_model.py:127-288).

    Runs one ``apply`` with ``capture_intermediates`` and returns
    {module_path: {shape, dtype, norm, max_abs, nonfinite}} for every
    module output, sorted by norm. Where torch logs shapes/contiguity per
    conv call, XLA owns layout — so the useful forensics are numeric: which
    stage first went non-finite, which stage's magnitude exploded."""
    _, state = model.apply(variables, *args, **kwargs,
                           capture_intermediates=True,
                           mutable=["intermediates"])
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(state["intermediates"])
    stats = {}
    for path, leaf in flat.items():
        # leaf is a tuple of call outputs; take the first array-like of each
        for out in (leaf if isinstance(leaf, tuple) else (leaf,)):
            if not hasattr(out, "shape"):
                continue
            arr = np.asarray(out, np.float32)
            stats["/".join(map(str, path))] = {
                "shape": tuple(arr.shape),
                "dtype": str(np.asarray(out).dtype),
                "norm": float(np.linalg.norm(arr)),
                "max_abs": float(np.abs(arr).max()) if arr.size else 0.0,
                "nonfinite": int((~np.isfinite(arr)).sum()),
            }
            break
    return dict(sorted(stats.items(), key=lambda kv: -kv[1]["norm"])[:top_k])


def cpu_cross_check(fn, *args, atol: float = 1e-4) -> Dict[str, float]:
    """One-step CPU cross-check — the torch DebugProbe's optional CPU
    re-run (trainer_seg_video_model.py:341-369): run ``fn`` on the default
    backend AND on the host CPU backend, return per-output max |diff|.

    Use to distinguish genuine numerics bugs from accelerator-specific
    behavior (e.g. bf16 matmul accumulation). Raises RuntimeError when no
    CPU backend coexists in this process (the axon-tunneled image keeps
    one)."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError as e:
        raise RuntimeError(f"no CPU backend for cross-check: {e}")

    out_default = fn(*args)
    cpu_args = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, cpu) if hasattr(x, "shape") else x, args)
    with jax.default_device(cpu):
        out_cpu = fn(*cpu_args)

    diffs = {}
    flat_d, _ = jax.tree_util.tree_flatten_with_path(out_default)
    flat_c = jax.tree_util.tree_leaves(out_cpu)
    for (path, a), b in zip(flat_d, flat_c):
        name = jax.tree_util.keystr(path)
        d = float(np.max(np.abs(np.asarray(a, np.float32)
                                - np.asarray(b, np.float32))))
        diffs[name] = d
        if d > atol:
            print(f"[cpu_cross_check] {name}: max|diff|={d:.3e} > {atol}")
    return diffs
