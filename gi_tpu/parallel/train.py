"""Differentiable-rendering optimization loop with checkpoint/resume.

The reference has no training (and no checkpointing of any kind, SURVEY.md
§5); this is the TPU framework's inverse-rendering driver: optimize the
differentiable scene parameters (materials, light color, camera eye —
parallel/mesh.diff_params) against a target image with Adam, rays sharded
over the device mesh, saving orbax checkpoints so a preempted job resumes
at the last step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..scene.types import Scene
from ..utils.config import RenderConfig
from .mesh import apply_params, diff_params, train_step_sharded


@dataclass
class FitResult:
    scene: Scene
    losses: list
    start_step: int          # step resumed from (0 = fresh run)
    steps_run: int


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"step_{step:08d}")


def latest_step(ckpt_dir: str) -> int | None:
    """Highest checkpointed step in ckpt_dir, or None."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_ckpt_dir(ckpt_dir, step),
                   {"params": params, "opt_state": opt_state}, force=True)


def restore_checkpoint(ckpt_dir: str, step: int, params, opt_state):
    """Restore (params, opt_state) using the given pytrees as templates."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            _ckpt_dir(ckpt_dir, step),
            {"params": params, "opt_state": opt_state})
    return restored["params"], restored["opt_state"]


def fit(scene: Scene, target: jnp.ndarray, cfg: RenderConfig, mesh,
        width: int, height: int, steps: int = 100, lr: float = 2e-2,
        ckpt_dir: str | None = None, ckpt_every: int = 50,
        batch: int | None = None, seed: int = 0,
        progress=None) -> FitResult:
    """Optimize diff_params(scene) so renders match `target` ([H*W,3] or
    [H,W,3]). Returns the scene with optimized parameters folded back in.

    Resumes from the newest checkpoint under ckpt_dir when one exists.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_pix = width * height
    n_dev = mesh.devices.size
    if batch is None:
        batch = n_pix
    batch = max(n_dev, (batch // n_dev) * n_dev)  # divisible by mesh size

    # replicate scene + target over the mesh (P6: shared read-only scene)
    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    target = jax.device_put(jnp.asarray(target).reshape(-1, 3), repl)

    params = diff_params(scene)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    start = 0
    if ckpt_dir:
        last = latest_step(ckpt_dir)
        if last is not None:
            params, opt_state = restore_checkpoint(
                ckpt_dir, last, params, opt_state)
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)
            start = last

    key = jax.random.PRNGKey(seed)
    key = jax.random.fold_in(key, start)

    import functools
    step_fn = jax.jit(functools.partial(
        train_step_sharded, cfg=cfg, width=width, height=height, mesh=mesh))

    losses = []
    cur = apply_params(scene, params)
    for i in range(start, start + steps):
        key, k_step, k_pix = jax.random.split(key, 3)
        if batch == n_pix:
            idx = jnp.arange(n_pix, dtype=jnp.int32)
        else:
            idx = jax.random.randint(k_pix, (batch,), 0, n_pix,
                                     dtype=jnp.int32)
        loss, grads = step_fn(cur, key=k_step, pixel_idx=idx,
                              target=target[idx])
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        cur = apply_params(scene, params)
        losses.append(float(loss))
        if progress is not None:
            progress(i, float(loss))
        if ckpt_dir and ((i + 1) % ckpt_every == 0 or i + 1 == start + steps):
            save_checkpoint(ckpt_dir, i + 1, params, opt_state)

    return FitResult(scene=cur, losses=losses, start_step=start,
                     steps_run=steps)
