"""Pytree checkpointing (orbax) + auto-resume.

Replaces Lightning ModelCheckpoint/resume (``/root/reference/main.py:
594-634, 721-739``): train state (params, opt, EMA, step) saved as orbax
checkpoints under ``<logdir>/checkpoints/step_N`` with a ``last`` pointer;
``find_resume`` scans a log root for the newest run of the same name.

Sharded (FSDP/TP) states: ``save_train_state`` calls ``jax.device_get``,
which gathers every shard to host (all shards are addressable in this
single-process deployment), so the on-disk artifact is always a full,
layout-free pytree. Restore is the inverse: ``restore_train_state`` lands
host arrays into the caller's template, and the caller re-applies its
sharding (``fsdp.shard_state`` / ``pmesh.replicate``) — main.py's resume
order, round-trip-tested in ``tests/test_fsdp.py`` and across a real
process boundary in ``tests/test_cli.py::test_main_train_fsdp``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    _ckptr().save(os.path.abspath(path), params, force=True)


def restore_params(path: str, like: Any) -> Any:
    restored = _ckptr().restore(os.path.abspath(path), item=like)
    return restored


def restore_raw(path: str) -> Any:
    """Restore without a target structure (nested dicts of arrays). Used to
    read a train-state checkpoint when only parts of it are wanted (e.g.
    the sampling CLI extracting ema_params without building an optimizer)."""
    return _ckptr().restore(os.path.abspath(path))


def save_train_state(ckpt_dir: str, step: int, state: Any,
                     keep: int = 3, tag: str = "",
                     meta: Optional[dict] = None) -> str:
    """Save under ckpt_dir/step_N and update the ``last`` pointer.

    tag: save under ckpt_dir/<tag> instead (e.g. 'best' for the
    monitor-selected checkpoint; not pruned, doesn't move ``last``).
    meta: extra JSON fields for the pointer file (e.g. the train loader's
    epoch/batch cursor for deterministic mid-epoch resume)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    if tag:
        path = os.path.join(ckpt_dir, tag)
        _ckptr().save(os.path.abspath(path), jax.device_get(state),
                      force=True)
        with open(os.path.join(ckpt_dir, f"{tag}.json"), "w") as f:
            json.dump({"step": step, "path": path, **(meta or {})}, f)
        return path
    path = os.path.join(ckpt_dir, f"step_{step}")
    state_host = jax.device_get(state)
    _ckptr().save(os.path.abspath(path), state_host, force=True)
    with open(os.path.join(ckpt_dir, "last.json"), "w") as f:
        json.dump({"step": step, "path": path, **(meta or {})}, f)
    # prune old checkpoints
    steps = sorted(
        int(m.group(1)) for d in os.listdir(ckpt_dir)
        if (m := re.match(r"step_(\d+)$", d)))
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)
    return path


def read_last_meta(ckpt_dir: str) -> dict:
    """The ``last`` pointer's JSON (step, path, and any extra meta such as
    the loader epoch/cursor saved alongside)."""
    with open(os.path.join(ckpt_dir, "last.json")) as f:
        return json.load(f)


def restore_train_state(ckpt_dir: str, like: Any,
                        step: Optional[int] = None) -> tuple[Any, int]:
    if step is None:
        with open(os.path.join(ckpt_dir, "last.json")) as f:
            meta = json.load(f)
        step = meta["step"]
    path = os.path.join(ckpt_dir, f"step_{step}")
    try:
        return _ckptr().restore(os.path.abspath(path), item=like), step
    except ValueError:
        # legacy layout: ema_params was a full params tree (shadowing the
        # frozen first stage and cond stage too); newer states shadow only
        # the denoiser wrapper. Restore with a full-tree template, then
        # slice the denoiser subtree out.
        if not (hasattr(like, "ema_params") and hasattr(like, "params")
                and "model" in like.params.get("params", {})):
            raise
        legacy_like = like.replace(ema_params=like.params)
        restored = _ckptr().restore(os.path.abspath(path), item=legacy_like)
        return restored.replace(
            ema_params=restored.ema_params["params"]["model"]), step


def find_resume(log_root: str, name: str) -> Optional[str]:
    """Newest experiment dir matching ``name`` that has a checkpoint
    (the auto-resume scan of ``main.py:594-612``)."""
    if not os.path.isdir(log_root):
        return None
    candidates = []
    for d in os.listdir(log_root):
        if name in d:
            ckpt_dir = os.path.join(log_root, d, "checkpoints")
            if os.path.exists(os.path.join(ckpt_dir, "last.json")):
                candidates.append(os.path.join(log_root, d))
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
