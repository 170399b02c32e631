"""Checkpointing: orbax for train states, npz for inducing-point arrays.

Parity: ``/root/reference/src/utils.py:20-75`` (flax ``checkpoints`` +
raw ``.npy``). TPU-first: orbax — sharding-aware, async-capable, and the
supported path on current JAX (flax's legacy checkpointing is deprecated).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# open managers for async saves, keyed by directory — kept alive so the
# background write can overlap the next training epochs
_async_managers: dict = {}


def _overwrite_save(mgr: "ocp.CheckpointManager", step: int, payload) -> None:
    """Save ``step``, replacing an existing checkpoint for it (re-running a
    phase must not crash with StepAlreadyExistsError — ``force=True`` only
    bypasses the save-interval policy, not existing steps)."""
    if step in (mgr.all_steps() or []):
        mgr.delete(step)
    mgr.save(step, args=ocp.args.StandardSave(payload), force=True)


def save_train_state(state: Any, ckpt_dir: str, step: int,
                     wait: bool = True) -> None:
    """Save params/batch_stats/opt_state/step under ``ckpt_dir/<step>``.

    ``wait=False`` saves asynchronously (orbax background thread); call
    ``finalize_checkpoints()`` before process exit or reading the ckpt.
    """
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if wait:
        with ocp.CheckpointManager(path) as mgr:
            _overwrite_save(mgr, step, payload)
            mgr.wait_until_finished()
    else:
        mgr = _async_managers.get(path)
        if mgr is None:
            mgr = ocp.CheckpointManager(
                path, options=ocp.CheckpointManagerOptions(
                    enable_async_checkpointing=True))
            _async_managers[path] = mgr
        _overwrite_save(mgr, step, payload)
    print(f"[checkpoint] saved train state at step {step} in {path}"
          + ("" if wait else " (async)"))


def finalize_checkpoints() -> None:
    """Block until all async saves land and release their managers."""
    for path, mgr in list(_async_managers.items()):
        mgr.wait_until_finished()
        mgr.close()
        del _async_managers[path]


def load_train_state(state: Any, ckpt_dir: str,
                     step: Optional[int] = None) -> Any:
    """Restore into the template ``state`` (latest step by default).

    The restore target is built from the CHECKPOINT's own metadata, with
    every leaf placed on the current default device — so a state saved on
    the TPU restores on CPU (and vice versa) without orbax trying to
    resurrect the saving platform's sharding ("Device TPU v5 lite0 was not
    found in jax.local_devices()"). If the on-disk optimizer-state tree
    doesn't match the template's (e.g. trained with a schedule, restored
    for eval with a plain optimizer), the restore keeps
    params/batch_stats/step only — consumers that never train again don't
    need the optimizer state.
    """
    path = os.path.abspath(ckpt_dir)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def abstract(x):
        x = np.asarray(x) if not hasattr(x, "dtype") else x
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    with ocp.CheckpointManager(
            path, item_handlers=ocp.StandardCheckpointHandler()) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        template = jax.tree.map(abstract, {
            "params": state.params,
            "batch_stats": dict(state.batch_stats) if state.batch_stats else {},
            "opt_state": state.opt_state,
            "step": state.step,
        })
        try:
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(template))
            opt_state = restored["opt_state"]
        except ValueError:
            # optimizer trees differ: restore against the checkpoint's own
            # metadata (still onto the local device), keep model state only
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding),
                mgr.item_metadata(step))
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(template))
            opt_state = state.opt_state
            print("[checkpoint] optimizer-state tree mismatch — restored "
                  "params/batch_stats/step only")
    print(f"[checkpoint] restored train state from {path} step {step}")
    new_state = state.replace(
        params=restored["params"],
        opt_state=opt_state,
        step=restored["step"],
    )
    if restored["batch_stats"]:
        new_state = new_state.replace(batch_stats=restored["batch_stats"])
    return new_state


def save_array(array, ckpt_dir: str, name: str, step: int) -> str:
    """Save an array checkpoint (inducing points) as npz.

    Parity: ``save_array_checkpoint`` (``/root/reference/src/utils.py:20-29``).
    """
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"{name}_{step}.npz")
    np.savez(fn, array=np.asarray(array))
    print(f"[checkpoint] saved array '{name}' step {step} -> {fn}")
    return fn


def save_run_meta(ckpt_dir: str, name: str, meta: dict) -> str:
    """Persist small run metadata (e.g. the pipeline's grid-searched alpha)
    as JSON next to the array checkpoints, so evaluation never needs a
    hand-picked alpha."""
    import json
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"{name}_meta.json")
    with open(fn, "w") as f:
        json.dump(meta, f)
    print(f"[checkpoint] saved run meta -> {fn}: {meta}")
    return fn


def load_run_meta(ckpt_dir: str, name: str) -> Optional[dict]:
    import json
    fn = os.path.join(os.path.abspath(ckpt_dir), f"{name}_meta.json")
    if not os.path.exists(fn):
        return None
    with open(fn) as f:
        return json.load(f)


def load_array(ckpt_dir: str, name: str, step: int):
    fn = os.path.join(os.path.abspath(ckpt_dir), f"{name}_{step}.npz")
    if not os.path.exists(fn):
        raise FileNotFoundError(fn)
    arr = np.load(fn)["array"]
    print(f"[checkpoint] loaded array '{name}' from {fn}")
    return jax.device_put(arr)
