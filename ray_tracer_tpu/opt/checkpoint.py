"""Checkpoint / resume for optimized scene parameters.

New capability with no reference counterpart (the reference's only
artifact is the output image, SURVEY.md §5).  Orbax is the primary
backend (async-safe, multi-host aware); a plain-npz fallback keeps the
feature alive where orbax is unavailable.

Saves are ATOMIC: the payload is written into a `<tag>.tmp` staging
directory and os.replace'd into place only after meta.json lands, so a
crash/preemption mid-save (the exact event this module exists to
survive) can never leave a step_N directory that latest_step() selects
but restore_checkpoint() cannot open.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _paths(directory: str, step_num: Optional[int]):
    tag = f"step_{step_num}" if step_num is not None else "latest"
    return os.path.join(directory, tag)


def save_checkpoint(directory: str, params: Any, opt_state: Any = None,
                    step_num: Optional[int] = None) -> str:
    path = _paths(directory, step_num)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(tmp, "orbax"), state, force=True)
        backend = "orbax"
    except Exception:
        # npz fallback: params and opt_state leaves are PREFIX-NAMESPACED
        # so a restore template that omits opt_state cannot misalign
        # (dict flatten order would otherwise hand opt-state leaves back
        # as params, silently).
        arrays = {
            f"p_{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(params))
        }
        if opt_state is not None:
            arrays.update({
                f"o_{i}": np.asarray(x)
                for i, x in enumerate(jax.tree.leaves(opt_state))
            })
        np.savez(os.path.join(tmp, "state.npz"), **arrays)
        backend = "npz"
    with open(os.path.join(tmp, "meta.json"), "w") as fh:
        json.dump({"backend": backend, "step": step_num}, fh)
    # the commit point: a reader either sees the complete checkpoint or
    # the previous one, never a partial directory
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def _complete(directory: str, name: str) -> bool:
    return os.path.exists(os.path.join(directory, name, "meta.json"))


def latest_step(directory: str) -> Optional[int]:
    """Highest COMPLETE step number checkpointed under `directory`, or
    None.  Incomplete directories (no meta.json — a pre-atomic-save
    interruption, or a foreign dir) are skipped so resume falls back to
    the newest intact checkpoint instead of crashing forever."""
    steps = []
    try:
        for name in os.listdir(directory):
            if name.startswith("step_") and not name.endswith(".tmp"):
                try:
                    n = int(name[5:])
                except ValueError:
                    continue
                if _complete(directory, name):
                    steps.append(n)
    except FileNotFoundError:
        return None
    return max(steps) if steps else None


def restore_checkpoint(directory: str, like: Any,
                       step_num: Optional[int] = None) -> Tuple[Any, Optional[Any]]:
    """Restore (params, opt_state) with `like` = {'params': ..., 'opt_state': ...}
    template pytree (opt_state may be None in the template).  With no
    step_num, restores the 'latest' tag if present, else the highest
    step_N directory."""
    if step_num is None and not os.path.exists(
        os.path.join(_paths(directory, None), "meta.json")
    ):
        step_num = latest_step(directory)
    path = _paths(directory, step_num)
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    template = {"params": like["params"]}
    if like.get("opt_state") is not None:
        template["opt_state"] = like["opt_state"]
    if meta["backend"] == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        try:
            state = ckptr.restore(os.path.join(path, "orbax"), item=template)
        except Exception:
            # A template that omits opt_state structurally mismatches a
            # checkpoint saved WITH one (orbax restores the full tree
            # against `item`).  Restore raw and rebuild params from its
            # leaves in flatten order — the same order-based contract
            # the npz branch uses.
            raw = ckptr.restore(os.path.join(path, "orbax"))
            p_flat, p_def = jax.tree.flatten(template["params"])
            raw_p = jax.tree.leaves(raw["params"])
            if len(raw_p) != len(p_flat):
                raise
            state = {"params": jax.tree.unflatten(p_def, raw_p)}
    else:
        data = np.load(os.path.join(path, "state.npz"))
        p_flat, p_def = jax.tree.flatten(template["params"])
        params = jax.tree.unflatten(
            p_def, [data[f"p_{i}"] for i in range(len(p_flat))]
        )
        state = {"params": params}
        if "opt_state" in template:
            if "o_0" not in data:
                raise ValueError(
                    "checkpoint was saved without opt_state but the restore "
                    "template requests it"
                )
            o_flat, o_def = jax.tree.flatten(template["opt_state"])
            state["opt_state"] = jax.tree.unflatten(
                o_def, [data[f"o_{i}"] for i in range(len(o_flat))]
            )
    return state["params"], state.get("opt_state")
