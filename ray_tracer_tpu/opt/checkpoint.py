"""Checkpoint / resume for optimized scene parameters.

New capability with no reference counterpart (the reference's only
artifact is the output image, SURVEY.md §5).  Orbax is the primary
backend (async-safe, multi-host aware); a plain-npz fallback keeps the
feature alive where orbax is unavailable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _paths(directory: str, step_num: Optional[int]):
    tag = f"step_{step_num}" if step_num is not None else "latest"
    return os.path.join(directory, tag)


def save_checkpoint(directory: str, params: Any, opt_state: Any = None,
                    step_num: Optional[int] = None) -> str:
    path = _paths(directory, step_num)
    os.makedirs(path, exist_ok=True)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "orbax"), state, force=True)
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
        np.savez(os.path.join(path, "state.npz"), **arrays)
        backend = "npz"
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"backend": backend, "step": step_num}, fh)
    return path


def latest_step(directory: str) -> Optional[int]:
    """Highest step number checkpointed under `directory`, or None."""
    steps = []
    try:
        for name in os.listdir(directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name[5:]))
                except ValueError:
                    pass
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
        state = ckptr.restore(os.path.join(path, "orbax"), item=template)
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
