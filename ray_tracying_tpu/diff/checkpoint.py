"""Checkpoint / resume for inverse-rendering optimization runs.

The reference renders one-shot and keeps no state (SURVEY.md §5:
checkpoint/resume = none); the differentiable path adds long-running
parameter fitting, so fitted parameters + optimizer state checkpoint via
orbax with automatic resume (diff/optimize.fit(checkpoint_dir=...)).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _manager(directory: str, keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save(directory: str, step: int, theta: Any, opt_state: Any,
         keep: int = 3) -> None:
    """Write {theta, opt_state} at `step` (retains the newest `keep`)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, keep)
    mgr.save(
        step,
        args=ocp.args.Composite(
            theta=ocp.args.StandardSave(theta),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def restore(
    directory: str, theta_like: Any, opt_state_like: Any
) -> Optional[Tuple[int, Any, Any]]:
    """Load the latest (step, theta, opt_state), or None if no checkpoint.

    theta_like / opt_state_like supply the pytree structure + dtypes
    (orbax StandardRestore targets)."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    out = mgr.restore(
        step,
        args=ocp.args.Composite(
            theta=ocp.args.StandardRestore(theta_like),
            opt_state=ocp.args.StandardRestore(opt_state_like),
        ),
    )
    mgr.close()
    theta = jax.tree.map(lambda x: x, out["theta"])
    opt_state = jax.tree.map(lambda x: x, out["opt_state"])
    return int(step), theta, opt_state
