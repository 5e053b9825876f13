"""Optimizable-parameter plumbing for inverse rendering.

A parameter set is a flat dict mapping dotted paths into the Scene pytree
(e.g. "materials.diffuse", "lights.intensity", "camera.location") to
arrays.  `extract` pulls current values, `apply` returns a new Scene with
them swapped in — Scene is a frozen flax.struct pytree, so this is pure.

The reference has no trainable anything; this subsystem exists for the
BASELINE.json differentiable configs (pixel gradients -> material albedo /
roughness, light position/intensity, camera parameters).
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax.numpy as jnp

from ray_tracying_tpu.scene.types import Scene

# Paths that make sense to optimize (guards against typos).
SUPPORTED_PREFIXES = ("materials.", "lights.", "camera.", "prims.", "planes.", "tex_atlas")


def extract(scene: Scene, paths: Iterable[str]) -> Dict[str, jnp.ndarray]:
    out = {}
    for path in paths:
        node = scene
        for part in path.split("."):
            node = getattr(node, part)
        out[path] = node
    return out


def apply(scene: Scene, params: Dict[str, jnp.ndarray]) -> Scene:
    """Return a Scene with the given leaves replaced."""
    # Group by top-level field.
    by_top: Dict[str, Dict[str, jnp.ndarray]] = {}
    direct: Dict[str, jnp.ndarray] = {}
    for path, val in params.items():
        if not path.startswith(SUPPORTED_PREFIXES):
            raise KeyError(f"unsupported parameter path: {path}")
        if "." in path:
            top, rest = path.split(".", 1)
            by_top.setdefault(top, {})[rest] = val
        else:
            direct[path] = val
    updates = dict(direct)
    for top, subs in by_top.items():
        node = getattr(scene, top)
        updates[top] = node.replace(**subs)
    return scene.replace(**updates)
