"""Packed geometry table shared by the intersection kernels.

One row per geom, 17 f32 columns:

  cols 0..11 : transformed prims -> world->object 3x4 row-major
               legacy planes     -> the 4 corners (x,y,z interleaved)
  cols 12..14: velocity (prims; zero for planes)
  col  15    : kind (0 sphere, 1 cube, 2 rect, 3 plane)
  col  16    : original geom id (material-table index)

The id column makes row order irrelevant, which is what lets the LBVH
reorder rows by Morton code while reporting reference load-order ids.
"""

from __future__ import annotations

import jax.numpy as jnp

from ray_tracying_tpu.scene.types import Scene

KIND_PLANE = 3
GEOM_COLS = 17


def pack_geom_table(scene: Scene) -> jnp.ndarray:
    """(G, 17) table in load order (prims then planes)."""
    rows = []
    if scene.n_prims:
        p = scene.n_prims
        rows.append(
            jnp.concatenate(
                [
                    scene.prims.w2o.reshape(p, 12),
                    scene.prims.velocity,
                    scene.prims.kind[:, None].astype(jnp.float32),
                    jnp.arange(p, dtype=jnp.float32)[:, None],
                ],
                axis=1,
            )
        )
    if scene.n_planes:
        q = scene.n_planes
        rows.append(
            jnp.concatenate(
                [
                    scene.planes.corners.reshape(q, 12),
                    jnp.zeros((q, 3)),
                    jnp.full((q, 1), float(KIND_PLANE)),
                    (scene.n_prims + jnp.arange(q, dtype=jnp.float32))[:, None],
                ],
                axis=1,
            )
        )
    if not rows:
        return jnp.zeros((1, GEOM_COLS), jnp.float32)
    return jnp.concatenate(rows, axis=0)
