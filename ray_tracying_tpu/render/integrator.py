"""Iterative wavefront Whitted integrator.

The reference's recursive `Trace` (Code/raytracer.cpp:280-351) is a binary
recursion (reflection + refraction children) to depth 11.  On TPU, the
recursion is flattened into 11 bounce passes over a fixed-capacity ray
queue:

  - each queue slot carries (origin, direction, time, throughput, dest)
    where dest is the primary-sample index radiance accumulates into and
    throughput is the product of the scalar branch weights
    (reflectivity / transparency) along the path;
  - at each level: batched closest hit, background accumulation for
    misses (0.1 gray, weighted by throughput), local Blinn-Phong + shadow
    shading weighted by throughput * max(0, 1 - refl - trans)
    (Code/raytracer.cpp:346-350), then up to two continuation rays per
    slot compacted (cumsum scatter) into the next queue;
  - children spawned at the depth-10 level are never traced: at depth 11
    the reference returns black immediately (raytracer.cpp:290-292), so
    their contribution is identically zero.

Static scene facts (has_reflection / has_refraction / has_glossy) prune
whole phases out of the compiled program.

Queue capacity: R rays enter level 0.  When a scene can branch two ways
(some material has reflectivity > 0 AND some material transparency > 0)
the queue may grow; capacity is R * queue_mult with overflow dropped in
compaction order (a documented deviation that only triggers on
mirror+glass scenes deeper than log2(queue_mult) simultaneous branchings).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.core.sampling import uniform_in_unit_sphere
from ray_tracying_tpu.core.vecmath import dot, normalize, reflect, refract
from ray_tracying_tpu.render.intersect import closest_hit
from ray_tracying_tpu.render.shade import shade
from ray_tracying_tpu.scene.types import Scene


class _Queue(NamedTuple):
    o: jnp.ndarray      # (Cap, 3)
    d: jnp.ndarray      # (Cap, 3)
    time: jnp.ndarray   # (Cap,)
    tp: jnp.ndarray     # (Cap,) scalar throughput
    dest: jnp.ndarray   # (Cap,) int32 primary-sample index
    active: jnp.ndarray # (Cap,) bool


def _compact(cands: _Queue, keep: jnp.ndarray, capacity: int) -> _Queue:
    """Stream-compact candidate slots where keep is True into a queue of
    `capacity` slots (cumsum scatter; overflow slots are dropped)."""
    idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, idx, capacity)  # out-of-range -> dropped
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)

    def scat(arr, fill=0):
        out = jnp.full((capacity,) + arr.shape[1:], fill, arr.dtype)
        return out.at[slot].set(arr, mode="drop")

    return _Queue(
        o=scat(cands.o),
        d=scat(cands.d),
        time=scat(cands.time),
        tp=scat(cands.tp),
        dest=scat(cands.dest),
        active=jnp.arange(capacity) < count,
    )


def _cat(queues) -> _Queue:
    return _Queue(*(jnp.concatenate(f, axis=0) for f in zip(*queues)))


def trace_wavefront(
    scene: Scene,
    origins: jnp.ndarray,     # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    times: jnp.ndarray,       # (R,)
    key: jax.Array,
    light_samples: int,
    queue_mult: int = 2,
) -> jnp.ndarray:
    """Trace R primary rays to completion.  Returns (R, 3) radiance."""
    r = origins.shape[0]
    mats = scene.materials
    bg = jnp.asarray(C.BACKGROUND_RGB, jnp.float32)

    branching = 2 if (scene.has_reflection and scene.has_refraction) else 1
    capacity = r * queue_mult if branching == 2 else r

    accum = jnp.zeros((r, 3), jnp.float32)
    q = _Queue(
        o=origins,
        d=directions,
        time=times,
        tp=jnp.ones(r, jnp.float32),
        dest=jnp.arange(r, dtype=jnp.int32),
        active=jnp.ones(r, bool),
    )
    if capacity > r:
        pad = capacity - r
        q = _Queue(
            o=jnp.concatenate([q.o, jnp.zeros((pad, 3))]),
            d=jnp.concatenate([q.d, jnp.zeros((pad, 3))]),
            time=jnp.concatenate([q.time, jnp.zeros(pad)]),
            tp=jnp.concatenate([q.tp, jnp.zeros(pad)]),
            dest=jnp.concatenate([q.dest, jnp.zeros(pad, jnp.int32)]),
            active=jnp.concatenate([q.active, jnp.zeros(pad, bool)]),
        )

    if scene.n_geoms == 0:
        # Nothing can be hit: every ray takes the background path.
        return jnp.broadcast_to(bg, (r, 3))

    spawn_children = scene.has_reflection or scene.has_refraction

    def level_body(carry, depth):
        """One Whitted bounce level.  Shape-invariant, so the 11 levels run
        under lax.scan and XLA compiles the body ONCE (the reference's
        recursion depth shows up as trip count, not program size)."""
        accum, q = carry
        k_level = jax.random.fold_in(key, depth)
        hit = closest_hit(scene, q.o, q.d, q.time)
        act = q.active & hit.valid
        missed = q.active & ~hit.valid

        # Background for misses (Code/raytracer.cpp:296-298).
        w_miss = jnp.where(missed, q.tp, 0.0)
        accum = accum.at[jnp.where(missed, q.dest, r)].add(
            w_miss[:, None] * bg, mode="drop"
        )

        # Local shading, weighted by max(0, 1 - refl - trans)
        # (Code/raytracer.cpp:346-350).
        local = shade(scene, hit, q.o, jax.random.fold_in(k_level, 0), light_samples)
        gid = jnp.clip(hit.geom_id, 0, max(scene.n_geoms - 1, 0))
        refl = mats.reflectivity[gid]
        trans = mats.transparency[gid]
        local_w = jnp.maximum(0.0, 1.0 - refl - trans)
        w_local = jnp.where(act, q.tp * local_w, 0.0)
        accum = accum.at[jnp.where(act, q.dest, r)].add(
            w_local[:, None] * jnp.where(act[:, None], local, 0.0), mode="drop"
        )

        if not spawn_children:
            return (accum, q), None

        children = []
        if scene.has_reflection:
            rdir = reflect(q.d, hit.normal)
            if scene.has_glossy:
                # Glossy fuzz: normalize(R + roughness * unit_sphere), rays
                # perturbed below the surface are absorbed
                # (Code/raytracer.cpp:312-327).
                rough = mats.roughness[gid]
                fuzz = uniform_in_unit_sphere(
                    jax.random.fold_in(k_level, 1), (capacity,)
                )
                pert = normalize(rdir + rough[:, None] * fuzz)
                pert = jnp.where(
                    (dot(pert, hit.normal) < 0.0)[:, None], 0.0, pert
                )
                rdir = jnp.where((rough > 0.0)[:, None], pert, rdir)
            ok_r = act & (refl > 0.0) & (dot(rdir, rdir) > C.EPS_GLOSSY_DIR2)
            children.append(
                (
                    _Queue(
                        o=hit.point + hit.normal * C.EPS_NORMAL_OFFSET,
                        d=rdir,
                        # Secondary rays carry time = 0 (Ray default,
                        # Code/shapes.hpp:28).
                        time=jnp.zeros(capacity),
                        tp=q.tp * refl,
                        dest=q.dest,
                        active=ok_r,
                    ),
                    ok_r,
                )
            )
        if scene.has_refraction:
            tdir, n_eff = refract(q.d, hit.normal, mats.ior[gid])
            ok_t = act & (trans > 0.0) & (dot(tdir, tdir) > C.EPS_REFRACT_DIR2)
            children.append(
                (
                    _Queue(
                        o=hit.point - n_eff * C.EPS_NORMAL_OFFSET,
                        d=tdir,
                        time=jnp.zeros(capacity),
                        tp=q.tp * trans,
                        dest=q.dest,
                        active=ok_t,
                    ),
                    ok_t,
                )
            )

        cand = _cat([c for c, _ in children]) if len(children) > 1 else children[0][0]
        keep = (
            jnp.concatenate([m for _, m in children])
            if len(children) > 1
            else children[0][1]
        )
        q = _compact(cand, keep, capacity)
        return (accum, q), None

    if not spawn_children:
        # Purely local scene: one level suffices (children would all be
        # inactive anyway).
        (accum, _), _ = level_body((accum, q), jnp.int32(0))
        return accum

    # 11 levels (depth 0..10); children spawned by the last iteration are
    # never consumed, which reproduces "depth > 10 -> black"
    # (Code/raytracer.cpp:290-292) since an untraced child contributes 0.
    (accum, _), _ = jax.lax.scan(
        level_body,
        (accum, q),
        jnp.arange(C.MAX_RECURSION_DEPTH + 1, dtype=jnp.int32),
    )
    return accum
