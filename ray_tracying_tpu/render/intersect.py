"""Batched ray/scene intersection — the TPU replacement for the reference's
per-shape virtual dispatch (Code/shapes.cpp) and BVH recursion
(Code/acceleration.cpp).

Design: two-pass closest hit over SoA primitive tables.

  Pass 1 (`all_hit_t`): a dense (rays x geoms) matrix of hit distances,
  +inf on miss.  XLA fuses the whole transform+test chain into the min/
  argmin reduction, so the (R, G) intermediates never round-trip HBM at
  f32x3 width.  Distances use the reference's Euclidean-distance semantics
  (Code/shapes.cpp:251-253 etc.): for affine TRS transforms the world hit
  point is exactly origin + t_loc * dir, so euclidean_t == t_loc * |dir|,
  and all traced rays have unit |dir|.  Legacy planes use the parametric t
  (Code/shapes.cpp:458,481) — faithfully mixed semantics.

  Pass 2 (`closest_hit`): per-ray attribute reconstruction for the argmin
  winner only (point, normal, uv) — O(R) instead of O(R*G).

The brute-force pass-1 mirrors `-bvh` off (intersect_linear,
Code/acceleration.cpp:124-139); the BVH path produces the identical hit
set (SURVEY.md §2 quirk 15) and lives in accel/.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.core.gather import onehot_gather
from ray_tracying_tpu.core.transforms import apply_normal, apply_point, apply_vector
from ray_tracying_tpu.core.vecmath import (
    cross, dot, normalize, safe_arcsin, safe_sqrt,
)
from ray_tracying_tpu.scene.types import KIND_CUBE, KIND_RECT, KIND_SPHERE, Scene

# Python float, not jnp scalar: a module-level jnp constant would allocate
# on (and force init of) the default backend at import time.
_INF = float("inf")


import contextlib
import contextvars

_NO_PALLAS = contextvars.ContextVar("rtt_no_pallas", default=False)


@contextlib.contextmanager
def pallas_disabled():
    """Context-locally route every trace through the jnp oracle path
    (identical semantics).  Preferred over mutating RTT_DISABLE_PALLAS:
    a context variable cannot leak into concurrent work in the same
    process (e.g. dryrun_multichip tracing for a CPU mesh while the
    interpret-mode suite runs — VERDICT r4 weak item 6)."""
    tok = _NO_PALLAS.set(True)
    try:
        yield
    finally:
        _NO_PALLAS.reset(tok)


def _use_pallas() -> bool:
    """Pallas kernels need a real TPU backend (the jnp path is the
    fallback and the semantics oracle on CPU).  RTT_PALLAS_INTERPRET=1
    forces the kernels on in interpreter mode for CPU testing."""
    if _NO_PALLAS.get():
        return False
    if os.environ.get("RTT_DISABLE_PALLAS"):
        return False
    if os.environ.get("RTT_PALLAS_INTERPRET") == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


class Hit(NamedTuple):
    """Closest-hit record for a batch of rays (all fields shape (R, ...))."""

    valid: jnp.ndarray    # (R,) bool
    geom_id: jnp.ndarray  # (R,) int32 into the global geom/material table
    t: jnp.ndarray        # (R,) reference-semantics hit distance
    point: jnp.ndarray    # (R, 3) world intersection point
    normal: jnp.ndarray   # (R, 3) world unit normal
    uv: jnp.ndarray       # (R, 2)


# ---------------------------------------------------------------------------
# Object-space primitive tests (t only).  o, d: (..., 3) object-space ray.
# Each returns t_loc with +inf for miss.
# ---------------------------------------------------------------------------

def _sphere_t(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Unit-sphere quadratic with the 0.001 t-min and near-then-far root
    choice (Code/shapes.cpp:219-232)."""
    a = dot(d, d)
    b = 2.0 * dot(o, d)
    c = dot(o, o) - 1.0
    disc = b * b - 4.0 * a * c
    sq = safe_sqrt(disc)  # grad-safe at the disc<=0 (miss) boundary
    # a == 0 only for degenerate (masked-out) rays; guard the division so
    # NaNs never enter the min/argmin reduction.
    a_safe = jnp.where(a > 0.0, a, 1.0)
    t1 = (-b - sq) / (2.0 * a_safe)
    t2 = (-b + sq) / (2.0 * a_safe)
    t = jnp.where(t1 > C.EPS_T_MIN, t1, jnp.where(t2 > C.EPS_T_MIN, t2, _INF))
    return jnp.where((disc >= 0.0) & (a > 0.0), t, _INF)


def _cube_slabs(o: jnp.ndarray, d: jnp.ndarray):
    """Shared slab computation for the unit cube [-0.5, 0.5]^3
    (Code/shapes.cpp:361-392).  Returns (t_near, t_far, entry_t_per_axis,
    entry_sign_per_axis, miss)."""
    parallel = jnp.abs(d) < C.EPS_PARALLEL
    outside_parallel = parallel & ((o < -0.5) | (o > 0.5))
    d_safe = jnp.where(parallel, 1.0, d)
    t1 = (-0.5 - o) / d_safe
    t2 = (0.5 - o) / d_safe
    t_entry = jnp.minimum(t1, t2)
    t_exit = jnp.maximum(t1, t2)
    # hit_sign: -1 when the min-plane is entered first (t1 < t2), else +1
    # (Code/shapes.cpp:385).
    entry_sign = jnp.where(t1 < t2, -1.0, 1.0)
    # Parallel axes never win the entry max nor tighten the exit min.
    t_entry = jnp.where(parallel, -_INF, t_entry)
    t_exit = jnp.where(parallel, _INF, t_exit)
    t_near = jnp.max(t_entry, axis=-1)
    t_far = jnp.min(t_exit, axis=-1)
    miss = jnp.any(outside_parallel, axis=-1) | (t_near > t_far) | (t_far < 0.0)
    return t_near, t_far, t_entry, entry_sign, miss


def _cube_t(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """NOTE: the cube uses t > 0, NOT the 0.001 epsilon
    (Code/shapes.cpp:392-393)."""
    t_near, t_far, _, _, miss = _cube_slabs(o, d)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    return jnp.where(miss | (t < 0.0), _INF, t)


def _rect_t(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Unit square on z=0, [-0.5, 0.5]^2 (Code/shapes.cpp:305-315)."""
    dz = d[..., 2]
    parallel = jnp.abs(dz) < C.EPS_PARALLEL
    t = -o[..., 2] / jnp.where(parallel, 1.0, dz)
    hx = o[..., 0] + t * d[..., 0]
    hy = o[..., 1] + t * d[..., 1]
    ok = (
        ~parallel
        & (t >= C.EPS_T_MIN)  # reference: t < 0.001 -> miss
        & (hx >= -0.5) & (hx <= 0.5) & (hy >= -0.5) & (hy <= 0.5)
    )
    return jnp.where(ok, t, _INF)


def _plane_geometry(corners: jnp.ndarray):
    """corners: (..., 4, 3) -> (unit_normal, degenerate_mask)."""
    e1 = corners[..., 1, :] - corners[..., 0, :]
    e2 = corners[..., 2, :] - corners[..., 0, :]
    n = cross(e1, e2)
    ln = jnp.sqrt(dot(n, n))
    degenerate = ln < C.EPS_PARALLEL
    n = n / jnp.where(degenerate, 1.0, ln)[..., None]
    return n, degenerate


def _point_in_tri(p, a, b, c, n):
    """Edge-sign test with the reference's -1e-6 tolerance
    (Code/shapes.cpp:24-40)."""
    s1 = dot(cross(b - a, p - a), n) >= C.EPS_PLANE_EDGE
    s2 = dot(cross(c - b, p - b), n) >= C.EPS_PLANE_EDGE
    s3 = dot(cross(a - c, p - c), n) >= C.EPS_PLANE_EDGE
    return s1 & s2 & s3


def _plane_t(corners: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Legacy quad: parametric t, two-triangle containment
    (Code/shapes.cpp:444-483).  corners broadcast against o/d."""
    n, degenerate = _plane_geometry(corners)
    denom = dot(n, d)
    parallel = jnp.abs(denom) < C.EPS_PARALLEL
    t = dot(corners[..., 0, :] - o, n) / jnp.where(parallel, 1.0, denom)
    p = o + t[..., None] * d
    c0, c1, c2, c3 = (corners[..., i, :] for i in range(4))
    inside = _point_in_tri(p, c1, c3, c2, n) | _point_in_tri(p, c0, c1, c2, n)
    ok = ~degenerate & ~parallel & (t >= 0.0) & inside
    return jnp.where(ok, t, _INF)


# ---------------------------------------------------------------------------
# Pass 1: dense hit-distance matrix + min reduction
# ---------------------------------------------------------------------------

def _prims_object_rays(scene: Scene, o, d, time):
    """Transform rays into every transformed-prim's object space.

    o, d: (R, 3); time: (R,).  Returns o_loc, d_loc: (R, P, 3).
    Motion blur shifts the ray origin by -velocity * time before the
    transform (Code/shapes.cpp:201-215); velocity is zero for non-spheres.
    """
    # (R, P, 3): shift origins per prim by motion.
    o_shift = o[:, None, :] - scene.prims.velocity[None, :, :] * time[:, None, None]
    w2o = scene.prims.w2o[None]  # (1, P, 3, 4)
    # Explicit mul-add, NOT einsum: a K=3 dot_general would hit the MXU in
    # bf16 and destroy intersection precision (see core/transforms.py note).
    o_loc = (
        w2o[..., :, 0] * o_shift[..., 0:1]
        + w2o[..., :, 1] * o_shift[..., 1:2]
        + w2o[..., :, 2] * o_shift[..., 2:3]
        + w2o[..., :, 3]
    )
    dr = d[:, None, :]
    d_loc = (
        w2o[..., :, 0] * dr[..., 0:1]
        + w2o[..., :, 1] * dr[..., 1:2]
        + w2o[..., :, 2] * dr[..., 2:3]
    )
    return o_loc, d_loc


def all_hit_t(scene: Scene, o, d, time) -> jnp.ndarray:
    """(R, G) matrix of reference-semantics hit distances, +inf = miss.

    Geom order is sphere/cube/rect table then planes, matching the
    reference's load order so that argmin tie-breaks agree with
    min_element / intersect_linear first-wins (Code/acceleration.cpp:112,133).
    """
    parts = []
    if scene.n_prims:
        o_loc, d_loc = _prims_object_rays(scene, o, d, time)
        kind = scene.prims.kind[None, :]
        t_s = _sphere_t(o_loc, d_loc)
        t_c = _cube_t(o_loc, d_loc)
        t_r = _rect_t(o_loc, d_loc)
        t_loc = jnp.where(
            kind == KIND_SPHERE, t_s, jnp.where(kind == KIND_CUBE, t_c, t_r)
        )
        # Euclidean world distance == t_loc * |d| (see module docstring).
        d_norm = jnp.sqrt(dot(d, d))[:, None]
        parts.append(t_loc * d_norm)
    if scene.n_planes:
        t_p = _plane_t(
            scene.planes.corners[None, :, :, :], o[:, None, :], d[:, None, :]
        )
        parts.append(t_p)
    if not parts:
        return jnp.full(o.shape[:1] + (0,), _INF)
    return jnp.concatenate(parts, axis=1)


def min_hit_t(
    scene: Scene, o, d, time, active=None, use_bvh=False, sort_rays=False
) -> jnp.ndarray:
    """Closest hit distance per ray, +inf on miss.  This is all shadow
    visibility needs (visible iff min_t > light_dist, Code/raytracer.cpp:233).

    active: optional (R,) bool mask letting the Pallas kernel skip
    dead ray blocks (inactive rays report miss).  use_bvh selects the
    LBVH traversal kernel (identical hit set; requires accel.with_bvh).
    sort_rays: coherence-sort incoherent wavefronts before the
    accelerated kernels (kernels/ray_sort.py); identical results."""
    if scene.n_geoms == 0:
        return jnp.full(o.shape[:1], _INF)
    if _use_pallas():
        from ray_tracying_tpu.kernels.closest_hit import (
            BRUTE_SMEM_MAX_GEOMS,
            closest_hit_tid,
        )

        if scene.n_geoms > BRUTE_SMEM_MAX_GEOMS and scene.chunk_geoms is not None:
            # Beyond-SMEM scene: chunk-culled streaming kernel (identical
            # hit set to brute — the AABB cull only removes provable
            # misses, kernels/chunk_stream.py).
            from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_chunks

            t, _ = closest_hit_tid_chunks(scene, o, d, time, active, sort_rays)
            return t
        if (
            use_bvh
            and scene.bvh_geoms is not None
            and scene.n_geoms <= BRUTE_SMEM_MAX_GEOMS
        ):
            from ray_tracying_tpu.kernels.bvh_traverse import closest_hit_tid_bvh

            t, _ = closest_hit_tid_bvh(scene, o, d, time, active, sort_rays)
            return t
        t, _ = closest_hit_tid(scene, o, d, time, active)
        return t
    # jnp fallback: linear brute force -- same hit set as the BVH
    # (Code/acceleration.cpp:124-151 dispatch; SURVEY.md §2 quirk 15).
    tm = all_hit_t(scene, o, d, time)
    return jnp.min(tm, axis=1)


def occluded(scene: Scene, o, d, maxt, active=None, use_bvh=False) -> jnp.ndarray:
    """(R,) bool: some geom blocks the ray at distance <= maxt.

    The complement of the reference's shadow visibility test
    `shadow_hit.t > light_dist` (Code/raytracer.cpp:233-235) — existence
    of ANY blocker, which lets the TPU kernel early-exit blocks whose
    lanes are all occluded instead of completing the closest-hit min.
    Shadow rays carry time = 0 (Ray default, Code/shapes.hpp:28)."""
    if scene.n_geoms == 0:
        return jnp.zeros(o.shape[:1], bool)
    if _use_pallas():
        from ray_tracying_tpu.kernels.closest_hit import (
            BRUTE_SMEM_MAX_GEOMS,
            occluded_tid,
        )

        if scene.n_geoms <= BRUTE_SMEM_MAX_GEOMS:
            # Always the brute any-hit kernel, even under -bvh: occlusion
            # needs existence (early exit), not the closest hit, and
            # shadow blocks lose the directional coherence BVH traversal
            # feeds on (every ray aims at a different jittered point).
            return occluded_tid(scene, o, d, maxt, active)
        if scene.chunk_geoms is not None:
            # Beyond-SMEM scene: chunk-culled any-hit with per-chunk AABB
            # pruning against the light distance and block early exit.
            from ray_tracying_tpu.kernels.chunk_stream import occluded_tid_chunks

            return occluded_tid_chunks(scene, o, d, maxt, active)
    t = min_hit_t(scene, o, d, jnp.zeros(o.shape[:1]), active, use_bvh)
    return t <= maxt


# ---------------------------------------------------------------------------
# Pass 2: attribute reconstruction for the winning geom
# ---------------------------------------------------------------------------

def _prim_attributes(scene: Scene, pid, o, d, time):
    """Reconstruct hit attributes for transformed prims.  pid: (R,) int32
    clipped to valid range; returns per-field (R, ...) plus recomputed
    validity-t (callers rely on the pass-1 winner, not this t).

    Per-ray primitive records are fetched with one-hot matmuls — a plain
    table[pid] row gather serializes on TPU and dominated this pass."""
    packed = jnp.concatenate(
        [
            scene.prims.w2o.reshape(-1, 12),
            scene.prims.o2w.reshape(-1, 12),
            scene.prims.velocity,
            scene.prims.kind[:, None].astype(jnp.float32),
        ],
        axis=1,
    )  # (P, 28)
    rec = onehot_gather(packed, pid)
    w2o = rec[:, 0:12].reshape(-1, 3, 4)
    o2w = rec[:, 12:24].reshape(-1, 3, 4)
    vel = rec[:, 24:27]
    kind = jnp.round(rec[:, 27]).astype(jnp.int32)

    o_shift = o - vel * time[:, None]
    o_loc = apply_point(w2o, o_shift)
    d_loc = apply_vector(w2o, d)

    # --- sphere ---
    t_sph = _sphere_t(o_loc, d_loc)
    t_sph = jnp.where(jnp.isfinite(t_sph), t_sph, 0.0)  # grad-safe miss
    p_sph = o_loc + t_sph[..., None] * d_loc
    n_sph = p_sph
    pi = jnp.float32(3.1415926535)
    u_sph = 0.5 + jnp.arctan2(p_sph[..., 2], p_sph[..., 0]) / (2.0 * pi)
    v_sph = 0.5 - safe_arcsin(jnp.clip(p_sph[..., 1], -1.0, 1.0)) / pi

    # --- cube ---
    t_near, t_far, t_entry, entry_sign, miss = _cube_slabs(o_loc, d_loc)
    t_cub = jnp.where(t_near > 0.0, t_near, t_far)
    t_cub = jnp.where(miss | (t_cub < 0.0) | ~jnp.isfinite(t_cub), 0.0, t_cub)
    p_cub = o_loc + t_cub[..., None] * d_loc
    # Normal comes from the ENTRY face even when the exit t is used
    # (the reference never updates hit_axis for t_far, Code/shapes.cpp:392-402).
    axis = jnp.argmax(t_entry, axis=-1)
    # Select-by-axis instead of take_along_axis (TPU gather avoidance).
    sign = jnp.where(
        axis == 0,
        entry_sign[..., 0],
        jnp.where(axis == 1, entry_sign[..., 1], entry_sign[..., 2]),
    )
    n_cub = jnp.zeros_like(p_cub).at[..., 0].set(
        jnp.where(axis == 0, sign, 0.0)
    )
    n_cub = n_cub.at[..., 1].set(jnp.where(axis == 1, sign, 0.0))
    n_cub = n_cub.at[..., 2].set(jnp.where(axis == 2, sign, 0.0))
    uc = p_cub[..., 0] + 0.5
    vc = p_cub[..., 1] + 0.5
    wc = p_cub[..., 2] + 0.5
    pos = sign > 0.0
    u_cub = jnp.where(
        axis == 0, jnp.where(pos, wc, 1.0 - wc),
        jnp.where(axis == 1, uc, jnp.where(pos, uc, 1.0 - uc)),
    )
    v_cub = jnp.where(
        axis == 0, vc, jnp.where(axis == 1, jnp.where(pos, wc, 1.0 - wc), vc)
    )

    # --- rect ---
    t_rec = _rect_t(o_loc, d_loc)
    t_rec = jnp.where(jnp.isfinite(t_rec), t_rec, 0.0)  # grad-safe miss
    p_rec = o_loc + t_rec[..., None] * d_loc
    p_rec = p_rec.at[..., 2].set(0.0)
    n_rec = jnp.zeros_like(p_rec).at[..., 2].set(1.0)
    u_rec = p_rec[..., 0] + 0.5
    v_rec = p_rec[..., 1] + 0.5

    is_s = (kind == KIND_SPHERE)[..., None]
    is_c = (kind == KIND_CUBE)[..., None]
    p_loc = jnp.where(is_s, p_sph, jnp.where(is_c, p_cub, p_rec))
    n_loc = jnp.where(is_s, n_sph, jnp.where(is_c, n_cub, n_rec))
    u = jnp.where(is_s[..., 0], u_sph, jnp.where(is_c[..., 0], u_cub, u_rec))
    v = jnp.where(is_s[..., 0], v_sph, jnp.where(is_c[..., 0], v_cub, v_rec))

    # World point: transformed at time 0 then advected (Code/shapes.cpp:243-248).
    point = apply_point(o2w, p_loc) + vel * time[:, None]
    normal = apply_normal(w2o, n_loc)
    # Reference recomputes t as the Euclidean distance from the true origin
    # (Code/shapes.cpp:251-253).  safe_sqrt: masked slots can have point==o.
    t = safe_sqrt(dot(point - o, point - o))
    return point, normal, u, v, t


def _plane_attributes(scene: Scene, qid, o, d):
    """Legacy plane attribute reconstruction (Code/shapes.cpp:444-482)."""
    corners = onehot_gather(scene.planes.corners, qid)  # (R, 4, 3)
    n, _ = _plane_geometry(corners)
    denom = dot(n, d)
    safe = jnp.where(jnp.abs(denom) < C.EPS_PARALLEL, 1.0, denom)
    t = dot(corners[:, 0, :] - o, n) / safe
    p = o + t[..., None] * d
    vec_u = corners[:, 1, :] - corners[:, 0, :]
    vec_v = corners[:, 3, :] - corners[:, 0, :]
    hv = p - corners[:, 0, :]
    u = jnp.clip(dot(hv, vec_u) / jnp.maximum(dot(vec_u, vec_u), 1e-20), 0.0, 1.0)
    v = jnp.clip(dot(hv, vec_v) / jnp.maximum(dot(vec_v, vec_v), 1e-20), 0.0, 1.0)
    return p, n, u, v, t


def closest_hit(
    scene: Scene, o, d, time, active=None, use_bvh=False, differentiable=True
) -> Hit:
    """Full closest-hit: pass-1 winner search then pass-2 attribute rebuild.

    Pass 1 runs as the Pallas megakernel on TPU (kernels/closest_hit.py) or
    the dense jnp reduction elsewhere; both produce identical winners.
    Pass 2 is pure differentiable jnp either way (gradients flow to scene
    parameters with the hit id held fixed).

    differentiable=False selects the fused-attribute kernel on TPU when the
    scene allows it (no textures -> no uv needed): the hit normal is
    accumulated inside the kernel loop, the point is o + t*d (exact for
    affine TRS prims incl. motion advection), and pass-2 is skipped
    entirely.  Hit attributes then carry no gradients — inference only."""
    n_geoms = scene.n_geoms
    if n_geoms == 0:
        r = o.shape[0]
        return Hit(
            valid=jnp.zeros(r, bool),
            geom_id=jnp.full(r, -1, jnp.int32),
            t=jnp.full(r, _INF),
            point=jnp.zeros((r, 3)),
            normal=jnp.zeros((r, 3)),
            uv=jnp.zeros((r, 2)),
        )
    if _use_pallas():
        from ray_tracying_tpu.kernels.closest_hit import (
            BRUTE_SMEM_MAX_GEOMS,
            closest_hit_tid,
            closest_hit_tid_n,
        )

        big = scene.n_geoms > BRUTE_SMEM_MAX_GEOMS
        if (
            not differentiable
            and not scene.has_textures
            and ((not big and not use_bvh)
                 or (big and scene.chunk_geoms is not None))
        ):
            # Fused-attribute fast path: normal from the kernel, point
            # from o + t*d, no pass-2.  Beyond-SMEM scenes use the
            # chunk-culled streaming variant (identical hit set) — pass-2's
            # one-hot prim gather is O(R * G) and unaffordable there.
            if big:
                from ray_tracying_tpu.kernels.chunk_stream import (
                    closest_hit_tid_n_chunks,
                )

                t_min, gid, normal = closest_hit_tid_n_chunks(
                    scene, o, d, time, active
                )
            else:
                t_min, gid, normal = closest_hit_tid_n(scene, o, d, time, active)
            valid = jnp.isfinite(t_min)
            t_fin = jnp.where(valid, t_min, 0.0)
            point = o + t_fin[:, None] * d
            r = o.shape[0]
            return Hit(
                valid=valid,
                geom_id=jnp.where(valid, gid, -1),
                t=jnp.where(valid, t_min, _INF),
                point=point,
                normal=normal,
                uv=jnp.zeros((r, 2)),
            )
        if big and scene.chunk_geoms is not None:
            from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_chunks

            t_min, gid = closest_hit_tid_chunks(scene, o, d, time, active)
        elif use_bvh and scene.bvh_geoms is not None and not big:
            from ray_tracying_tpu.kernels.bvh_traverse import closest_hit_tid_bvh

            t_min, gid = closest_hit_tid_bvh(scene, o, d, time, active)
        else:
            t_min, gid = closest_hit_tid(scene, o, d, time, active)
        valid = jnp.isfinite(t_min)
        gid = jnp.maximum(gid, 0)
    else:
        tm = all_hit_t(scene, o, d, time)
        gid = jnp.argmin(tm, axis=1).astype(jnp.int32)
        t_min = jnp.min(tm, axis=1)  # second fused reduction beats a gather
        valid = jnp.isfinite(t_min)

    if scene.n_prims and scene.n_planes:
        pid = jnp.clip(gid, 0, scene.n_prims - 1)
        qid = jnp.clip(gid - scene.n_prims, 0, scene.n_planes - 1)
        p1, n1, u1, v1, t1 = _prim_attributes(scene, pid, o, d, time)
        p2, n2, u2, v2, t2 = _plane_attributes(scene, qid, o, d)
        is_plane = gid >= scene.n_prims
        point = jnp.where(is_plane[:, None], p2, p1)
        normal = jnp.where(is_plane[:, None], n2, n1)
        u = jnp.where(is_plane, u2, u1)
        v = jnp.where(is_plane, v2, v1)
        t = jnp.where(is_plane, t2, t1)
    elif scene.n_prims:
        pid = jnp.clip(gid, 0, scene.n_prims - 1)
        point, normal, u, v, t = _prim_attributes(scene, pid, o, d, time)
    else:
        qid = jnp.clip(gid, 0, scene.n_planes - 1)
        point, normal, u, v, t = _plane_attributes(scene, qid, o, d)

    t = jnp.where(valid, t, _INF)
    return Hit(
        valid=valid,
        geom_id=jnp.where(valid, gid, -1),
        t=t,
        point=point,
        normal=normal,
        uv=jnp.stack([u, v], axis=-1),
    )
