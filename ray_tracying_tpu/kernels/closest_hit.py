"""Pallas TPU closest-hit megakernel.

This is the native replacement for the reference's innermost hot path —
`BVH::get_intersection` + per-shape virtual `intersect`
(Code/acceleration.cpp:142-151, Code/shapes.cpp:200-433) — redesigned for
the TPU's memory hierarchy instead of translated:

  - A block of rays lives in VMEM registers as 7 lanes-wide vectors
    (ox,oy,oz,dx,dy,dz,time).
  - The whole primitive table (world->object 3x4, velocity, kind — 16
    floats per prim) sits in SMEM; the kernel loops primitives with
    `lax.fori_loop`, broadcasting 16 scalars per step against the ray
    block and updating a running (best_t, best_id) pair in registers.
  - Nothing of size (rays x prims) ever exists: the jnp fallback
    (render/intersect.py) materializes that matrix in HBM (~64 ms/Mray for
    141 prims); this kernel is compute-bound on the VPU instead.

Strict-< updates reproduce the reference's first-wins tie-break
(Code/acceleration.cpp:112,133).  Distances are the reference's Euclidean
semantics: t_loc * |d| for transformed prims, parametric t for legacy
planes (see render/intersect.py docstring).

The kernel returns (t, id) and is wrapped in a custom_vjp with zero
cotangents: hit *decisions* are discontinuous and treated as fixed; the
differentiable path reconstructs attributes (and a differentiable t) from
the id via render/intersect.py pass 2 (the "closest-hit re-use trick" of
BASELINE.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.scene.types import Scene

BLOCK_R = 1024
_INF = float("inf")  # plain Python float: jnp scalars become captured consts


def _prim_step(p, carry, prims_ref, ox, oy, oz, dx, dy, dz, tm, dnorm):
    """Test one transformed primitive against the ray block."""
    best_t, best_id = carry
    m00 = prims_ref[p, 0]
    m01 = prims_ref[p, 1]
    m02 = prims_ref[p, 2]
    m03 = prims_ref[p, 3]
    m10 = prims_ref[p, 4]
    m11 = prims_ref[p, 5]
    m12 = prims_ref[p, 6]
    m13 = prims_ref[p, 7]
    m20 = prims_ref[p, 8]
    m21 = prims_ref[p, 9]
    m22 = prims_ref[p, 10]
    m23 = prims_ref[p, 11]
    vx = prims_ref[p, 12]
    vy = prims_ref[p, 13]
    vz = prims_ref[p, 14]
    kind = prims_ref[p, 15]

    # Motion-blurred origin (Code/shapes.cpp:201-210), then world->object.
    osx = ox - vx * tm
    osy = oy - vy * tm
    osz = oz - vz * tm
    olx = m00 * osx + m01 * osy + m02 * osz + m03
    oly = m10 * osx + m11 * osy + m12 * osz + m13
    olz = m20 * osx + m21 * osy + m22 * osz + m23
    dlx = m00 * dx + m01 * dy + m02 * dz
    dly = m10 * dx + m11 * dy + m12 * dz
    dlz = m20 * dx + m21 * dy + m22 * dz

    # --- sphere (Code/shapes.cpp:219-232) ---
    a = dlx * dlx + dly * dly + dlz * dlz
    b = 2.0 * (olx * dlx + oly * dly + olz * dlz)
    c = olx * olx + oly * oly + olz * olz - 1.0
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a > 0.0, a, 1.0)
    t1 = (-b - sq) / (2.0 * a_safe)
    t2 = (-b + sq) / (2.0 * a_safe)
    t_sph = jnp.where(
        t1 > C.EPS_T_MIN, t1, jnp.where(t2 > C.EPS_T_MIN, t2, _INF)
    )
    t_sph = jnp.where((disc >= 0.0) & (a > 0.0), t_sph, _INF)

    # --- cube slabs (Code/shapes.cpp:361-393), t > 0 (no 1e-3 epsilon) ---
    t_near = jnp.full_like(olx, -_INF)
    t_far = jnp.full_like(olx, _INF)
    miss = jnp.zeros(olx.shape, jnp.bool_)
    for oo, ddc in ((olx, dlx), (oly, dly), (olz, dlz)):
        par = jnp.abs(ddc) < C.EPS_PARALLEL
        d_safe = jnp.where(par, 1.0, ddc)
        s1 = (-0.5 - oo) / d_safe
        s2 = (0.5 - oo) / d_safe
        ent = jnp.where(par, -_INF, jnp.minimum(s1, s2))
        ext = jnp.where(par, _INF, jnp.maximum(s1, s2))
        miss = miss | (par & ((oo < -0.5) | (oo > 0.5)))
        t_near = jnp.maximum(t_near, ent)
        t_far = jnp.minimum(t_far, ext)
    miss = miss | (t_near > t_far) | (t_far < 0.0)
    t_cub = jnp.where(t_near > 0.0, t_near, t_far)
    t_cub = jnp.where(miss | (t_cub < 0.0), _INF, t_cub)

    # --- rect (Code/shapes.cpp:305-315) ---
    par_z = jnp.abs(dlz) < C.EPS_PARALLEL
    t_r = -olz / jnp.where(par_z, 1.0, dlz)
    hx = olx + t_r * dlx
    hy = oly + t_r * dly
    ok_r = (
        ~par_z
        & (t_r >= C.EPS_T_MIN)
        & (hx >= -0.5) & (hx <= 0.5) & (hy >= -0.5) & (hy <= 0.5)
    )
    t_rec = jnp.where(ok_r, t_r, _INF)

    t_loc = jnp.where(kind == 0.0, t_sph, jnp.where(kind == 1.0, t_cub, t_rec))
    t_world = t_loc * dnorm

    better = t_world < best_t
    best_t = jnp.where(better, t_world, best_t)
    best_id = jnp.where(better, p, best_id)
    return best_t, best_id


def _plane_step(q, carry, planes_ref, n_prims, ox, oy, oz, dx, dy, dz):
    """Test one legacy quad (Code/shapes.cpp:444-483)."""
    best_t, best_id = carry
    ax, ay, az = planes_ref[q, 0], planes_ref[q, 1], planes_ref[q, 2]
    bx, by, bz = planes_ref[q, 3], planes_ref[q, 4], planes_ref[q, 5]
    cx, cy, cz = planes_ref[q, 6], planes_ref[q, 7], planes_ref[q, 8]
    ex, ey, ez = planes_ref[q, 9], planes_ref[q, 10], planes_ref[q, 11]

    # Scalar normal from corners 0,1,2.
    e1x, e1y, e1z = bx - ax, by - ay, bz - az
    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    ln = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    degen = ln < C.EPS_PARALLEL
    ln_safe = jnp.where(degen, 1.0, ln)
    nx, ny, nz = nx / ln_safe, ny / ln_safe, nz / ln_safe

    denom = nx * dx + ny * dy + nz * dz
    par = jnp.abs(denom) < C.EPS_PARALLEL
    t = ((ax - ox) * nx + (ay - oy) * ny + (az - oz) * nz) / jnp.where(
        par, 1.0, denom
    )
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    def edge(x0, y0, z0, x1, y1, z1):
        # sign of cross(P1-P0, P-P0) . n  >= -1e-6
        ex_, ey_, ez_ = x1 - x0, y1 - y0, z1 - z0
        wx, wy, wz = px - x0, py - y0, pz - z0
        cxv = ey_ * wz - ez_ * wy
        cyv = ez_ * wx - ex_ * wz
        czv = ex_ * wy - ey_ * wx
        return (cxv * nx + cyv * ny + czv * nz) >= C.EPS_PLANE_EDGE

    # Two triangles: (c1,c3,c2) and (c0,c1,c2) (Code/shapes.cpp:491-492).
    in_t1 = (
        edge(bx, by, bz, ex, ey, ez)
        & edge(ex, ey, ez, cx, cy, cz)
        & edge(cx, cy, cz, bx, by, bz)
    )
    in_t2 = (
        edge(ax, ay, az, bx, by, bz)
        & edge(bx, by, bz, cx, cy, cz)
        & edge(cx, cy, cz, ax, ay, az)
    )
    ok = (~degen) & (~par) & (t >= 0.0) & (in_t1 | in_t2)
    t_pl = jnp.where(ok, t, _INF)

    better = t_pl < best_t
    best_t = jnp.where(better, t_pl, best_t)
    best_id = jnp.where(better, n_prims + q, best_id)
    return best_t, best_id


def _closest_hit_kernel(rays_ref, prims_ref, planes_ref, t_ref, id_ref, *,
                        n_prims, n_planes):
    act = rays_ref[7, :]
    # Dead-block skip: in wavefront bounce levels most slots die off
    # (background rays) and deaths cluster spatially because slots are
    # in camera order.  Blocks with no live ray pay only this reduction.
    t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
    id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        ox = rays_ref[0, :]
        oy = rays_ref[1, :]
        oz = rays_ref[2, :]
        dx = rays_ref[3, :]
        dy = rays_ref[4, :]
        dz = rays_ref[5, :]
        tm = rays_ref[6, :]
        dnorm = jnp.sqrt(dx * dx + dy * dy + dz * dz)

        best_t = jnp.full(ox.shape, _INF, jnp.float32)
        best_id = jnp.full(ox.shape, -1, jnp.int32)

        if n_prims:
            best_t, best_id = lax.fori_loop(
                0,
                n_prims,
                lambda p, cr: _prim_step(
                    p, cr, prims_ref, ox, oy, oz, dx, dy, dz, tm, dnorm
                ),
                (best_t, best_id),
            )
        if n_planes:
            best_t, best_id = lax.fori_loop(
                0,
                n_planes,
                lambda q, cr: _plane_step(
                    q, cr, planes_ref, n_prims, ox, oy, oz, dx, dy, dz
                ),
                (best_t, best_id),
            )

        t_ref[0, :] = best_t
        id_ref[0, :] = best_id


def _pack_prim_table(scene: Scene) -> jnp.ndarray:
    """(P, 16): w2o rows (12) | velocity (3) | kind (1)."""
    return jnp.concatenate(
        [
            scene.prims.w2o.reshape(-1, 12),
            scene.prims.velocity,
            scene.prims.kind[:, None].astype(jnp.float32),
        ],
        axis=1,
    )


def _pack_plane_table(scene: Scene) -> jnp.ndarray:
    """(Q, 12): four corners."""
    return scene.planes.corners.reshape(-1, 12)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _closest_hit_call(rays, prims, planes, n_prims, n_planes):
    r_pad = rays.shape[1]
    grid = r_pad // BLOCK_R
    kernel = functools.partial(
        _closest_hit_kernel, n_prims=n_prims, n_planes=n_planes
    )
    flops_per = 90 * n_prims + 70 * n_planes
    t, pid = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per * r_pad,
            bytes_accessed=rays.size * 4 + r_pad * 8,
            transcendentals=0,
        ),
    )(rays, prims, planes)
    return t[0], pid[0]


def _fwd(rays, prims, planes, n_prims, n_planes):
    return _closest_hit_call(rays, prims, planes, n_prims, n_planes), None


def _bwd(n_prims, n_planes, _res, _ct):
    # Hit decisions are piecewise-constant in scene/ray parameters; their
    # a.e.-zero gradient is materialized as zeros.  Differentiable
    # quantities are rebuilt from the id downstream.
    return None, None, None


_closest_hit_call.defvjp(_fwd, _bwd)


def closest_hit_tid(scene: Scene, o, d, time, active=None):
    """Pallas closest hit: (t_min, geom_id) for a batch of rays.

    o, d: (R, 3); time: (R,).  active: optional (R,) bool — blocks whose
    slots are all inactive are skipped entirely (their rays report miss).
    Returns t (R,) with +inf miss and id (R,) int32 with -1 miss.  R is
    padded internally to BLOCK_R granularity.
    """
    r = o.shape[0]
    r_pad = -(-r // BLOCK_R) * BLOCK_R
    rays = jnp.zeros((8, r_pad), jnp.float32)
    rays = rays.at[0:3, :r].set(o.T)
    rays = rays.at[3:6, :r].set(d.T)
    rays = rays.at[6, :r].set(time)
    if active is None:
        rays = rays.at[7, :r].set(1.0)
    else:
        rays = rays.at[7, :r].set(active.astype(jnp.float32))
    rays = lax.stop_gradient(rays)

    prims = _pack_prim_table(scene) if scene.n_prims else jnp.zeros((1, 16))
    planes = _pack_plane_table(scene) if scene.n_planes else jnp.zeros((1, 12))
    t, pid = _closest_hit_call(
        lax.stop_gradient(rays),
        lax.stop_gradient(prims),
        lax.stop_gradient(planes),
        scene.n_prims,
        scene.n_planes,
    )
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r]
