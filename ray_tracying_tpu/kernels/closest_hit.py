"""Pallas TPU closest-hit megakernel (brute force over the geom table).

This is the native replacement for the reference's innermost hot path —
`BVH::get_intersection` + per-shape virtual `intersect`
(Code/acceleration.cpp:142-151, Code/shapes.cpp:200-503) — redesigned for
the TPU's memory hierarchy instead of translated:

  - A block of rays lives in VMEM as 8 lanes-wide vectors
    (ox,oy,oz,dx,dy,dz,time,active).
  - The whole packed geometry table (kernels/geom_table.py) sits in SMEM;
    the kernel loops rows with `lax.fori_loop`, broadcasting 17 scalars
    per step against the ray block and updating a running (best_t,
    best_id) pair in registers.
  - Nothing of size (rays x geoms) ever exists: the jnp fallback
    (render/intersect.py) materializes that matrix in HBM; this kernel is
    compute-bound on the VPU instead.
  - Static specialization: per-kind math and the motion-blur origin shift
    compile away when the scene lacks them.
  - Blocks whose rays are all dead (active row all zero) skip the loops
    entirely — in bounce levels most of the frame is dead background.

Strict-< updates reproduce the reference's first-wins tie-break
(Code/acceleration.cpp:112,133).  Distances are the reference's Euclidean
semantics: t_loc * |d| for transformed prims, parametric t for legacy
planes (see render/intersect.py docstring).

The kernel is wrapped in a custom_vjp with zero cotangents: hit
*decisions* are discontinuous and treated as fixed; the differentiable
path reconstructs attributes (and a differentiable t) from the id via
render/intersect.py pass 2 (the "closest-hit re-use trick" of
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
from ray_tracying_tpu.kernels.geom_table import (
    pack_geom_table_chunked,
    pack_geom_table_sorted,
)
from ray_tracying_tpu.scene.types import Scene

# Rays per kernel block.  Swept on the bundled scene (BASELINE.md): one
# closest-hit pass runs 78/150/214/231 M rays/s at 512/1024/2048/4096, but
# bigger blocks skip fewer dead blocks in bounce levels — 2048 wins on
# full frames (8.3M vs 7.9M primary rays/s at 1024, 8.2M at 4096).
BLOCK_R = 2048
_INF = float("inf")  # plain Python float: jnp scalars become captured consts


def pallas_interpret() -> bool:
    """RTT_PALLAS_INTERPRET=1 runs the kernels in interpreter mode — lets
    CPU tests exercise the exact kernel code paths (slowly)."""
    import os

    return os.environ.get("RTT_PALLAS_INTERPRET") == "1"


class RayBlock:
    """The per-block ray registers.  base: first row of the 8-row ray
    group inside the ref (Mosaic wants input blocks whose row count is
    divisible by 8 or the full array — wider packs read at an offset)."""

    __slots__ = ("ox", "oy", "oz", "dx", "dy", "dz", "tm", "dnorm")

    def __init__(self, rays_ref, base: int = 0):
        self.ox = rays_ref[base + 0, :]
        self.oy = rays_ref[base + 1, :]
        self.oz = rays_ref[base + 2, :]
        self.dx = rays_ref[base + 3, :]
        self.dy = rays_ref[base + 4, :]
        self.dz = rays_ref[base + 5, :]
        self.tm = rays_ref[base + 6, :]
        self.dnorm = jnp.sqrt(
            self.dx * self.dx + self.dy * self.dy + self.dz * self.dz
        )


def geom_t(g, table_ref, rb: RayBlock, spec, want_normal=False):
    """Hit distance of geom-table row g against the ray block.

    spec: dict of static flags {spheres, cubes, rects, planes, motion}.
    When exactly one kind flag is set and spec["single"] is true, the
    per-row kind dispatch compiles away entirely (the kind-split kernels
    run one such loop per kind over a kind-sorted table).
    Returns (t_geom (R,) with +inf miss, gid scalar) — plus, when
    want_normal, the UNnormalized world-space hit normal (3 vectors;
    reference semantics: sphere = local point, cube = entry face even when
    the exit t is used (Code/shapes.cpp:392-402), rect = +z, plane = face
    normal; world mapping is the inverse-transpose w2o^T
    (Code/shapes.cpp:178-187), with normalization deferred to the caller).
    """
    single = spec.get("single", False)
    # AD-safe mode (kernels/wave_ref.py): a large FINITE miss sentinel
    # instead of inf — inf-valued primals turn zero cotangents into NaN
    # (0 * inf) in backward mul rules.  The kernels keep true inf.
    INF = spec.get("inf", _INF)
    # Table is stored transposed (17, G): SMEM pads the minor dimension of
    # every row to 512 bytes, so (G, 17) would cost 512 B/geom and overflow
    # the ~1 MB SMEM at a few thousand geoms; (17, G) costs 4 B/geom.
    c = [table_ref[i, g] for i in range(16)]
    gid = table_ref[16, g]
    kind = c[15]

    t_geom = jnp.full(rb.ox.shape, INF, jnp.float32)
    zero = jnp.zeros(rb.ox.shape, jnp.float32)
    nlx = nly = nlz = zero  # object-space normal of the winning kind

    if spec["spheres"] or spec["cubes"] or spec["rects"]:
        # Motion-blurred origin (Code/shapes.cpp:201-210), then
        # world->object transform.
        if spec["motion"]:
            osx = rb.ox - c[12] * rb.tm
            osy = rb.oy - c[13] * rb.tm
            osz = rb.oz - c[14] * rb.tm
        else:
            osx, osy, osz = rb.ox, rb.oy, rb.oz
        olx = c[0] * osx + c[1] * osy + c[2] * osz + c[3]
        oly = c[4] * osx + c[5] * osy + c[6] * osz + c[7]
        olz = c[8] * osx + c[9] * osy + c[10] * osz + c[11]
        dlx = c[0] * rb.dx + c[1] * rb.dy + c[2] * rb.dz
        dly = c[4] * rb.dx + c[5] * rb.dy + c[6] * rb.dz
        dlz = c[8] * rb.dx + c[9] * rb.dy + c[10] * rb.dz

        if spec["spheres"]:
            # (Code/shapes.cpp:219-232)
            a = dlx * dlx + dly * dly + dlz * dlz
            b = 2.0 * (olx * dlx + oly * dly + olz * dlz)
            cc = olx * olx + oly * oly + olz * olz - 1.0
            disc = b * b - 4.0 * a * cc
            # sqrt guarded for AD: sqrt(max(x,0)) has an inf gradient at
            # 0 that turns masked-out lanes into NaN under the wave_ref
            # reconstruction VJP; the where keeps values identical.
            pos = disc > 0.0
            sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
            a_safe = jnp.where(a > 0.0, a, 1.0)
            # one reciprocal + two muls instead of two divisions (VPU
            # divides are multi-cycle; differs from a/b by <= 1 ulp,
            # inside the float-reassociation parity contract)
            inv_2a = 1.0 / (2.0 * a_safe)
            t1 = (-b - sq) * inv_2a
            t2 = (-b + sq) * inv_2a
            t_loc = jnp.where(
                t1 > C.EPS_T_MIN, t1, jnp.where(t2 > C.EPS_T_MIN, t2, INF)
            )
            t_loc = jnp.where((disc >= 0.0) & (a > 0.0), t_loc, INF)
            t_sph = t_loc * rb.dnorm
            if want_normal:
                # n_loc = local hit point (unit sphere, Code/shapes.cpp:241)
                tl = jnp.where(t_loc < INF, t_loc, 0.0)
                sx = olx + tl * dlx
                sy = oly + tl * dly
                sz = olz + tl * dlz
                if single:
                    nlx, nly, nlz = sx, sy, sz
                else:
                    is_k = kind == 0.0
                    nlx = jnp.where(is_k, sx, nlx)
                    nly = jnp.where(is_k, sy, nly)
                    nlz = jnp.where(is_k, sz, nlz)
            t_geom = t_sph if single else jnp.where(kind == 0.0, t_sph, t_geom)

        if spec["cubes"]:
            # Slab test with t > 0, no 1e-3 epsilon (Code/shapes.cpp:361-393).
            t_near = jnp.full_like(olx, -INF)
            t_far = jnp.full_like(olx, INF)
            miss = jnp.zeros(olx.shape, jnp.bool_)
            ents = []
            sgns = []
            for oo, ddc in ((olx, dlx), (oly, dly), (olz, dlz)):
                par = jnp.abs(ddc) < C.EPS_PARALLEL
                d_safe = jnp.where(par, 1.0, ddc)
                inv_d = 1.0 / d_safe  # 1 reciprocal, 2 muls (see sphere)
                s1 = (-0.5 - oo) * inv_d
                s2 = (0.5 - oo) * inv_d
                ent = jnp.where(par, -INF, jnp.minimum(s1, s2))
                ext = jnp.where(par, INF, jnp.maximum(s1, s2))
                miss = miss | (par & ((oo < -0.5) | (oo > 0.5)))
                t_near = jnp.maximum(t_near, ent)
                t_far = jnp.minimum(t_far, ext)
                if want_normal:
                    ents.append(ent)
                    sgns.append(jnp.where(s1 < s2, -1.0, 1.0))
            miss = miss | (t_near > t_far) | (t_far < 0.0)
            t_cub = jnp.where(t_near > 0.0, t_near, t_far)
            t_cub = jnp.where(miss | (t_cub < 0.0), INF, t_cub)
            t_cub = t_cub * rb.dnorm
            if want_normal:
                # Entry face: the axis whose slab entry won the max; ties
                # break to the LAST axis like the reference's sequential
                # `>=`-less update (it keeps the first max; argmax keeps
                # first too — replicate first-wins with strict >).
                ax0 = ents[0]
                win1 = ents[1] > ax0
                axv = jnp.where(win1, ents[1], ax0)
                win2 = ents[2] > axv
                cx = jnp.where(win1 | win2, 0.0, sgns[0])
                cy = jnp.where(win2, 0.0, jnp.where(win1, sgns[1], 0.0))
                cz = jnp.where(win2, sgns[2], 0.0)
                if single:
                    nlx, nly, nlz = cx, cy, cz
                else:
                    is_k = kind == 1.0
                    nlx = jnp.where(is_k, cx, nlx)
                    nly = jnp.where(is_k, cy, nly)
                    nlz = jnp.where(is_k, cz, nlz)
            t_geom = t_cub if single else jnp.where(kind == 1.0, t_cub, t_geom)

        if spec["rects"]:
            # (Code/shapes.cpp:305-315)
            par_z = jnp.abs(dlz) < C.EPS_PARALLEL
            t_r = -olz / jnp.where(par_z, 1.0, dlz)
            hx = olx + t_r * dlx
            hy = oly + t_r * dly
            ok_r = (
                ~par_z
                & (t_r >= C.EPS_T_MIN)
                & (hx >= -0.5) & (hx <= 0.5) & (hy >= -0.5) & (hy <= 0.5)
            )
            t_rec = jnp.where(ok_r, t_r, INF)
            t_rec = t_rec * rb.dnorm
            if want_normal:
                # n_loc = +z (Code/shapes.cpp:320)
                one = jnp.ones(rb.ox.shape, jnp.float32)
                if single:
                    nlx, nly, nlz = zero, zero, one
                else:
                    is_k = kind == 2.0
                    nlx = jnp.where(is_k, 0.0, nlx)
                    nly = jnp.where(is_k, 0.0, nly)
                    nlz = jnp.where(is_k, 1.0, nlz)
            t_geom = t_rec if single else jnp.where(kind == 2.0, t_rec, t_geom)

        if want_normal and (
            spec["spheres"] or spec["cubes"] or spec["rects"]
        ):
            # World normal via inverse-transpose: n_w = w2o^T n_loc
            # (Code/shapes.cpp:178-187); normalization deferred.
            nwx = c[0] * nlx + c[4] * nly + c[8] * nlz
            nwy = c[1] * nlx + c[5] * nly + c[9] * nlz
            nwz = c[2] * nlx + c[6] * nly + c[10] * nlz
            nlx, nly, nlz = nwx, nwy, nwz

    if spec["planes"]:
        # Legacy quad, parametric t (Code/shapes.cpp:444-483); the 12
        # matrix slots hold the 4 corners.
        ax, ay, az = c[0], c[1], c[2]
        bx, by, bz = c[3], c[4], c[5]
        cx, cy, cz = c[6], c[7], c[8]
        ex, ey, ez = c[9], c[10], c[11]
        e1x, e1y, e1z = bx - ax, by - ay, bz - az
        e2x, e2y, e2z = cx - ax, cy - ay, cz - az
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        n2 = nx * nx + ny * ny + nz * nz
        ln = jnp.where(
            n2 > 0.0, jnp.sqrt(jnp.where(n2 > 0.0, n2, 1.0)), 0.0
        )
        degen = ln < C.EPS_PARALLEL
        ln_safe = jnp.where(degen, 1.0, ln)
        nx, ny, nz = nx / ln_safe, ny / ln_safe, nz / ln_safe

        denom = nx * rb.dx + ny * rb.dy + nz * rb.dz
        par = jnp.abs(denom) < C.EPS_PARALLEL
        t = (
            (ax - rb.ox) * nx + (ay - rb.oy) * ny + (az - rb.oz) * nz
        ) / jnp.where(par, 1.0, denom)
        px = rb.ox + t * rb.dx
        py = rb.oy + t * rb.dy
        pz = rb.oz + t * rb.dz

        def edge(x0, y0, z0, x1, y1, z1):
            ux, uy, uz = x1 - x0, y1 - y0, z1 - z0
            wx, wy, wz = px - x0, py - y0, pz - z0
            cxv = uy * wz - uz * wy
            cyv = uz * wx - ux * wz
            czv = ux * wy - uy * wx
            return (cxv * nx + cyv * ny + czv * nz) >= C.EPS_PLANE_EDGE

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
        t_pl = jnp.where(ok, t, INF)
        if want_normal:
            # Plane normal is already world-space (Code/shapes.cpp:454).
            one = jnp.ones(rb.ox.shape, jnp.float32)
            if single:
                nlx, nly, nlz = nx * one, ny * one, nz * one
            else:
                is_k = kind == 3.0
                nlx = jnp.where(is_k, nx, nlx)
                nly = jnp.where(is_k, ny, nly)
                nlz = jnp.where(is_k, nz, nlz)
        t_geom = t_pl if single else jnp.where(kind == 3.0, t_pl, t_geom)

    if want_normal:
        return t_geom, gid, (nlx, nly, nlz)
    return t_geom, gid


def geom_step(g, carry, table_ref, rb: RayBlock, spec, enable=None):
    """Test geom-table row g against the ray block; update (best_t, best_id)
    with the strict-< first-wins tie-break (Code/acceleration.cpp:112,133).

    enable: optional scalar bool predicating the commit (used by the BVH
    state machine to no-op iterations outside leaf mode)."""
    best_t, best_id = carry
    t_geom, gid = geom_t(g, table_ref, rb, spec)
    better = t_geom < best_t
    if enable is not None:
        better = better & enable
    best_t = jnp.where(better, t_geom, best_t)
    best_id = jnp.where(better, jnp.round(gid).astype(jnp.int32), best_id)
    return best_t, best_id


def geom_step_n(g, carry, table_ref, rb: RayBlock, spec):
    """geom_step variant that also carries the winning world normal
    (unnormalized; normalized once after the loop)."""
    best_t, best_id, bnx, bny, bnz = carry
    t_geom, gid, (nwx, nwy, nwz) = geom_t(
        g, table_ref, rb, spec, want_normal=True
    )
    better = t_geom < best_t
    best_t = jnp.where(better, t_geom, best_t)
    best_id = jnp.where(better, jnp.round(gid).astype(jnp.int32), best_id)
    bnx = jnp.where(better, nwx, bnx)
    bny = jnp.where(better, nwy, bny)
    bnz = jnp.where(better, nwz, bnz)
    return best_t, best_id, bnx, bny, bnz


def _kind_spec(kind: int, motion: bool) -> dict:
    """Static spec for one kind-specialized loop range (kind -1 = mixed)."""
    if kind < 0:
        return dict(
            spheres=True, cubes=True, rects=True, planes=False, motion=motion
        )
    return dict(
        spheres=kind == 0,
        cubes=kind == 1,
        rects=kind == 2,
        planes=kind == 3,
        # Only spheres carry velocity (Code/json_loader.cpp:215-223).
        motion=motion and kind == 0,
        single=True,
    )


def _brute_kernel(rays_ref, table_ref, t_ref, id_ref, *, ranges, motion):
    """Brute-force closest hit: one kind-specialized fori_loop per range of
    the kind-sorted geom table (kernels/geom_table.py)."""
    act = rays_ref[7, :]
    t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
    id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        best = (
            jnp.full(rb.ox.shape, _INF, jnp.float32),
            jnp.full(rb.ox.shape, -1, jnp.int32),
        )
        for kind, start, end in ranges:
            spec = _kind_spec(kind, motion)
            best = lax.fori_loop(
                start,
                end,
                lambda g, cr, spec=spec: geom_step(g, cr, table_ref, rb, spec),
                best,
            )
        best_t, best_id = best
        t_ref[0, :] = best_t
        id_ref[0, :] = best_id


def scene_spec(scene: Scene) -> dict:
    return dict(
        spheres=scene.has_spheres,
        cubes=scene.has_cubes,
        rects=scene.has_rects,
        planes=scene.n_planes > 0,
        motion=scene.has_motion,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _brute_call(rays, table, ranges, motion):
    r_pad = rays.shape[1]
    n_geoms = max(end for _, _, end in ranges)
    kernel = functools.partial(_brute_kernel, ranges=ranges, motion=motion)
    flops_per = 90 * n_geoms
    t, pid = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        interpret=pallas_interpret(),
    )(rays, table)
    return t[0], pid[0]


def _brute_fwd(rays, table, ranges, motion):
    return _brute_call(rays, table, ranges, motion), None


def _brute_bwd(ranges, motion, _res, _ct):
    # Hit decisions are piecewise-constant; their a.e.-zero gradient is
    # materialized as zeros (None = symbolic zero).
    return None, None


_brute_call.defvjp(_brute_fwd, _brute_bwd)


# ---------------------------------------------------------------------------
# Geom-chunked brute kernel: scenes whose table exceeds SMEM
# ---------------------------------------------------------------------------

# The full (17, G) table must fit SMEM (~1 MB) for the single-pass kernel;
# beyond this the grid adds a geom-chunk dimension and streams table
# chunks through SMEM while the (best_t, best_id) output block stays
# resident in VMEM across chunks.
BRUTE_SMEM_MAX_GEOMS = 12288
GEOM_CHUNK = 4096


def _brute_chunked_kernel(rays_ref, table_ref, t_ref, id_ref, *, spec):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
        id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)

    act = rays_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        best = (t_ref[0, :], id_ref[0, :])
        best_t, best_id = lax.fori_loop(
            0,
            GEOM_CHUNK,
            lambda g, cr: geom_step(g, cr, table_ref, rb, spec),
            best,
        )
        t_ref[0, :] = best_t
        id_ref[0, :] = best_id


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _brute_chunked_call(rays, table, spec_key):
    r_pad = rays.shape[1]
    g_pad = table.shape[1]
    spec = dict(spec_key)
    kernel = functools.partial(_brute_chunked_kernel, spec=spec)
    t, pid = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R, g_pad // GEOM_CHUNK),
        in_specs=[
            pl.BlockSpec(
                (8, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (17, GEOM_CHUNK), lambda i, j: (0, j), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(rays, table)
    return t[0], pid[0]


def _brute_chunked_fwd(rays, table, spec_key):
    return _brute_chunked_call(rays, table, spec_key), None


def _brute_chunked_bwd(spec_key, _res, _ct):
    return None, None


_brute_chunked_call.defvjp(_brute_chunked_fwd, _brute_chunked_bwd)


def pack_rays(o, d, time, active):
    """(R,3)x2 + (R,) -> (8, R_pad) ray block array.

    One concatenate + pad, NOT an .at[].set chain: each dynamic-update-
    slice re-copies the whole (8, R) buffer (~5 ms/level at 4M rays on the
    xprof trace); a single concat fusion writes it once."""
    r = o.shape[0]
    r_pad = -(-r // BLOCK_R) * BLOCK_R
    if active is None:
        act_row = jnp.ones((1, r), jnp.float32)
    else:
        act_row = active.astype(jnp.float32)[None, :]
    rays = jnp.concatenate([o.T, d.T, time[None, :], act_row], axis=0)
    if r_pad > r:
        rays = jnp.pad(rays, ((0, 0), (0, r_pad - r)))
    return lax.stop_gradient(rays), r_pad


def closest_hit_tid(scene: Scene, o, d, time, active=None):
    """Pallas brute-force closest hit: (t_min, geom_id) for a ray batch.

    o, d: (R, 3); time: (R,).  active: optional (R,) bool — blocks whose
    slots are all inactive are skipped entirely (their rays report miss).
    Returns t (R,) with +inf miss and id (R,) int32 with -1 miss.
    """
    r = o.shape[0]
    rays, _ = pack_rays(o, d, time, active)
    if scene.n_geoms > BRUTE_SMEM_MAX_GEOMS:
        # Stream the table through SMEM in chunks (mixed-kind loop).
        table = lax.stop_gradient(
            pack_geom_table_chunked(scene, GEOM_CHUNK).T
        )
        spec_key = tuple(sorted(scene_spec(scene).items()))
        t, pid = _brute_chunked_call(rays, table, spec_key)
    else:
        table, ranges = pack_geom_table_sorted(scene)
        table = lax.stop_gradient(table.T)  # (17, G) for SMEM
        t, pid = _brute_call(rays, table, ranges, scene.has_motion)
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r]


# ---------------------------------------------------------------------------
# Closest hit with fused normals: pass-2 geometry reconstruction folded
# into the kernel loop, so hit attributes inherit dead-block skipping and
# never round-trip HBM.  (The world hit POINT needs no per-geom data at
# all: for affine TRS prims with motion advection, o2w(p_loc) + v*t ==
# o + t_loc*d exactly, and t_world = t_loc*|d|, so point = o + t*d_unit;
# computed by the caller.)
# ---------------------------------------------------------------------------

def _brute_n_kernel(rays_ref, table_ref, t_ref, id_ref, n_ref, *, ranges, motion):
    act = rays_ref[7, :]
    t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
    id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)
    n_ref[...] = jnp.zeros((3, BLOCK_R), jnp.float32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        zero = jnp.zeros(rb.ox.shape, jnp.float32)
        best = (
            jnp.full(rb.ox.shape, _INF, jnp.float32),
            jnp.full(rb.ox.shape, -1, jnp.int32),
            zero, zero, zero,
        )
        for kind, start, end in ranges:
            spec = _kind_spec(kind, motion)
            best = lax.fori_loop(
                start,
                end,
                lambda g, cr, spec=spec: geom_step_n(g, cr, table_ref, rb, spec),
                best,
            )
        best_t, best_id, bnx, bny, bnz = best
        # Normalize the winning normal once (Code/shapes.cpp:186).
        ln = jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz)
        ln = jnp.where(ln > 0.0, ln, 1.0)
        t_ref[0, :] = best_t
        id_ref[0, :] = best_id
        n_ref[0, :] = bnx / ln
        n_ref[1, :] = bny / ln
        n_ref[2, :] = bnz / ln


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _brute_n_call(rays, table, ranges, motion):
    r_pad = rays.shape[1]
    kernel = functools.partial(_brute_n_kernel, ranges=ranges, motion=motion)
    t, pid, n = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((3, r_pad), jnp.float32),
        ],
        interpret=pallas_interpret(),
    )(rays, table)
    return t[0], pid[0], n


def _brute_n_fwd(rays, table, ranges, motion):
    return _brute_n_call(rays, table, ranges, motion), None


def _brute_n_bwd(ranges, motion, _res, _ct):
    # Inference-only fast path: the differentiable renderer uses the
    # pass-2 reconstruction instead (render/intersect.py).
    return None, None


_brute_n_call.defvjp(_brute_n_fwd, _brute_n_bwd)


def closest_hit_tid_n(scene: Scene, o, d, time, active=None):
    """Closest hit with fused world normals: (t, geom_id, normal (R,3)).

    Inference fast path — gradients do not flow (use the pass-2 path for
    differentiable rendering)."""
    r = o.shape[0]
    rays, _ = pack_rays(o, d, time, active)
    table, ranges = pack_geom_table_sorted(scene)
    table = lax.stop_gradient(table.T)
    t, pid, n = _brute_n_call(rays, table, ranges, scene.has_motion)
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r], n[:, :r].T


# ---------------------------------------------------------------------------
# Occlusion (shadow any-hit) kernel
# ---------------------------------------------------------------------------

# Geoms tested per early-exit check in the occlusion kernel.  A bare
# 1-geom-per-iteration while_loop serializes on its loop-carried scalar
# reduction (~4x slower than the fori closest-hit loop); unrolling CHUNK
# geom tests per iteration restores instruction-level pipelining while
# still exiting once every live lane in the block is occluded.
OCC_CHUNK = 8


def _occlusion_kernel(rays_ref, maxt_ref, table_ref, out_ref, *, ranges, motion):
    """Any-hit test: out[r] = 1 iff some geom has hit distance <= maxt[r].

    Shadow visibility only needs EXISTENCE of a blocker closer than the
    light (visible iff min_t > light_dist, Code/raytracer.cpp:233-235 — the
    complement of any t <= light_dist), so unlike the closest-hit kernel
    this one EARLY-EXITS each kind loop as soon as every live lane in the
    block is already occluded.  Kind segments are padded to OCC_CHUNK with
    never-hit zero rows (kernels/geom_table.py)."""
    act = rays_ref[7, :]
    out_ref[0, :] = jnp.zeros((BLOCK_R,), jnp.float32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        maxt = maxt_ref[0, :]
        # The mask rides the while carry as f32 (Mosaic cannot yield i1
        # vectors from scf.while).  Inactive lanes start "blocked" so they
        # never hold the loop open.
        blocked = jnp.where(act > 0.0, 0.0, 1.0)
        for kind, start, end in ranges:
            spec = _kind_spec(kind, motion)

            def cond(carry, end=end):
                g, blk = carry
                return (g < end) & (jnp.min(blk) < 1.0)

            def body(carry, spec=spec):
                g, blk = carry
                hit = jnp.zeros(blk.shape, jnp.float32)
                for i in range(OCC_CHUNK):
                    t_geom, _ = geom_t(g + i, table_ref, rb, spec)
                    hit = jnp.maximum(hit, (t_geom <= maxt).astype(jnp.float32))
                return g + OCC_CHUNK, jnp.maximum(blk, hit)

            _, blocked = lax.while_loop(cond, body, (start, blocked))
        out_ref[0, :] = jnp.where(act > 0.0, blocked, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _occlusion_call(rays, maxt, table, ranges, motion):
    r_pad = rays.shape[1]
    n_geoms = max(end for _, _, end in ranges)
    kernel = functools.partial(_occlusion_kernel, ranges=ranges, motion=motion)
    blocked = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=90 * n_geoms * r_pad,
            bytes_accessed=rays.size * 4 + r_pad * 8,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(rays, maxt, table)
    return blocked[0]


def _occlusion_fwd(rays, maxt, table, ranges, motion):
    return _occlusion_call(rays, maxt, table, ranges, motion), None


def _occlusion_bwd(ranges, motion, _res, _ct):
    # Binary visibility is piecewise-constant: zero gradient a.e.
    return None, None, None


_occlusion_call.defvjp(_occlusion_fwd, _occlusion_bwd)


def occluded_tid(scene: Scene, o, d, maxt, active=None):
    """(R,) bool: some geom blocks the ray before distance maxt.

    Shadow rays carry time = 0 (Ray default, Code/shapes.hpp:28), so the
    motion shift compiles away."""
    r = o.shape[0]
    rays, r_pad = pack_rays(o, d, jnp.zeros(r, jnp.float32), active)
    mt = jnp.pad(maxt[None, :], ((0, 0), (0, r_pad - r)))
    table, ranges = pack_geom_table_sorted(scene, chunk=OCC_CHUNK)
    table = lax.stop_gradient(table.T)
    blocked = _occlusion_call(rays, lax.stop_gradient(mt), table, ranges, False)
    return blocked[:r] > 0.0
