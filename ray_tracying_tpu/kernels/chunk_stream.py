"""Chunk-culled streaming kernels: acceleration for scenes beyond the
SMEM-resident cap (BRUTE_SMEM_MAX_GEOMS).

The reference BVH handles any scene size by pointer-chasing a tree on one
CPU (Code/acceleration.cpp:20-118).  A per-ray tree walk is the wrong
shape for the TPU's 8x128 VPU, and above ~12k geoms the whole table no
longer fits SMEM — so the large-scene design is a ONE-LEVEL BVH over
Morton-ordered geom chunks, streamed through SMEM:

  - accel.lbvh.build_chunks sorts the geom table by centroid Morton code
    (spatial locality => tight per-chunk AABBs) and cuts it into chunks of
    CHUNK rows, each with a conservative AABB (motion extent included).
  - The grid is (ray blocks, chunks).  Pallas streams the (17, CHUNK)
    table block through SMEM (double-buffered DMA it schedules itself);
    the (NC, 6) chunk-AABB table rides along whole in SMEM.
  - Per (block, chunk) step the kernel slab-tests the chunk AABB against
    the whole ray block first — vectorized, with per-lane best-t (or
    shadow max-t) pruning — and skips the 2048-geom inner loop whenever no
    live lane can hit the chunk.  Camera blocks are ~128 adjacent pixels,
    so most chunks cull; the (best_t, best_id) running pair stays resident
    in VMEM across the chunk sweep.

Same hit set as the brute kernels (conservative AABB test only removes
provable misses), so images are bit-identical with or without culling —
the reference's own traversal-order freedom (SURVEY.md §2 quirk 15).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracying_tpu.kernels.closest_hit import (
    BLOCK_R,
    OCC_CHUNK,
    RayBlock,
    geom_step,
    geom_step_n,
    geom_t,
    pack_rays,
    pallas_interpret,
    scene_spec,
)
from ray_tracying_tpu.scene.types import Scene

_INF = float("inf")


def _chunk_any_hit(rb: RayBlock, cbox_ref, col, bound, live):
    """Scalar bool: can any live lane hit chunk `col`'s AABB at a distance
    <= its per-lane bound?  Reference slab test (Code/shapes.cpp:55-72)
    vectorized over the block; `bound` is Euclidean (best_t / light dist),
    compared as t_near * |d|."""
    t_near = jnp.full(rb.ox.shape, -_INF, jnp.float32)
    t_far = jnp.full(rb.ox.shape, _INF, jnp.float32)
    miss = jnp.zeros(rb.ox.shape, jnp.bool_)
    for axis, (oo, dd) in enumerate(
        ((rb.ox, rb.dx), (rb.oy, rb.dy), (rb.oz, rb.dz))
    ):
        mn = cbox_ref[axis, col]
        mx = cbox_ref[axis + 3, col]
        par = jnp.abs(dd) < 1e-6
        d_safe = jnp.where(par, 1.0, dd)
        s1 = (mn - oo) / d_safe
        s2 = (mx - oo) / d_safe
        ent = jnp.where(par, -_INF, jnp.minimum(s1, s2))
        ext = jnp.where(par, _INF, jnp.maximum(s1, s2))
        miss = miss | (par & ((oo < mn) | (oo > mx)))
        t_near = jnp.maximum(t_near, ent)
        t_far = jnp.minimum(t_far, ext)
    hit = ~miss & (t_near <= t_far) & (t_far >= 0.0)
    hit = hit & (t_near * rb.dnorm <= bound)
    return jnp.max(jnp.where(hit & live, 1.0, 0.0)) > 0.0


def _closest_kernel(rays_ref, cbox_ref, table_ref, t_ref, id_ref, *, spec, chunk):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
        id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)

    act = rays_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        best_t = t_ref[0, :]

        @pl.when(_chunk_any_hit(rb, cbox_ref, j, best_t, act > 0.0))
        def _():
            best = lax.fori_loop(
                0,
                chunk,
                lambda g, cr: geom_step(g, cr, table_ref, rb, spec),
                (best_t, id_ref[0, :]),
            )
            t_ref[0, :] = best[0]
            id_ref[0, :] = best[1]


def _closest_n_kernel(
    rays_ref, cbox_ref, table_ref, t_ref, id_ref, n_ref, *, spec, chunk, nc
):
    """Closest hit + fused UNnormalized world normal; the winning normal
    rides VMEM across the chunk sweep and is normalized at the last chunk."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
        id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)
        n_ref[...] = jnp.zeros((3, BLOCK_R), jnp.float32)

    act = rays_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        best_t = t_ref[0, :]

        @pl.when(_chunk_any_hit(rb, cbox_ref, j, best_t, act > 0.0))
        def _():
            best = lax.fori_loop(
                0,
                chunk,
                lambda g, cr: geom_step_n(g, cr, table_ref, rb, spec),
                (best_t, id_ref[0, :], n_ref[0, :], n_ref[1, :], n_ref[2, :]),
            )
            t_ref[0, :] = best[0]
            id_ref[0, :] = best[1]
            n_ref[0, :] = best[2]
            n_ref[1, :] = best[3]
            n_ref[2, :] = best[4]

    @pl.when(j == nc - 1)
    def _():
        bnx, bny, bnz = n_ref[0, :], n_ref[1, :], n_ref[2, :]
        ln = jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz)
        ln = jnp.where(ln > 0.0, ln, 1.0)
        n_ref[0, :] = bnx / ln
        n_ref[1, :] = bny / ln
        n_ref[2, :] = bnz / ln


def _occlusion_kernel(
    rays_ref, maxt_ref, cbox_ref, table_ref, out_ref, *, spec, chunk
):
    """Any-hit: out = 1 once some geom blocks the lane before maxt.  The
    blocked mask itself rides the output block across the chunk sweep, so
    a fully-blocked block skips every remaining chunk."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = jnp.zeros((BLOCK_R,), jnp.float32)

    act = rays_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        maxt = maxt_ref[0, :]
        blocked = jnp.where(act > 0.0, out_ref[0, :], 1.0)
        open_lane = (act > 0.0) & (blocked < 1.0)

        @pl.when(
            (jnp.min(blocked) < 1.0)
            & _chunk_any_hit(rb, cbox_ref, j, maxt, open_lane)
        )
        def _():
            def cond(carry):
                g, blk = carry
                return (g < chunk) & (jnp.min(blk) < 1.0)

            def body(carry):
                g, blk = carry
                hit = jnp.zeros(blk.shape, jnp.float32)
                for i in range(OCC_CHUNK):
                    t_geom, _ = geom_t(g + i, table_ref, rb, spec)
                    hit = jnp.maximum(
                        hit, (t_geom <= maxt).astype(jnp.float32)
                    )
                return g + OCC_CHUNK, jnp.maximum(blk, hit)

            _, blk = lax.while_loop(cond, body, (jnp.int32(0), blocked))
            out_ref[0, :] = jnp.where(act > 0.0, blk, 0.0)


def _common_specs(with_maxt=False):
    in_specs = [
        pl.BlockSpec((8, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
    ]
    if with_maxt:
        in_specs.append(
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        )
    in_specs.append(
        pl.BlockSpec(memory_space=pltpu.SMEM)  # chunk boxes (6, NC), whole
    )
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _closest_call(rays, cbox, table, spec_key, chunk):
    r_pad = rays.shape[1]
    nc = table.shape[1] // chunk
    spec = dict(spec_key)
    kernel = functools.partial(_closest_kernel, spec=spec, chunk=chunk)
    t, pid = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R, nc),
        in_specs=_common_specs() + [
            pl.BlockSpec((17, chunk), lambda i, j: (0, j), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(rays, cbox, table)
    return t[0], pid[0]


_closest_call.defvjp(
    lambda rays, cbox, table, spec_key, chunk: (
        _closest_call(rays, cbox, table, spec_key, chunk), None
    ),
    lambda spec_key, chunk, _res, _ct: (None, None, None),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _closest_n_call(rays, cbox, table, spec_key, chunk):
    r_pad = rays.shape[1]
    nc = table.shape[1] // chunk
    spec = dict(spec_key)
    kernel = functools.partial(_closest_n_kernel, spec=spec, chunk=chunk, nc=nc)
    t, pid, n = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R, nc),
        in_specs=_common_specs() + [
            pl.BlockSpec((17, chunk), lambda i, j: (0, j), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((3, r_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(rays, cbox, table)
    return t[0], pid[0], n


_closest_n_call.defvjp(
    lambda rays, cbox, table, spec_key, chunk: (
        _closest_n_call(rays, cbox, table, spec_key, chunk), None
    ),
    lambda spec_key, chunk, _res, _ct: (None, None, None),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _occlusion_call(rays, maxt, cbox, table, spec_key, chunk):
    r_pad = rays.shape[1]
    nc = table.shape[1] // chunk
    spec = dict(spec_key)
    kernel = functools.partial(_occlusion_kernel, spec=spec, chunk=chunk)
    blocked = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R, nc),
        in_specs=_common_specs(with_maxt=True) + [
            pl.BlockSpec((17, chunk), lambda i, j: (0, j), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_R), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret(),
    )(rays, maxt, cbox, table)
    return blocked[0]


_occlusion_call.defvjp(
    lambda rays, maxt, cbox, table, spec_key, chunk: (
        _occlusion_call(rays, maxt, cbox, table, spec_key, chunk), None
    ),
    lambda spec_key, chunk, _res, _ct: (None, None, None, None),
)


def _chunk_of(scene: Scene) -> int:
    return scene.chunk_geoms.shape[0] // scene.chunk_boxes.shape[0]


def closest_hit_tid_chunks(scene: Scene, o, d, time, active=None, sort_rays=False):
    """Chunk-culled closest hit for beyond-SMEM scenes: (t, geom_id).
    Requires accel.lbvh.with_chunks(scene).

    sort_rays: restore block coherence first (kernels/ray_sort.py) so
    incoherent wavefronts cull chunks as well as camera tiles do."""
    assert scene.chunk_geoms is not None, "call accel.lbvh.with_chunks first"
    if sort_rays:
        from ray_tracying_tpu.kernels.ray_sort import sorted_closest_hit

        lo = lax.stop_gradient(jnp.min(scene.chunk_boxes[:, :3], axis=0))
        hi = lax.stop_gradient(jnp.max(scene.chunk_boxes[:, 3:], axis=0))
        return sorted_closest_hit(
            closest_hit_tid_chunks, scene, o, d, time, active, lo, hi
        )
    r = o.shape[0]
    rays, _ = pack_rays(o, d, time, active)
    spec_key = tuple(sorted(scene_spec(scene).items()))
    t, pid = _closest_call(
        rays,
        lax.stop_gradient(scene.chunk_boxes.T),
        lax.stop_gradient(scene.chunk_geoms.T),
        spec_key,
        _chunk_of(scene),
    )
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r]


def closest_hit_tid_n_chunks(scene: Scene, o, d, time, active=None):
    """Chunk-culled closest hit with fused world normals (inference path)."""
    assert scene.chunk_geoms is not None, "call accel.lbvh.with_chunks first"
    r = o.shape[0]
    rays, _ = pack_rays(o, d, time, active)
    spec_key = tuple(sorted(scene_spec(scene).items()))
    t, pid, n = _closest_n_call(
        rays,
        lax.stop_gradient(scene.chunk_boxes.T),
        lax.stop_gradient(scene.chunk_geoms.T),
        spec_key,
        _chunk_of(scene),
    )
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r], n[:, :r].T


def occluded_tid_chunks(scene: Scene, o, d, maxt, active=None):
    """Chunk-culled any-hit shadow test for beyond-SMEM scenes."""
    assert scene.chunk_geoms is not None, "call accel.lbvh.with_chunks first"
    r = o.shape[0]
    rays, r_pad = pack_rays(o, d, jnp.zeros(r, jnp.float32), active)
    mt = jnp.pad(maxt[None, :], ((0, 0), (0, r_pad - r)))
    spec_key = tuple(sorted(scene_spec(scene).items()))
    blocked = _occlusion_call(
        rays,
        lax.stop_gradient(mt),
        lax.stop_gradient(scene.chunk_boxes.T),
        lax.stop_gradient(scene.chunk_geoms.T),
        spec_key,
        _chunk_of(scene),
    )
    return blocked[:r] > 0.0
