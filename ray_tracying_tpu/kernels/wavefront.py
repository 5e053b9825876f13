"""Fused wavefront level megakernel: closest hit + material recovery +
Blinn-Phong prep + continuation spawn in ONE Pallas pass.

Motivation (xprof, bench scene, 4.2M-ray tile): the Pallas intersection
kernels cost ~43 ms of a ~194 ms level loop — the other ~150 ms is jnp
glue between them (ray packing/transposes, one-hot material gather,
shading math, spawn math, RNG), all of it liveness-INDEPENDENT, running
over every queue slot at every bounce level while the kernels skip dead
blocks.  Fusing the whole level body into the kernel makes the glue
inherit dead-block skipping and keeps every intermediate in registers.

Dataflow (all row-major (rows, R) f32, BLOCK-columned):

  queue pack     rows 0..8   [ox oy oz dx dy dz time act tp]
  level output   rows 0..8                 next queue pack (same layout)
                 rows 9(1+li)..9(2+li)-1   shadow pack, light li:
                                           [o3 d3 0 act maxt]
                 rows CB..CB+2             base contribution (ambient +
                                           miss-background, tp-weighted)
                 rows CB+3(1+li)..+2       light li contribution
                                           (pre-visibility, tp-weighted)
                 row  HR                   act_hit (stats)

The layout is chosen so the NEXT level's megakernel reads the previous
output tensor directly at row-block 0, and the shadow occlusion kernel
reads row-block 1+li — zero repacking between kernels, ever.  The level
loop in jnp shrinks to `accum += base + sum(contrib_li * visibility_li)`.

Scope (trace_wavefront gates; everything else takes the general path):
no textures, no refraction, point lights only (radius 0 -> exactly 1
hard-shadow sample, Code/raytracer.cpp:207), scene table + material
columns fit SMEM.  Semantics are the reference's, cited inline; glossy
fuzz uses an in-kernel counter-based hash RNG (per global lane) instead
of the host threefry stream — a different stream of the same
distribution, covered by the stochastic-tolerance contract (SURVEY.md §7
controlled deviations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.kernels.closest_hit import (
    OCC_CHUNK,
    RayBlock,
    _kind_spec,
    geom_step_n,
    geom_t,
    pallas_interpret,
)
from ray_tracying_tpu.kernels.geom_table import (
    GEOM_COLS,
    pack_geom_table_shaded,
    pack_light_table,
)
from ray_tracying_tpu.scene.types import Scene

_INF = float("inf")
_TINY = 1e-20

# Rays per block.  Smaller than the intersection kernels' 2048: the fused
# kernel keeps ~20 live vectors through its loops and spills at 2048.
WAVE_BLOCK = 2048

# The shaded table is (29, G) f32 in SMEM (~116 B/geom); cap well under
# the ~1 MB SMEM budget with double-buffering headroom.
WAVE_MAX_GEOMS = 6144

Q_ROWS = 9


def out_rows(n_lights: int) -> int:
    return 9 * (1 + n_lights) + 3 * (1 + n_lights) + 1


def _contrib_base(n_lights: int) -> int:
    return 9 * (1 + n_lights)


def _hash_u01(seed0, seed1, lane, stream: int):
    """Counter-based uniform [0,1) from a lowbias32-style integer hash —
    pure vector integer ops, so it runs identically under Mosaic and the
    interpreter (pltpu.prng_* has no CPU-interpret lowering)."""
    x = lane.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    x = x + seed0.astype(jnp.uint32)
    x = x ^ (
        seed1.astype(jnp.uint32)
        + jnp.uint32((stream * 0x85EBCA6B) & 0xFFFFFFFF)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # Mosaic has no uint32->f32 cast; the 24-bit value fits int32 exactly.
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))


def _unit_ball_sample(seed_ref, w, pid):
    """Uniform-in-unit-ball: direction from a Box-Muller gaussian triple,
    radius = U^(1/3) (the reference rejection sampler's target
    distribution, Code/raytracer.cpp:152-171).  Counter-based per global
    lane, so every block draws an independent stream.  pid is hoisted to
    the kernel top level (program_id inside a pl.when body breaks the
    CPU interpreter)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0] + pid * w
    u = [
        _hash_u01(seed_ref[0], seed_ref[1], lane, k) for k in range(5)
    ]
    u0 = jnp.maximum(u[0], 1e-7)
    u2 = jnp.maximum(u[2], 1e-7)
    r0 = jnp.sqrt(-2.0 * jnp.log(u0))
    r2 = jnp.sqrt(-2.0 * jnp.log(u2))
    two_pi = 6.2831853
    gx = r0 * jnp.cos(two_pi * u[1])
    gy = r0 * jnp.sin(two_pi * u[1])
    gz = r2 * jnp.cos(two_pi * u[3])
    gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = 1.0 / jnp.maximum(gn, _TINY)
    rad = jnp.exp(jnp.log(jnp.maximum(u[4], 1e-7)) / 3.0)
    return gx * inv * rad, gy * inv * rad, gz * inv * rad


def _wave_kernel(
    seed_ref, q_ref, fuzz_ref, table_ref, light_ref, out_ref,
    *, ranges, motion, n_lights, n_geoms, glossy, min_tp, ablate=(),
):
    w = out_ref.shape[1]
    cb = _contrib_base(n_lights)
    hr = cb + 3 * (1 + n_lights)
    out_ref[...] = jnp.zeros((out_rows(n_lights), w), jnp.float32)

    act = q_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(q_ref)
        tp = q_ref[8, :]
        live = act > 0.0

        # --- closest hit + winning normal (Code/acceleration.cpp:103-118)
        zero = jnp.zeros((w,), jnp.float32)
        best = (
            jnp.full((w,), _INF, jnp.float32),
            jnp.full((w,), -1, jnp.int32),
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
        hit_f = jnp.isfinite(best_t) & live
        act_hit = jnp.where(hit_f, 1.0, 0.0)
        w_miss = jnp.where(live & ~jnp.isfinite(best_t), tp, 0.0)

        ln = jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz)
        inv_n = 1.0 / jnp.maximum(ln, _TINY)
        nx, ny, nz = bnx * inv_n, bny * inv_n, bnz * inv_n

        # --- material recovery: one select sweep over the table's id
        # column (cheaper than carrying 12 columns through the hit loop;
        # best_id from geom_step_n is the geom's ORIGINAL id, col 16, and
        # the shaded table's material rows are row-aligned — so match on
        # the id column, not the row number).
        best_id_f = best_id.astype(jnp.float32)

        def mat_step(g, cols):
            # Float compare against the id column: ids are small integers,
            # exact in f32; avoids a scalar round+cast stalling each
            # iteration's vector pipeline.
            sel = best_id_f == table_ref[16, g]
            return tuple(
                jnp.where(sel, table_ref[GEOM_COLS + c, g], cols[c])
                for c in range(12)
            )

        if 'mat' in ablate:
            mat = tuple(zero + 0.5 for _ in range(12))
        else:
            mat = lax.fori_loop(0, n_geoms, mat_step, (zero,) * 12)
        dr, dg, db, sr, sg, sb, ka, kd, ks, shin, rough, refl = mat

        # --- hit point & view (V = normalize(origin - point) == -d for
        # unit d, Code/raytracer.cpp:197)
        t_fin = jnp.where(hit_f, best_t, 0.0)
        px = rb.ox + t_fin * rb.dx
        py = rb.oy + t_fin * rb.dy
        pz = rb.oz + t_fin * rb.dz
        vx, vy, vz = -rb.dx, -rb.dy, -rb.dz

        # local weight max(0, 1 - refl - trans), trans == 0 in this path
        # (Code/raytracer.cpp:346-350)
        w_local = jnp.where(hit_f, tp * jnp.maximum(0.0, 1.0 - refl), 0.0)

        # --- base contribution: ambient (Code/raytracer.cpp:194) + miss
        # background (:296-298)
        amb = ka * w_local
        out_ref[cb + 0, :] = dr * amb + C.BACKGROUND_RGB[0] * w_miss
        out_ref[cb + 1, :] = dg * amb + C.BACKGROUND_RGB[1] * w_miss
        out_ref[cb + 2, :] = db * amb + C.BACKGROUND_RGB[2] * w_miss

        # --- per point light: Blinn-Phong from the light center
        # (Code/raytracer.cpp:244-262) + hard shadow ray (radius 0 -> one
        # sample at the center, :207)
        sox = px + nx * C.EPS_NORMAL_OFFSET
        soy = py + ny * C.EPS_NORMAL_OFFSET
        soz = pz + nz * C.EPS_NORMAL_OFFSET
        for li in range(0 if 'lights' in ablate else n_lights):
            lpx, lpy, lpz = light_ref[0, li], light_ref[1, li], light_ref[2, li]
            lr, lg, lb = light_ref[3, li], light_ref[4, li], light_ref[5, li]
            inten = light_ref[6, li]
            lvx, lvy, lvz = lpx - px, lpy - py, lpz - pz
            d2 = lvx * lvx + lvy * lvy + lvz * lvz
            dist = jnp.sqrt(d2)
            inv_d = 1.0 / jnp.maximum(dist, _TINY)
            lcx, lcy, lcz = lvx * inv_d, lvy * inv_d, lvz * inv_d
            ndotl = jnp.maximum(0.0, nx * lcx + ny * lcy + nz * lcz)
            hx, hy, hz = lcx + vx, lcy + vy, lcz + vz
            hn = jnp.sqrt(hx * hx + hy * hy + hz * hz)
            inv_h = 1.0 / jnp.maximum(hn, _TINY)
            ndoth = jnp.maximum(
                0.0, nx * hx * inv_h + ny * hy * inv_h + nz * hz * inv_h
            )
            # pow(0, s) == 0 with a finite-gradient guard (render/shade.py)
            spec_i = jnp.where(
                ndoth > 0.0,
                jnp.exp(shin * jnp.log(jnp.maximum(ndoth, 1e-12))),
                0.0,
            )
            atten = (
                C.ATTEN_NUM * inten
                / (C.ATTEN_C0 + C.ATTEN_C1 * dist + C.ATTEN_C2 * d2)
            )
            scale = atten * w_local
            cr = lr * (dr * kd * ndotl + sr * ks * spec_i) * scale
            cg = lg * (dg * kd * ndotl + sg * ks * spec_i) * scale
            cbv = lb * (db * kd * ndotl + sb * ks * spec_i) * scale
            out_ref[cb + 3 * (1 + li) + 0, :] = cr
            out_ref[cb + 3 * (1 + li) + 1, :] = cg
            out_ref[cb + 3 * (1 + li) + 2, :] = cbv
            # zero-contribution lanes skip visibility (result unchanged;
            # feeds the occlusion kernel's early exit)
            needs = (cr != 0.0) | (cg != 0.0) | (cbv != 0.0)
            s_act = jnp.where(hit_f & needs, 1.0, 0.0)
            srow = 9 * (1 + li)
            out_ref[srow + 0, :] = sox
            out_ref[srow + 1, :] = soy
            out_ref[srow + 2, :] = soz
            out_ref[srow + 3, :] = lcx
            out_ref[srow + 4, :] = lcy
            out_ref[srow + 5, :] = lcz
            # row 6 stays 0 (shadow time, Code/shapes.hpp:28)
            out_ref[srow + 7, :] = s_act
            out_ref[srow + 8, :] = dist

        # --- reflection continuation (Code/raytracer.cpp:307-333)
        ddn = rb.dx * nx + rb.dy * ny + rb.dz * nz
        rdx = rb.dx - 2.0 * ddn * nx
        rdy = rb.dy - 2.0 * ddn * ny
        rdz = rb.dz - 2.0 * ddn * nz
        if glossy and 'glossy' not in ablate:
            # Fuzz sampled OUTSIDE the kernel (XLA's transcendentals are
            # ~50x faster than Mosaic's; measured 58 ms vs ~1 ms per 4M
            # lanes) and fed in as (3, R) rows.
            fx = fuzz_ref[0, :]
            fy = fuzz_ref[1, :]
            fz = fuzz_ref[2, :]
            gx = rdx + rough * fx
            gy = rdy + rough * fy
            gz = rdz + rough * fz
            gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            inv_g = 1.0 / jnp.maximum(gn, _TINY)
            gx, gy, gz = gx * inv_g, gy * inv_g, gz * inv_g
            below = (gx * nx + gy * ny + gz * nz) < 0.0
            gx = jnp.where(below, 0.0, gx)
            gy = jnp.where(below, 0.0, gy)
            gz = jnp.where(below, 0.0, gz)
            isg = rough > 0.0
            rdx = jnp.where(isg, gx, rdx)
            rdy = jnp.where(isg, gy, rdy)
            rdz = jnp.where(isg, gz, rdz)
        tp2 = tp * refl
        rd2 = rdx * rdx + rdy * rdy + rdz * rdz
        ok = hit_f & (refl > 0.0) & (rd2 > C.EPS_GLOSSY_DIR2)
        if min_tp > 0.0:
            ok = ok & (tp2 > min_tp)
        out_ref[0, :] = sox
        out_ref[1, :] = soy
        out_ref[2, :] = soz
        out_ref[3, :] = rdx
        out_ref[4, :] = rdy
        out_ref[5, :] = rdz
        # row 6 stays 0 (secondary time, Code/shapes.hpp:28)
        out_ref[7, :] = jnp.where(ok, 1.0, 0.0)
        out_ref[8, :] = jnp.where(ok, tp2, 0.0)
        out_ref[hr, :] = act_hit


def _occ9_kernel(rays_ref, table_ref, out_ref, *, ranges, motion, srow):
    """Any-hit on the shadow row group starting at `srow` of the level
    output tensor (act at srow+7, maxt at srow+8); otherwise identical to
    closest_hit._occlusion_kernel incl. the block early exit."""
    act = rays_ref[srow + 7, :]
    w = out_ref.shape[1]
    out_ref[0, :] = jnp.zeros((w,), jnp.float32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref, base=srow)
        maxt = rays_ref[srow + 8, :]
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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11)
)
def wave_level_call(
    out_prev, seed, fuzz, table, lights, ranges, motion, n_lights, n_geoms,
    glossy, min_tp, ablate=(),
):
    """One bounce level.  out_prev: the previous level's (OUT_ROWS, R_pad)
    output (or the primary bootstrap tensor); the queue is its row-block 0."""
    r_pad = out_prev.shape[1]
    rows = out_rows(n_lights)
    kernel = functools.partial(
        _wave_kernel,
        ranges=ranges, motion=motion, n_lights=n_lights, n_geoms=n_geoms,
        glossy=glossy, min_tp=min_tp, ablate=ablate,
    )
    # Input block = the FULL row dimension (Mosaic requires block rows
    # divisible by 8 or equal to the array's); the kernel reads only the
    # queue rows 0..8 — the extra rows are a few hundred MB/s of DMA,
    # noise next to the repacking they replace.
    return pl.pallas_call(
        kernel,
        grid=(r_pad // WAVE_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (2,)
            pl.BlockSpec(
                (out_prev.shape[0], WAVE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, WAVE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),  # glossy fuzz rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shaded geom table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
        ],
        out_specs=pl.BlockSpec(
            (rows, WAVE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, r_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(seed, out_prev, fuzz, table, lights)


wave_level_call.defvjp(
    lambda out_prev, seed, fuzz, table, lights, *nd: (
        wave_level_call(out_prev, seed, fuzz, table, lights, *nd), None
    ),
    lambda *args: (None, None, None, None, None),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def occluded9_call(out_lvl, table, light_idx, ranges, motion):
    """Shadow visibility for light `light_idx`, reading the level output's
    shadow row-block directly.  Returns blocked (1, R_pad) f32."""
    r_pad = out_lvl.shape[1]
    kernel = functools.partial(
        _occ9_kernel, ranges=ranges, motion=motion,
        srow=Q_ROWS * (1 + light_idx),
    )
    return pl.pallas_call(
        kernel,
        grid=(r_pad // WAVE_BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (out_lvl.shape[0], WAVE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, WAVE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(out_lvl, table)


occluded9_call.defvjp(
    lambda out_lvl, table, *nd: (occluded9_call(out_lvl, table, *nd), None),
    lambda *args: (None, None),
)


def wave_supported(scene: Scene) -> bool:
    """Static gate for the fused level path (see module docstring)."""
    return (
        0 < scene.n_geoms <= WAVE_MAX_GEOMS
        and not scene.has_textures
        and not scene.has_refraction
        and scene.n_lights <= 4
        and not any(scene.lights.is_area)
    )


def wave_tables(scene: Scene):
    """(shaded table (29, G) transposed for SMEM, static kind ranges,
    occlusion table + ranges, light table (8, L))."""
    from ray_tracying_tpu.kernels.geom_table import pack_geom_table_sorted

    table, ranges = pack_geom_table_shaded(scene)
    occ_table, occ_ranges = pack_geom_table_sorted(scene, chunk=OCC_CHUNK)
    lights = pack_light_table(scene)
    return (
        lax.stop_gradient(table.T),
        ranges,
        lax.stop_gradient(occ_table.T),
        occ_ranges,
        lax.stop_gradient(lights),
    )
