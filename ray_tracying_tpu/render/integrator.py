"""Iterative wavefront Whitted integrator.

The reference's recursive `Trace` (Code/raytracer.cpp:280-351) is a binary
recursion (reflection + refraction children) to depth 11.  On TPU the
recursion is flattened into 11 bounce passes under `lax.scan` (the body is
shape-invariant, so XLA compiles ONE level and the recursion depth becomes
a trip count).

Two queue disciplines, chosen statically from the scene:

  IN-SLOT (branching factor 1 — no material both reflects and refracts):
    each ray has at most one continuation, which overwrites its own queue
    slot.  No compaction, no scatters: radiance accumulates elementwise
    into accum[slot].  This is the fast path (the bundled bvh scene and
    most scenes take it); masked-out lanes are cheap on the VPU, scatters
    are not.

  COMPACTED (some material reflects AND some refracts):
    slots carry an explicit dest index; both children are emitted and
    stream-compacted (stable multi-operand lax.sort on the dead flag —
    XLA scatters serialize on TPU, sorts don't) into a queue of capacity
    R * queue_mult; radiance accumulates via sort-by-dest + segment_sum.
    Overflow beyond capacity is dropped in compaction order — a
    documented deviation that only triggers on mirror+glass scenes deeper
    than log2(queue_mult) simultaneous branchings.

Level semantics (identical in both paths, all cited):
  - miss -> background 0.1 gray weighted by path throughput
    (Code/raytracer.cpp:296-298)
  - local shading weighted by throughput * max(0, 1 - refl - trans)
    (Code/raytracer.cpp:346-350)
  - children spawned at the depth-10 level are never traced: at depth 11
    the reference returns black (raytracer.cpp:290-292), so their
    contribution is identically zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.core.sampling import uniform_in_unit_sphere
from ray_tracying_tpu.core.vecmath import (
    dot,
    normalize,
    reflect,
    refract,
    safe_arcsin,
)
from ray_tracying_tpu.render.intersect import closest_hit
from ray_tracying_tpu.render.materials import gather_materials
from ray_tracying_tpu.render.shade import shade
from ray_tracying_tpu.scene.types import Scene


class _Queue(NamedTuple):
    o: jnp.ndarray       # (Cap, 3)
    d: jnp.ndarray       # (Cap, 3)
    time: jnp.ndarray    # (Cap,)
    tp: jnp.ndarray      # (Cap,) scalar throughput
    dest: jnp.ndarray    # (Cap,) int32 primary-sample index
    active: jnp.ndarray  # (Cap,) bool


class TraceStats(NamedTuple):
    """Per-level integrator counters (one row per bounce level).

    The reference has no observability at all (SURVEY.md §5); these are the
    TPU build's per-pass instrumentation — in particular `dropped` makes the
    compacted queue's overflow policy (see _compact) impossible to miss."""

    live: jnp.ndarray     # (L,) int32 — active queue slots entering the level
    hits: jnp.ndarray     # (L,) int32 — rays that hit geometry this level
    spawned: jnp.ndarray  # (L,) int32 — continuations emitted by this level
    dropped: jnp.ndarray  # (L,) int32 — continuations lost to queue overflow


def _compact(cands: _Queue, keep: jnp.ndarray, capacity: int):
    """Stream-compact candidate slots where keep is True into a queue of
    `capacity` slots; overflow beyond capacity is dropped in order.
    Returns (queue, dropped) where dropped counts the lost continuations
    (always surfaced through TraceStats so the loss cannot be silent).

    Implemented as ONE stable multi-operand lax.sort on the dead flag:
    XLA lowers a scatter with computed indices to a serial per-element
    loop on TPU (measured ~380ms for 4M slots vs ~39ms for the sort), so
    cumsum-scatter compaction is off the table."""
    n_keep = jnp.sum(keep.astype(jnp.int32))
    count = jnp.minimum(n_keep, capacity)
    dropped = n_keep - count
    dead = jnp.where(keep, 0, 1).astype(jnp.int32)
    ops = jax.lax.sort(
        (
            dead,
            cands.o[:, 0], cands.o[:, 1], cands.o[:, 2],
            cands.d[:, 0], cands.d[:, 1], cands.d[:, 2],
            cands.time, cands.tp, cands.dest,
        ),
        num_keys=1,
        is_stable=True,
    )
    (_, ox, oy, oz, dx, dy, dz, time, tp, dest) = (
        op[:capacity] for op in ops
    )
    q = _Queue(
        o=jnp.stack([ox, oy, oz], axis=1),
        d=jnp.stack([dx, dy, dz], axis=1),
        time=time,
        tp=tp,
        dest=dest,
        active=jnp.arange(capacity) < count,
    )
    return q, dropped


def _cat(queues) -> _Queue:
    return _Queue(*(jnp.concatenate(f, axis=0) for f in zip(*queues)))


def _spawn_reflection(scene, q, hit, mrec, act, k_level, capacity, min_tp):
    """Reflection continuation (Code/raytracer.cpp:307-333)."""
    rdir = reflect(q.d, hit.normal)
    if scene.has_glossy:
        # Glossy fuzz: normalize(R + roughness * unit_sphere); rays
        # perturbed below the surface are absorbed (raytracer.cpp:312-327).
        fuzz = uniform_in_unit_sphere(jax.random.fold_in(k_level, 1), (capacity,))
        pert = normalize(rdir + mrec.roughness[:, None] * fuzz)
        pert = jnp.where((dot(pert, hit.normal) < 0.0)[:, None], 0.0, pert)
        rdir = jnp.where((mrec.roughness > 0.0)[:, None], pert, rdir)
    tp = q.tp * mrec.reflectivity
    ok = act & (mrec.reflectivity > 0.0) & (dot(rdir, rdir) > C.EPS_GLOSSY_DIR2)
    if min_tp > 0.0:
        ok = ok & (tp > min_tp)
    return _Queue(
        o=hit.point + hit.normal * C.EPS_NORMAL_OFFSET,
        d=rdir,
        # Secondary rays carry time = 0 (Ray default, Code/shapes.hpp:28).
        time=jnp.zeros(capacity),
        tp=tp,
        dest=q.dest,
        active=ok,
    )


def _spawn_refraction(scene, q, hit, mrec, act, capacity, min_tp):
    """Refraction continuation (Code/raytracer.cpp:335-344)."""
    tdir, n_eff = refract(q.d, hit.normal, mrec.ior)
    tp = q.tp * mrec.transparency
    ok = act & (mrec.transparency > 0.0) & (dot(tdir, tdir) > C.EPS_REFRACT_DIR2)
    if min_tp > 0.0:
        ok = ok & (tp > min_tp)
    return _Queue(
        o=hit.point - n_eff * C.EPS_NORMAL_OFFSET,
        d=tdir,
        time=jnp.zeros(capacity),
        tp=tp,
        dest=q.dest,
        active=ok,
    )


def _spawn_one_way(scene, q, hit, mrec, act, k_level, capacity, min_tp):
    """At-most-one continuation per ray: reflection-only and
    refraction-only scenes spawn their single kind; MIXED one-way scenes
    (mirrors and glass on DIFFERENT materials, scene.has_two_way False)
    pick per lane by the hit material — transparency > 0 takes the
    refraction branch, else reflectivity > 0 the reflection branch.  Both
    stay in-slot because no lane ever emits two children."""
    if scene.has_reflection and not scene.has_refraction:
        return _spawn_reflection(
            scene, q, hit, mrec, act, k_level, capacity, min_tp
        )
    if scene.has_refraction and not scene.has_reflection:
        return _spawn_refraction(scene, q, hit, mrec, act, capacity, min_tp)
    q_refl = _spawn_reflection(
        scene, q, hit, mrec, act, k_level, capacity, min_tp
    )
    q_refr = _spawn_refraction(scene, q, hit, mrec, act, capacity, min_tp)
    use_refr = mrec.transparency > 0.0
    pick = lambda a, b: jnp.where(
        use_refr[:, None] if a.ndim == 2 else use_refr, a, b
    )
    return _Queue(*(pick(a, b) for a, b in zip(q_refr, q_refl)))


def _wave_tex_modulate(scene: Scene, out):
    """Texture modulation for the fused path's split contribution: the
    megakernel emits the texture-pending diffuse part D (rows C_BASE..)
    plus the winner's (u, v, atlas slot); the nearest-neighbor atlas fetch
    (Code/material.hpp:99-134: v flipped, C-style truncation, texel
    multiplies the base diffuse tint already inside D) runs here in XLA —
    gathers are fast in XLA and have no efficient Mosaic lowering.

    Scenes with textured spheres also run the spherical UV trig here
    (Code/shapes.cpp:257-259): atan2/arcsin have no Mosaic lowering, so
    sphere lanes arrive as the raw object-space hit point (u,v rows carry
    plx,ply; rows UV_BASE+3/4 carry plz and the winner kind)."""
    from ray_tracying_tpu.kernels.wavefront import C_BASE, S_BASE, UV_BASE

    u = out[UV_BASE + 0]
    v = out[UV_BASE + 1]
    if scene.has_spheres:
        plx, ply, plz = u, v, out[UV_BASE + 3]
        kindv = out[UV_BASE + 4]
        pi = jnp.float32(3.14159265358979)
        u_s = 0.5 + jnp.arctan2(plz, plx) / (2.0 * pi)
        v_s = 0.5 - safe_arcsin(jnp.clip(ply, -1.0, 1.0)) / pi
        sel = kindv == 0.0
        u = jnp.where(sel, u_s, u)
        v = jnp.where(sel, v_s, v)
    tid = jnp.round(out[UV_BASE + 2]).astype(jnp.int32)
    tid_safe = jnp.maximum(tid, 0)
    wh = scene.tex_wh[tid_safe]  # (R, 2) = (w, h)
    tw = wh[:, 0].astype(jnp.float32)
    th = wh[:, 1].astype(jnp.float32)
    x = jnp.clip(jnp.floor(u * (tw - 1.0)), 0, tw - 1).astype(jnp.int32)
    y = jnp.clip(jnp.floor((1.0 - v) * (th - 1.0)), 0, th - 1).astype(jnp.int32)
    t_n, t_h, t_w, _ = scene.tex_atlas.shape
    flat = scene.tex_atlas.reshape(t_n * t_h * t_w, 3)
    texel = flat[(tid_safe * t_h + y) * t_w + x]  # (R, 3) XLA gather
    tex = jnp.where((tid >= 0)[:, None], texel, 1.0).T  # (3, R)
    return out[C_BASE : C_BASE + 3] * tex + out[S_BASE : S_BASE + 3]


# Default fused-path queue-shrink schedule: (level, factor) pairs applied
# cumulatively — levels 0-1 run full width, levels 2-3 at 1/4, 4+ at 1/8.
# Capacity must clear the WORST-tile group occupancy, not the frame
# average: on the flagship the densest 136-row tile enters level 2 with
# live lanes in 17.3% of 256-lane groups (frame average 8.8%) and level 4
# at 7.75%, so the r4 ((2,8),(4,2)) schedule would drop rays.  ((2,4),
# (4,2)) keeps 1.44x / 1.61x worst-tile headroom; with group-granular
# compaction the machinery is cheap enough that the wider widths cost
# almost nothing.  Overflow drops dimmest-first, is counted in
# TraceStats.dropped, and triggers a host-side RuntimeWarning from the
# render pipeline — a test pins dropped == 0 for all committed demo
# scenes.
WAVE_SHRINK_AUTO = ((2, 4), (4, 2))

# Conservative schedule for SPARSE liveness regimes (low spp: no
# per-pixel lane clumps, so live lanes fragment across many groups).
# Caps 50% / 25% / 12.5% of groups at levels 2 / 4 / 6 against measured
# flagship 1-spp group occupancies of ~8% / 3% / 1.6% — including the
# glossy-fuzz decorrelation that made ((2,4),(4,2)) drop a handful of
# rays at 1 spp.
WAVE_SHRINK_SPARSE = ((2, 2), (4, 2), (6, 2))

# Shrink-compaction granularity: whole contiguous groups of this many
# lanes are kept or dropped together.  Group granularity is what makes
# the compaction nearly free on TPU (measured r5, 4.2M-lane tile):
# lane-level selection cost 74 ms/tile — a 2-op sort of 4.2M lanes
# (21 ms) + a 9-row per-lane gather (31 ms) + a fold-back segment_sum
# over 4.2M segments, i.e. an XLA scatter (34 ms 2 stages) — while the
# group version sorts 16k per-group keys (~0), gathers contiguous
# (rows, 1, G) chunks, and folds back with a segment_sum over only
# w/G unique group ids.  Lanes cluster heavily (spp-minor ray order +
# spatially coherent bounce liveness: 6.3% live lanes entering level 2
# occupy 8.8% of 256-lane groups on the flagship), so the capacity loss
# vs lane granularity is small; overflow still drops dimmest-first
# (per-group max throughput) and is counted in TraceStats.dropped.
# 128 rather than 256: the flagship's glossy fuzz decorrelates
# deep-bounce liveness enough that 256-lane groups overflowed the
# level-4 stage of the densest tile by ~1.5% of continuations.
WAVE_SHRINK_GROUP = 128


def _trace_wave(
    scene: Scene, o, d, times, key, light_samples, min_tp, return_stats,
    max_depth, shrink=WAVE_SHRINK_AUTO, kernel_tex=None,
    return_dropped=False, differentiable=False,
):
    """Fused-level fast path: the whole per-level body (closest hit,
    material recovery, Blinn-Phong, shadow VISIBILITY — in-kernel any-hit,
    1 hard-shadow sample per point light exactly like the reference
    (Code/raytracer.cpp:207), light_samples jittered rays per area light —
    texture UV recovery, reflection/refraction spawn) runs as ONE Pallas
    megakernel per level, chained through a shared row-major tensor — see
    kernels/wavefront.py.  The per-level glue is one accumulate (plus one
    atlas gather for textured scenes).

    shrink: tuple of (level, factor) queue-compaction points.  Bounce
    levels go mostly dead fast (the bundled scene is 6.3% live entering
    level 2, 1.3% entering level 4) yet every level otherwise pays
    full-width kernel dispatch + DMA (~14-19 ms/level at 4M rays even at
    0.1% live — PROFILE_r4.json).  At each shrink point the queue is
    sort-compacted ONCE (2-operand sort of (priority key, slot index) +
    a 9-row gather — scatters serialize on TPU, sorts don't) into a
    width divided by `factor`; deeper levels run at the smaller width and
    their contributions are folded back per original slot at the end
    (sort-by-dest + segment_sum).  Live lanes beyond the shrunk capacity
    are dropped lowest-throughput-first (bounded image error tp * L_max,
    same argument as min_throughput) and counted in TraceStats.dropped."""
    from ray_tracying_tpu.kernels.wavefront import (
        C_BASE,
        Q_ROWS,
        WAVE_BLOCK,
        hit_row,
        out_rows,
        pack_tex_matrix,
        tex_kernel_supported,
        wave_level_call,
        wave_tables,
    )

    r = o.shape[0]
    r_pad = -(-r // WAVE_BLOCK) * WAVE_BLOCK
    n_l = scene.n_lights
    has_tex = scene.has_textures
    # Texture sampling: in-kernel one-hot matmul when the atlas fits the
    # caps (tex_kernel_supported; kernel_tex=False forces the XLA-glue
    # path for A/B testing), else per-level _wave_tex_modulate glue.
    ktex = (
        tex_kernel_supported(scene) if kernel_tex is None else
        (kernel_tex and tex_kernel_supported(scene))
    )
    tex_glue = has_tex and not ktex
    sphere_uv = tex_glue and scene.has_spheres
    # Differentiable mode: the kernel records its discrete decisions
    # (winner id, per-light visibility, texel) in extra rows; the level
    # custom VJP replays them through kernels/wave_ref.py.
    record = (1 + n_l + (3 if ktex else 0)) if differentiable else 0
    rows = out_rows(tex_glue, sphere_uv) + record
    hr = hit_row(tex_glue, sphere_uv)
    table, ranges, lights = wave_tables(scene, stop_grad=not differentiable)
    if ktex:
        tex_m, twh = pack_tex_matrix(scene)
    else:
        tex_m = jnp.zeros((8, 128), jnp.bfloat16)
        twh = jnp.zeros((2, 1), jnp.float32)
    area = tuple(scene.lights.is_area)
    uv_kinds = (
        scene.has_spheres, scene.has_cubes, scene.has_rects,
        scene.n_planes > 0,
    )

    qrows = jnp.concatenate(
        [
            o.T, d.T, times[None, :],
            jnp.ones((2, r), jnp.float32),  # act = 1, tp = 1
        ],
        axis=0,
    )
    if not differentiable:
        qrows = jax.lax.stop_gradient(qrows)
    boot = jnp.pad(qrows, ((0, rows - Q_ROWS), (0, r_pad - r)))

    levels = (
        (max_depth + 1)
        if (scene.has_reflection or scene.has_refraction)
        else 1
    )

    def level_fuzz(k_level, width):
        """XLA-sampled unit-ball rows: glossy fuzz first, then 3 rows per
        area-light shadow sample.  Same sampler family as the general
        path (_spawn_reflection / shade), different stream — covered by
        the stochastic-tolerance contract."""
        parts = []
        if scene.has_glossy:
            parts.append(
                uniform_in_unit_sphere(
                    jax.random.fold_in(k_level, 1), (width,)
                ).T
            )
        for li in range(n_l):
            if not area[li]:
                continue
            s = uniform_in_unit_sphere(
                jax.random.fold_in(k_level, 2 + li), (width, light_samples)
            )  # (width, S, 3)
            parts.append(s.transpose(1, 2, 0).reshape(3 * light_samples, width))
        if not parts:
            return jnp.zeros((1, width), jnp.float32)
        return jnp.concatenate(parts, axis=0)

    def make_body(width):
        def body(carry, depth):
            accum, prev = carry
            k_level = jax.random.fold_in(key, depth)
            fuzz = jax.lax.stop_gradient(level_fuzz(k_level, width))
            out = wave_level_call(
                prev, fuzz, table, lights, tex_m, twh, ranges,
                scene.has_motion, n_l, scene.has_glossy,
                scene.has_refraction, min_tp, has_tex, uv_kinds, area,
                light_samples, ktex, record,
            )
            if tex_glue:
                contrib = _wave_tex_modulate(scene, out)
            else:
                contrib = out[C_BASE : C_BASE + 3]
            accum = accum + contrib
            if return_stats:
                row = (
                    jnp.sum((prev[7] > 0).astype(jnp.int32)),
                    jnp.sum((out[hr] > 0).astype(jnp.int32)),
                    jnp.sum((out[7] > 0).astype(jnp.int32)),
                    jnp.int32(0),
                )
            else:
                row = None
            return (accum, out), row

        return body

    # --- stage plan: widths per shrink point; entries that cannot reduce
    # the (WAVE_BLOCK-quantized) width are dropped.
    sched = sorted(
        (lv, f) for lv, f in (shrink or ()) if 0 < lv < levels and f > 1
    )
    bounds = [0]
    widths = [r_pad]
    for lv, f in sched:
        w_new = max(WAVE_BLOCK, -(-(widths[-1] // f) // WAVE_BLOCK) * WAVE_BLOCK)
        if w_new < widths[-1] and lv > bounds[-1]:
            bounds.append(lv)
            widths.append(w_new)
    bounds.append(levels)

    prev = boot
    dest = None
    accum = jnp.zeros((3, r_pad), jnp.float32)
    stage_accums = []   # [(accum_c, dest)] for stages > 0
    stat_stages = []
    drop_updates = []   # [(level_idx, count)]
    for si in range(len(bounds) - 1):
        lo, hi = bounds[si], bounds[si + 1]
        w = widths[si]
        if si > 0:
            # Group-granular compaction (see WAVE_SHRINK_GROUP): keep
            # whole contiguous G-lane groups, live groups ordered by
            # descending max-throughput, dead groups last — overflow
            # drops the dimmest groups first.  The sort is over n_g
            # per-group keys (not lanes), the queue gather moves
            # contiguous (rows, 1, G) chunks, and fold-back becomes a
            # w/G-index segment_sum — together ~70 ms/tile cheaper than
            # lane-level selection at bench width (module comment).
            G = WAVE_SHRINK_GROUP
            w_prev = prev.shape[1]
            n_g = w_prev // G
            n_s = w // G
            act_g = (prev[7] > 0.0).reshape(n_g, G)
            tp_g = jnp.max(prev[8].reshape(n_g, G), axis=1)
            live_g = jnp.any(act_g, axis=1)
            prio = jnp.where(live_g, -tp_g, jnp.inf)
            gidx = jnp.arange(n_g, dtype=jnp.int32)
            _, gsel = jax.lax.sort((prio, gidx), num_keys=1, is_stable=True)
            sel = jax.lax.stop_gradient(gsel[:n_s])
            q = jnp.take(
                prev[:Q_ROWS].reshape(Q_ROWS, n_g, G), sel, axis=1
            ).reshape(Q_ROWS, w)
            prev = jnp.pad(q, ((0, rows - Q_ROWS), (0, 0)))
            dest = sel if dest is None else jnp.take(dest, sel)
            live_cnt = jnp.sum(act_g.astype(jnp.int32), axis=1)
            kept = jnp.sum(jnp.take(live_cnt, sel))
            drop_updates.append((lo, jnp.sum(live_cnt) - kept))
            accum_s = jnp.zeros((3, w), jnp.float32)
        else:
            accum_s = accum
        (accum_s, prev), rows_st = jax.lax.scan(
            make_body(w), (accum_s, prev),
            jnp.arange(lo, hi, dtype=jnp.int32),
        )
        if return_stats:
            stat_stages.append(rows_st)
        if si == 0:
            accum = accum_s
        else:
            stage_accums.append((accum_s, dest))

    # Fold shrunk-stage contributions back to their original groups:
    # dest_c holds each kept group's ORIGINAL group id (unique within a
    # stage), so this is a scatter of only w/G contiguous 3*G-wide rows —
    # cheap, unlike the 4.2M-segment lane-level segment_sum it replaces.
    G = WAVE_SHRINK_GROUP
    for accum_c, dest_c in stage_accums:
        n_s = dest_c.shape[0]
        acc_g = (
            accum_c.reshape(3, n_s, G).transpose(1, 0, 2).reshape(n_s, 3 * G)
        )
        seg = jax.ops.segment_sum(acc_g, dest_c, num_segments=r_pad // G)
        accum = accum + (
            seg.reshape(r_pad // G, 3, G).transpose(1, 0, 2).reshape(3, r_pad)
        )

    radiance = accum[:, :r].T
    if return_dropped and not return_stats:
        # Shrink overflow must never be silent (the reference never drops
        # rays): the render pipeline fetches this scalar with each tile
        # and warns from the host (device-side debug callbacks are not
        # supported on every backend, e.g. the axon tunnel).
        total_drop = jnp.int32(0)
        for _, cnt in drop_updates:
            total_drop = total_drop + cnt
        return radiance, total_drop
    if return_stats:
        parts = list(zip(*stat_stages))  # 4 tuples of per-stage arrays
        live, hits, spawned, dropped = (
            jnp.concatenate(p) for p in parts
        )
        for lv, cnt in drop_updates:
            dropped = dropped.at[lv].add(cnt)
        return radiance, TraceStats(live, hits, spawned, dropped)
    return radiance


def trace_wavefront(
    scene: Scene,
    origins: jnp.ndarray,     # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    times: jnp.ndarray,       # (R,)
    key: jax.Array,
    light_samples: int,
    queue_mult: int = 2,
    use_bvh: bool = False,
    min_throughput: float = 0.0,
    compact: str = "auto",
    differentiable: bool = False,
    return_stats: bool = False,
    max_depth: int | None = None,
    segments: int = 0,
    shrink="auto",
    kernel_tex: bool | None = None,
    return_dropped: bool = False,
    fused: bool | None = None,
) -> jnp.ndarray:
    """Trace R primary rays to completion.  Returns (R, 3) radiance, or
    (radiance, TraceStats) when return_stats — per-level live/hit/spawn/drop
    counters (one extra sum per level; negligible next to the trace).

    use_bvh routes closest-hit through the LBVH traversal kernel (same
    image; mirrors the reference -bvh flag, Code/raytracer.cpp:369).

    compact: "always" stream-compacts the continuation queue every level
    (one stable lax.sort on the dead flag) so dead rays stop occupying
    kernel blocks; "auto"/"never" keep one-way continuations in their own
    slots, which measures faster on TPU (the sort costs more than tracing
    the extra partially-dead blocks).  Two-way (mirror+glass) scenes
    always compact — the queue physically grows.  Compaction only permutes
    queue slots, so deterministic scenes are bit-identical either way;
    stochastic effects consume slot-indexed RNG streams and differ within
    their sampling noise.

    min_throughput: kill continuation rays whose path throughput falls at
    or below this value.  0.0 (default) = the reference's exact semantics
    (rays die only on miss or at depth 11).  Positive values are a lossy
    speed knob: a killed ray changes its sample's linear radiance by at
    most tp * L_max, so small cutoffs perturb the uint8 image by at most
    a few steps (measured: <= 2 at 5e-3 on the bundled bvh scene).

    max_depth: recursion depth cutoff; None (default) = the reference's
    MAX_RECURSION_DEPTH (10 -> 11 levels, Code/raytracer.hpp:11).

    segments: split the in-slot queue into this many segments and gate
    each level's ENTIRE body per segment on any(active) via lax.cond.
    Motivation: bounce levels are mostly dead (the bench scene is 26% live
    at level 1, < 3% from level 3) and the kernels' dead-block skip does
    not save the per-level jnp glue.  MEASURED SLOWER on TPU v5e though:
    the bench frame drops from 14.6 to 8.9 Mrays/s at 4 or 16 segments —
    per-segment dispatch/cond overhead and the loss of cross-op pipelining
    outweigh the skipped glue — so 0 (auto) currently means OFF; the knob
    stays for experimentation on other topologies.  Deterministic scenes
    are bit-identical either way; stochastic effects consume
    segment-indexed RNG streams and differ within their sampling noise.

    shrink: fused-path queue-compaction schedule — "auto" (default) uses
    WAVE_SHRINK_AUTO, () disables, or pass explicit ((level, factor), ...)
    pairs; see _trace_wave.  Compaction only re-slots rays, so
    deterministic scenes are identical unless live lanes overflow the
    shrunk capacity (surfaced via TraceStats.dropped; never happens on
    the committed demo scenes — pinned by a test)."""
    r = origins.shape[0]
    if max_depth is None:
        max_depth = C.MAX_RECURSION_DEPTH
    bg = jnp.asarray(C.BACKGROUND_RGB, jnp.float32)

    if scene.n_geoms == 0:
        # Nothing can be hit: every ray takes the background path.
        out = jnp.broadcast_to(bg, (r, 3))
        if return_stats:
            z = jnp.zeros(1, jnp.int32)
            return out, TraceStats(
                live=jnp.full(1, r, jnp.int32), hits=z, spawned=z, dropped=z
            )
        if return_dropped:
            return out, jnp.int32(0)
        return out

    # Branching factor 2 requires a single MATERIAL that both reflects and
    # refracts (Code/raytracer.cpp:308-344); scenes that merely mix mirror
    # and glass materials spawn one continuation per ray and stay in-slot.
    two_way = scene.has_two_way
    spawn = scene.has_reflection or scene.has_refraction
    capacity = r * queue_mult if two_way else r
    # Measured on the bundled scene (1M-4M ray tiles): a sort-based
    # compaction costs ~40ms/level while the dead-block savings in the
    # kernels are smaller — in-slot wins for one-way scenes ("auto").
    # Two-way scenes must compact: the queue physically grows.
    do_compact = (compact == "always" or two_way) and spawn

    # --- fused level megakernel fast path (kernels/wavefront.py): the
    # whole level body in one Pallas pass per level + one any-hit pass per
    # light.  Inference-only; scenes outside its scope take the general
    # path below.
    if (
        fused is not False
        and not use_bvh
        and not two_way
        and compact != "always"
        and segments <= 1
    ):
        from ray_tracying_tpu.render.intersect import _use_pallas

        if _use_pallas():
            from ray_tracying_tpu.kernels.wavefront import (
                wave_diff_supported,
                wave_supported,
            )

            # Differentiable renders use the fused path too (record-mode
            # kernel + wave_ref reconstruction VJP) when the scene's
            # texture handling is in-kernel; glue-textured scenes fall
            # back to the general differentiable path.
            ok_fused = (
                wave_diff_supported(scene, light_samples)
                if differentiable
                else wave_supported(scene, light_samples)
            )
            if ok_fused:
                sched = WAVE_SHRINK_AUTO if shrink == "auto" else (shrink or ())
                return _trace_wave(
                    scene, origins, directions, times, key, light_samples,
                    min_throughput, return_stats, max_depth, sched,
                    kernel_tex, return_dropped, differentiable,
                )

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

    # --- segment gating (in-slot path only; see docstring; auto = OFF
    # per the v5e measurement) ---
    seg_n = segments
    use_segments = (
        spawn and not do_compact and not differentiable and segments > 1
    )
    if use_segments:
        from ray_tracying_tpu.kernels.closest_hit import BLOCK_R

        unit = seg_n * BLOCK_R
        rp = -(-r // unit) * unit
        if rp > r:
            padn = rp - r
            q = _Queue(
                o=jnp.concatenate([q.o, jnp.zeros((padn, 3))]),
                d=jnp.concatenate([q.d, jnp.zeros((padn, 3))]),
                time=jnp.concatenate([q.time, jnp.zeros(padn)]),
                tp=jnp.concatenate([q.tp, jnp.zeros(padn)]),
                dest=jnp.concatenate([q.dest, jnp.zeros(padn, jnp.int32)]),
                active=jnp.concatenate([q.active, jnp.zeros(padn, bool)]),
            )
            accum = jnp.zeros((rp, 3), jnp.float32)
        seg_len = (rp if rp > r else r) // seg_n

    def inslot_level(accum_s, q_s, k_lvl):
        """One level of in-slot work on a queue slice (the whole queue or
        one segment).  Returns (accum', continuation queue, counters)."""
        cap = q_s.o.shape[0]
        hit = closest_hit(
            scene, q_s.o, q_s.d, q_s.time, q_s.active, use_bvh, differentiable
        )
        act = q_s.active & hit.valid
        missed = q_s.active & ~hit.valid
        mrec = gather_materials(scene, hit.geom_id)
        local = shade(
            scene, hit, q_s.o, jax.random.fold_in(k_lvl, 0), light_samples,
            mrec, act, use_bvh
        )
        local_w = jnp.maximum(0.0, 1.0 - mrec.reflectivity - mrec.transparency)
        w_miss = jnp.where(missed, q_s.tp, 0.0)[:, None]
        w_local = jnp.where(act, q_s.tp * local_w, 0.0)[:, None]
        contrib = w_miss * bg + w_local * jnp.where(act[:, None], local, 0.0)
        accum_s = accum_s + contrib
        if not spawn:
            q2 = q_s
            spawned = jnp.zeros(cap, bool)
        else:
            q2 = _spawn_one_way(
                scene, q_s, hit, mrec, act, k_lvl, cap, min_throughput
            )
            spawned = q2.active
        counts = (
            jnp.sum(q_s.active.astype(jnp.int32)),
            jnp.sum(act.astype(jnp.int32)),
            jnp.sum(spawned.astype(jnp.int32)),
            jnp.int32(0),
        )
        return accum_s, q2, counts

    def compacted_level(accum, q, k_level):
        """Two-way / forced-compaction level over the full queue."""
        hit = closest_hit(
            scene, q.o, q.d, q.time, q.active, use_bvh, differentiable
        )
        act = q.active & hit.valid
        missed = q.active & ~hit.valid
        live_in = jnp.sum(q.active.astype(jnp.int32))
        n_hit = jnp.sum(act.astype(jnp.int32))

        mrec = gather_materials(scene, hit.geom_id)
        local = shade(
            scene, hit, q.o, jax.random.fold_in(k_level, 0), light_samples,
            mrec, act, use_bvh
        )
        local_w = jnp.maximum(0.0, 1.0 - mrec.reflectivity - mrec.transparency)
        w_miss = jnp.where(missed, q.tp, 0.0)[:, None]
        w_local = jnp.where(act, q.tp * local_w, 0.0)[:, None]
        contrib = w_miss * bg + w_local * jnp.where(act[:, None], local, 0.0)

        # Scatter-add by dest is a serial loop on TPU; stable-sort the
        # contributions by dest and segment-sum instead.
        dd = jnp.where(q.active, q.dest, r)
        sd, c0, c1, c2 = jax.lax.sort(
            (dd, contrib[:, 0], contrib[:, 1], contrib[:, 2]),
            num_keys=1,
            is_stable=False,
        )
        csort = jnp.stack([c0, c1, c2], axis=1)
        accum = accum + jax.ops.segment_sum(
            csort, sd, num_segments=r + 1, indices_are_sorted=True
        )[:r]

        if two_way:
            c_refl = _spawn_reflection(
                scene, q, hit, mrec, act, k_level, capacity, min_throughput
            )
            c_refr = _spawn_refraction(
                scene, q, hit, mrec, act, capacity, min_throughput
            )
            cand = _cat([c_refl, c_refr])
            q, dropped = _compact(cand, cand.active, capacity)
            spawned = cand.active
        else:
            q = _spawn_one_way(
                scene, q, hit, mrec, act, k_level, capacity, min_throughput
            )
            spawned = q.active
            q, dropped = _compact(q, q.active, capacity)
        counts = (live_in, n_hit, jnp.sum(spawned.astype(jnp.int32)), dropped)
        return accum, q, counts

    def level_body(carry, depth):
        accum, q = carry
        k_level = jax.random.fold_in(key, depth)
        if do_compact:
            accum, q, counts = compacted_level(accum, q, k_level)
        elif use_segments:
            qs = jax.tree.map(
                lambda a: a.reshape((seg_n, seg_len) + a.shape[1:]), q
            )
            accs = accum.reshape(seg_n, seg_len, 3)
            seg_keys = jax.vmap(
                lambda i: jax.random.fold_in(k_level, i)
            )(jnp.arange(seg_n))

            def seg_step(_, xs):
                acc_s, q_s, k_s = xs

                def dead(args):
                    a, qq, _k = args
                    z = jnp.int32(0)
                    return a, qq, (z, z, z, z)

                out = jax.lax.cond(
                    jnp.any(q_s.active),
                    lambda args: inslot_level(*args),
                    dead,
                    (acc_s, q_s, k_s),
                )
                return None, out

            _, (accs2, qs2, seg_counts) = jax.lax.scan(
                seg_step, None, (accs, qs, seg_keys)
            )
            accum = accs2.reshape(-1, 3)
            q = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:]), qs2
            )
            counts = tuple(jnp.sum(c) for c in seg_counts)
        else:
            accum, q, counts = inslot_level(accum, q, k_level)
        if return_stats:
            out_row = counts
        elif return_dropped and do_compact:
            out_row = counts[3]
        else:
            out_row = None
        return (accum, q), out_row

    if not spawn:
        # Purely local scene: one level suffices.
        accum, _, row = inslot_level(accum, q, jax.random.fold_in(key, 0))
        if return_stats:
            return accum[:r], TraceStats(*(v[None] for v in row))
        if return_dropped:
            return accum[:r], jnp.int32(0)
        return accum[:r]

    # max_depth+1 levels (depth 0..10 by default); children spawned by the
    # last iteration are never consumed, reproducing "depth > 10 -> black".
    if differentiable:
        # Remat each level under AD: without this, every level's dense
        # (rays x geoms) hit matrix is saved as a scan residual —
        # 11 x R x G f32 (23 GB for the flagship at 1 spp) blows HBM.
        # Recomputing the level forward in the backward pass costs ~2x
        # FLOPs and caps residual memory at one level's carry.
        level_body = jax.checkpoint(level_body)
    (accum, _), rows = jax.lax.scan(
        level_body,
        (accum, q),
        jnp.arange(max_depth + 1, dtype=jnp.int32),
    )
    if return_stats:
        return accum[:r], TraceStats(*rows)
    if return_dropped:
        # Only compacted (two-way) queues can overflow on this path.
        return accum[:r], (
            jnp.sum(rows) if rows is not None else jnp.int32(0)
        )
    return accum[:r]
