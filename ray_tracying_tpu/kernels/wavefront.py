"""Fused wavefront level megakernel: the ENTIRE bounce level — closest
hit, material recovery, Blinn-Phong, SHADOW VISIBILITY (in-kernel any-hit
loops, point and spherical area lights), texture UV recovery, and
continuation spawn — in ONE Pallas pass per level.

Motivation, round 3 (tools/profile_wave.py on the bundled bvh scene,
4.2M-ray tiles, TPU v5e): with occlusion as SEPARATE kernels the two
shadow passes cost 188 ms of a 341 ms level loop and stayed ~16 ms/level
even at 0.1% live — each pass re-read the whole 31-row level tensor from
HBM, so dead levels were pure DMA.  Folding the any-hit loops into the
level kernel removes 2 dispatches + 2 full-tensor reads per level AND
lets visibility multiply into the contribution in registers, shrinking
the output tensor from 9(1+L)+3(1+L)+1 rows to a flat 13 (19 textured).

Dataflow (all row-major (rows, R) f32, WAVE_BLOCK-columned):

  queue pack     rows 0..8   [ox oy oz dx dy dz time act tp]
  level output   rows 0..8   next queue pack (same layout)
                 rows 9..11  contribution (tp-weighted, visibility and —
                             in-kernel-texture scenes — the texel already
                             applied): the FINAL level radiance; for
                             GLUE-textured scenes (textured spheres,
                             oversize atlases) the texture-pending
                             diffuse part D instead
                 rows 12..14 (glue-textured only) S: specular + miss-
                             background part (not modulated by texture)
                 rows 15..17 (glue-textured only) u, v, tex slot (-1 none)
                 rows 18..19 (glue-textured spheres) local hit pt z, kind
                 next row    act_hit (stats)
                 + record  (differentiable mode) winner id, per-light
                             visibility, texel rgb — replayed by the
                             custom VJP through kernels/wave_ref.py

The next level's megakernel reads the previous output tensor directly at
row-block 0 — zero repacking between levels.  The jnp glue per level is
`accum += out[9:12]` plus, for glue-textured scenes only, the XLA atlas
gather in _wave_tex_modulate.

Lookups ride the MXU as one-hot matmuls, never per-lane gathers (Mosaic
has none; an XLA-side gather measured 26.5 ms per 4.2M-lane level):
texels via a VMEM-resident u8-exact bf16 texture matrix
(tex_kernel_supported / pack_tex_matrix) and the winner's
material+transform record via a HIGHEST-precision f32 dot against the
VMEM twin of the geom table, keyed on the winner ROW carried through the
closest-hit loop.

Scope (wave_supported gates; everything else takes the general path):
no TWO-WAY materials (a single material that both reflects and refracts
branches the ray tree; one-way refraction spawns in-kernel since r4),
<= 8 lights (the per-light any-hit loops unroll), scene table fits SMEM,
textured scenes must carry an atlas.  All four geometry kinds including
textured legacy planes (projective quad UV from the corner columns).
Semantics are the reference's, cited inline; glossy fuzz and area-light
shadow jitter are sampled OUTSIDE the kernel with jax.random (XLA's
transcendentals are ~50x faster than Mosaic's; measured 58 ms vs ~1 ms
per 4M lanes) and fed in as fuzz rows — a different stream of the same
distribution as the general path, covered by the stochastic-tolerance
contract (SURVEY.md §7 controlled deviations).
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

# Rays per kernel block (re-swept for the fused kernel in r4; see
# PROFILE_r4.json for the measured sweep on the bundled scene).
WAVE_BLOCK = 2048

# The shaded table is (31|32, G) f32 in SMEM (~124-128 B/geom); cap well
# under the ~1 MB SMEM budget with double-buffering headroom
# (6144 * 128 B = 768 KB worst case).
WAVE_MAX_GEOMS = 6144

Q_ROWS = 9
C_BASE = 9   # contribution rows (D when textured)
S_BASE = 12  # textured only: specular + background rows
UV_BASE = 15  # textured only: u, v, slot rows


def out_rows(tex_glue: bool, sphere_uv: bool = False) -> int:
    """Level-output row count: queue(9) + contrib(3) [+ spec(3) + uv(3)
    (+ plz(1) + kind(1) when the scene has textured spheres)] + act_hit(1).

    tex_glue: True only for textured scenes that sample their texture in
    the XLA glue (_wave_tex_modulate) — scenes the in-kernel one-hot
    matmul path can't take (see tex_kernel_supported).  Kernel-textured
    scenes use the compact 13-row untextured layout: the texel already
    multiplied into the contribution rows.

    sphere_uv: spherical UV needs atan2/arcsin, which Mosaic cannot lower
    on TPU — sphere lanes emit the raw object-space hit point (u,v rows
    carry plx,ply; +2 rows carry plz and the winner kind) and the trig
    runs in the XLA glue (_wave_tex_modulate).  Cube/rect UVs are pure
    arithmetic and stay in-kernel."""
    if not tex_glue:
        return 13
    return 21 if sphere_uv else 19


def hit_row(tex_glue: bool, sphere_uv: bool = False) -> int:
    return out_rows(tex_glue, sphere_uv) - 1


# In-kernel texture caps: the texel fetch is a one-hot matmul against the
# (3*W, T*H) texture matrix resident in VMEM (~2 us/block on the MXU for
# 128x128 — vs 26.5 ms per 4.2M-lane level for the XLA gather it
# replaces); FLOPs scale with T*H * W, so big atlases take the glue path.
TEX_MAX_ROWS = 256   # T * H
TEX_MAX_W = 128


def tex_kernel_supported(scene: Scene) -> bool:
    """True when the fused path can sample textures inside the megakernel
    (nearest-neighbor fetch as a one-hot MXU matmul).  Textured spheres
    are excluded — their spherical UV needs atan2/arcsin, which Mosaic
    cannot lower, so they keep the split-D/S + XLA-glue path."""
    if not (scene.has_textures and scene.tex_atlas is not None):
        return False
    if scene.has_spheres:
        return False
    t, h, w, _ = scene.tex_atlas.shape
    return t * h <= TEX_MAX_ROWS and w <= TEX_MAX_W


def pack_tex_matrix(scene: Scene):
    """((3*W, T*H) bf16 texture matrix, (2, T) f32 true-size table).

    The matrix holds EXACT u8 texel values 0..255 (integers <= 256 are
    exact in bf16): matrix[c*W + x, t*H + y] = round(255 * atlas[t,y,x,c]).
    The kernel's one-hot row matmul therefore reproduces the reference's
    nearest-neighbor fetch (Code/material.hpp:122-133) bit-for-bit after
    the f32 division by 255."""
    t, h, w, _ = scene.tex_atlas.shape
    m = jnp.round(scene.tex_atlas * 255.0)          # (T, H, W, 3)
    m = m.transpose(3, 2, 0, 1).reshape(3 * w, t * h)
    twh = scene.tex_wh.T.astype(jnp.float32)        # (2, T) = (w, h)
    return (
        lax.stop_gradient(m.astype(jnp.bfloat16)),
        lax.stop_gradient(twh),
    )


class _ShadowRays:
    """Duck-typed RayBlock over in-register shadow-ray vectors (geom_t
    only touches these attributes).  Shadow rays carry time = 0 (Ray
    default, Code/shapes.hpp:28), so tm is only read when a motion spec
    is passed — the shadow any-hit always runs with motion off."""

    __slots__ = ("ox", "oy", "oz", "dx", "dy", "dz", "tm", "dnorm")

    def __init__(self, ox, oy, oz, dx, dy, dz):
        self.ox, self.oy, self.oz = ox, oy, oz
        self.dx, self.dy, self.dz = dx, dy, dz
        self.tm = jnp.zeros_like(ox)
        self.dnorm = jnp.sqrt(dx * dx + dy * dy + dz * dz)


def _any_hit(table_ref, ranges, rb, maxt, init_blocked):
    """In-kernel any-hit: blocked[r] = 1 iff some geom has hit distance
    <= maxt[r] (visible iff min_t > light_dist, Code/raytracer.cpp:233-235
    — the complement).  Early-exits each kind loop once every lane in the
    block is blocked; lanes that never needed visibility start blocked so
    they cannot hold the loop open.  Kind segments are OCC_CHUNK-padded
    (kernels/geom_table.py), letting the loop unroll CHUNK geom tests per
    iteration (a 1-geom while_loop serializes on its carried reduction)."""
    blocked = init_blocked
    for kind, start, end in ranges:
        spec = _kind_spec(kind, False)

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
    return blocked


def _wave_kernel(
    q_ref, fuzz_ref, table_ref, tabv_ref, light_ref, tex_ref, twh_ref,
    out_ref,
    *, ranges, motion, n_lights, glossy, refraction, min_tp, has_tex,
    uv_kinds, area, nss, ktex, record=0, ablate=(),
):
    w = out_ref.shape[1]
    rows = out_ref.shape[0]
    # record > 0 appends [winner id | per-light visibility | texel rgb
    # (ktex)] rows after act_hit — the discrete decisions the custom VJP
    # replays through the jnp reconstruction (kernels/wave_ref.py).
    hr = rows - 1 - record
    n_rows_table = max(end for _, _, end in ranges)
    out_ref[...] = jnp.zeros((rows, w), jnp.float32)

    act = q_ref[7, :]

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(q_ref)
        tp = q_ref[8, :]
        live = act > 0.0

        # --- closest hit + winning normal (Code/acceleration.cpp:103-118).
        # The carry also tracks the winner's table ROW (ids are unique, so
        # "id changed" detects an update): the row drives the one-hot
        # winner-record matmul below.
        zero = jnp.zeros((w,), jnp.float32)
        best = (
            jnp.full((w,), _INF, jnp.float32),
            jnp.full((w,), -1, jnp.int32),
            zero, zero, zero,
            jnp.full((w,), -1, jnp.int32),
        )

        def hit_step(g, cr, spec):
            bt, bid, nx_, ny_, nz_, br = cr
            bt2, bid2, nx2, ny2, nz2 = geom_step_n(
                g, (bt, bid, nx_, ny_, nz_), table_ref, rb, spec
            )
            br = jnp.where(bid2 != bid, g, br)
            return (bt2, bid2, nx2, ny2, nz2, br)

        for kind, start, end in ranges:
            spec = _kind_spec(kind, motion)
            best = lax.fori_loop(
                start,
                end,
                lambda g, cr, spec=spec: hit_step(g, cr, spec),
                best,
            )
        best_t, best_id, bnx, bny, bnz, best_row = best
        hit_f = jnp.isfinite(best_t) & live
        act_hit = jnp.where(hit_f, 1.0, 0.0)
        w_miss = jnp.where(live & ~jnp.isfinite(best_t), tp, 0.0)

        ln = jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz)
        inv_n = 1.0 / jnp.maximum(ln, _TINY)
        nx, ny, nz = bnx * inv_n, bny * inv_n, bnz * inv_n

        # --- winner-record recovery: one select sweep over the table's id
        # column (cheaper than carrying the columns through the hit loop;
        # best_id from geom_step_n is the geom's ORIGINAL id, col 16, and
        # the shaded table's material rows are row-aligned — so match on
        # the id column, not the row number).  Textured scenes also sweep
        # the winner's w2o/velocity/kind/texture-slot columns for the UV
        # reconstruction below.  Chunk-pad rows carry id -2 so they can
        # never match (kernels/geom_table.py).
        best_id_f = best_id.astype(jnp.float32)
        # Material block: 12 columns always, +2 (transparency, ior) only
        # when the scene refracts — reflection-only scenes skip them.
        n_mat = 14 if refraction else 12
        sweep_cols = list(range(GEOM_COLS, GEOM_COLS + n_mat))
        if has_tex:
            sweep_cols.append(GEOM_COLS + 14)        # texture slot
            sweep_cols.extend(range(12))             # w2o 3x4
            sweep_cols.append(15)                    # kind
            if motion:
                sweep_cols.extend((12, 13, 14))      # velocity

        # Winner-record fetch as a one-hot matmul on the MXU against the
        # VMEM twin of the table (the r4 per-row select sweep cost
        # 14.4 ms of the 54 ms bench level-0 kernel; the matmul is ~2 ms).
        # Exactly one one-hot term is nonzero per lane, and HIGHEST
        # precision keeps the f32 passthrough faithful; miss lanes
        # (row -1) fetch all-zero records like the sweep's no-match did.
        if 'mat' in ablate:
            swept = tuple(zero + 0.5 for _ in sweep_cols)
        else:
            rows_i = lax.broadcasted_iota(
                jnp.int32, (n_rows_table, w), 0
            )
            oh = (rows_i == best_row[None, :]).astype(jnp.float32)
            sub = jnp.concatenate(
                [tabv_ref[c : c + 1, :] for c in sweep_cols], axis=0
            )  # (n_sweep, G)
            mats = lax.dot_general(
                sub, oh, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (n_sweep, w)
            swept = tuple(mats[i] for i in range(len(sweep_cols)))
        dr, dg, db, sr, sg, sb, ka, kd, ks, shin, rough, refl = swept[:12]
        if refraction:
            trans, ior = swept[12], swept[13]
        else:
            trans = zero

        # --- hit point & view (V = normalize(origin - point) == -d for
        # unit d, Code/raytracer.cpp:197)
        t_fin = jnp.where(hit_f, best_t, 0.0)
        px = rb.ox + t_fin * rb.dx
        py = rb.oy + t_fin * rb.dy
        pz = rb.oz + t_fin * rb.dz
        vx, vy, vz = -rb.dx, -rb.dy, -rb.dz

        # local weight max(0, 1 - refl - trans) (Code/raytracer.cpp:346-350);
        # trans is identically 0 when the scene has no refraction.
        w_local = jnp.where(
            hit_f, tp * jnp.maximum(0.0, 1.0 - refl - trans), 0.0
        )

        # --- contribution accumulators.  Textured scenes split D (scaled
        # by the texel in the glue) from S (specular + background); the
        # reference tints ambient AND diffuse by the texel
        # (Code/material.hpp:122-133 via shade, Code/raytracer.cpp:194).
        amb = ka * w_local
        d_r, d_g, d_b = dr * amb, dg * amb, db * amb
        s_r = C.BACKGROUND_RGB[0] * w_miss
        s_g = C.BACKGROUND_RGB[1] * w_miss
        s_b = C.BACKGROUND_RGB[2] * w_miss

        # --- per light: Blinn-Phong from the light CENTER even for area
        # lights (Code/raytracer.cpp:244-262); visibility in-kernel —
        # 1 hard-shadow ray for radius 0, nss jittered rays for area
        # lights (:199-236, radius 0 -> one sample, :207).
        sox = px + nx * C.EPS_NORMAL_OFFSET
        soy = py + ny * C.EPS_NORMAL_OFFSET
        soz = pz + nz * C.EPS_NORMAL_OFFSET
        fz = 3 if glossy else 0
        for li in range(0 if 'lights' in ablate else n_lights):
            lpx, lpy, lpz = light_ref[0, li], light_ref[1, li], light_ref[2, li]
            lr, lg, lb = light_ref[3, li], light_ref[4, li], light_ref[5, li]
            inten = light_ref[6, li]
            lrad = light_ref[7, li]
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
            dif = kd * ndotl * scale
            spc = ks * spec_i * scale
            pr, pg, pb = lr * dr * dif, lg * dg * dif, lb * db * dif
            qr, qg, qb = lr * sr * spc, lg * sg * spc, lb * sb * spc
            # zero-contribution lanes skip visibility (result unchanged;
            # they start "blocked" so the any-hit early exit fires sooner)
            needs = (
                (pr != 0.0) | (pg != 0.0) | (pb != 0.0)
                | (qr != 0.0) | (qg != 0.0) | (qb != 0.0)
            )
            s_act = hit_f & needs
            init_blk = jnp.where(s_act, 0.0, 1.0)
            if 'occ' in ablate:
                vis = jnp.where(s_act, 1.0, 0.0)
            elif area[li]:
                vsum = zero
                for _ in range(nss):
                    fxr = fuzz_ref[fz + 0, :]
                    fyr = fuzz_ref[fz + 1, :]
                    fzr = fuzz_ref[fz + 2, :]
                    fz += 3
                    txp = lpx + lrad * fxr
                    typ = lpy + lrad * fyr
                    tzp = lpz + lrad * fzr
                    svx, svy, svz = txp - px, typ - py, tzp - pz
                    sdist = jnp.sqrt(svx * svx + svy * svy + svz * svz)
                    inv_s = 1.0 / jnp.maximum(sdist, _TINY)
                    srb = _ShadowRays(
                        sox, soy, soz,
                        svx * inv_s, svy * inv_s, svz * inv_s,
                    )
                    blk = _any_hit(table_ref, ranges, srb, sdist, init_blk)
                    vsum = vsum + (1.0 - blk)
                vis = vsum * (1.0 / nss)
            else:
                srb = _ShadowRays(sox, soy, soz, lcx, lcy, lcz)
                blk = _any_hit(table_ref, ranges, srb, dist, init_blk)
                vis = 1.0 - blk
            d_r = d_r + pr * vis
            d_g = d_g + pg * vis
            d_b = d_b + pb * vis
            s_r = s_r + qr * vis
            s_g = s_g + qg * vis
            s_b = s_b + qb * vis
            if record:
                out_ref[hr + 2 + li, :] = vis

        # --- texture UV reconstruction for the winner (textured scenes):
        # rebuild the object-space hit point from the swept w2o (one pass
        # per LANE, not per geom) and apply the per-kind UV mapping
        # (Code/shapes.cpp:257-259 sphere, :396-407 cube entry-face,
        # :318-321 rect).
        if has_tex:
            w2o = swept[n_mat + 1 : n_mat + 13]
            kindv = swept[n_mat + 13]
            slotv = swept[n_mat]
            if motion:
                velx, vely, velz = swept[n_mat + 14 : n_mat + 17]
                osx = rb.ox - velx * rb.tm
                osy = rb.oy - vely * rb.tm
                osz = rb.oz - velz * rb.tm
            else:
                osx, osy, osz = rb.ox, rb.oy, rb.oz
            olx = w2o[0] * osx + w2o[1] * osy + w2o[2] * osz + w2o[3]
            oly = w2o[4] * osx + w2o[5] * osy + w2o[6] * osz + w2o[7]
            olz = w2o[8] * osx + w2o[9] * osy + w2o[10] * osz + w2o[11]
            dlx = w2o[0] * rb.dx + w2o[1] * rb.dy + w2o[2] * rb.dz
            dly = w2o[4] * rb.dx + w2o[5] * rb.dy + w2o[6] * rb.dz
            dlz = w2o[8] * rb.dx + w2o[9] * rb.dy + w2o[10] * rb.dz
            # best_t is Euclidean = t_loc * |d| (Code/shapes.cpp:251-253).
            t_loc = t_fin / jnp.maximum(rb.dnorm, _TINY)
            plx = olx + t_loc * dlx
            ply = oly + t_loc * dly
            plz = olz + t_loc * dlz
            u = zero
            v = zero
            has_s, has_c, has_r, has_p = uv_kinds
            if has_s:
                # Spherical UV needs atan2/arcsin (Code/shapes.cpp:257-259)
                # — no Mosaic lowering on TPU, so sphere lanes emit the
                # raw local hit point and the glue does the trig in XLA:
                # u,v rows carry plx,ply; extra rows carry plz and kind.
                # (tex_kernel_supported excludes spheres, so never ktex.)
                sel = kindv == 0.0
                u = jnp.where(sel, plx, u)
                v = jnp.where(sel, ply, v)
                out_ref[UV_BASE + 3, :] = plz
                out_ref[UV_BASE + 4, :] = kindv
            if has_c:
                # Entry face: recompute slab entries once per lane; ties
                # break first-wins like the reference's sequential update
                # (render/intersect.py cube UV table).
                ents = []
                sgns = []
                for oo, ddc in ((olx, dlx), (oly, dly), (olz, dlz)):
                    par = jnp.abs(ddc) < C.EPS_PARALLEL
                    d_safe = jnp.where(par, 1.0, ddc)
                    s1 = (-0.5 - oo) / d_safe
                    s2 = (0.5 - oo) / d_safe
                    ents.append(jnp.where(par, -_INF, jnp.minimum(s1, s2)))
                    sgns.append(jnp.where(s1 < s2, -1.0, 1.0))
                win1 = ents[1] > ents[0]
                axv = jnp.where(win1, ents[1], ents[0])
                win2 = ents[2] > axv
                ax0 = ~win1 & ~win2
                ax1 = win1 & ~win2
                sgn = jnp.where(
                    win2, sgns[2], jnp.where(win1, sgns[1], sgns[0])
                )
                pos = sgn > 0.0
                uc = plx + 0.5
                vc = ply + 0.5
                wc = plz + 0.5
                u_c = jnp.where(
                    ax0,
                    jnp.where(pos, wc, 1.0 - wc),
                    jnp.where(ax1, uc, jnp.where(pos, uc, 1.0 - uc)),
                )
                v_c = jnp.where(
                    ax0, vc, jnp.where(ax1, jnp.where(pos, wc, 1.0 - wc), vc)
                )
                sel = kindv == 1.0
                u = jnp.where(sel, u_c, u)
                v = jnp.where(sel, v_c, v)
            if has_r:
                sel = kindv == 2.0
                u = jnp.where(sel, plx + 0.5, u)
                v = jnp.where(sel, ply + 0.5, v)
            if has_p:
                # Legacy plane projective UV (Code/shapes.cpp:470-481):
                # the swept "w2o" columns hold the 4 corners for planes;
                # u/v project the WORLD hit point onto the c0->c1 and
                # c0->c3 edges, clamped to [0,1].
                eux = w2o[3] - w2o[0]
                euy = w2o[4] - w2o[1]
                euz = w2o[5] - w2o[2]
                evx = w2o[9] - w2o[0]
                evy = w2o[10] - w2o[1]
                evz = w2o[11] - w2o[2]
                hvx = px - w2o[0]
                hvy = py - w2o[1]
                hvz = pz - w2o[2]
                eu2 = jnp.maximum(
                    eux * eux + euy * euy + euz * euz, _TINY
                )
                ev2 = jnp.maximum(
                    evx * evx + evy * evy + evz * evz, _TINY
                )
                u_p = jnp.clip(
                    (hvx * eux + hvy * euy + hvz * euz) / eu2, 0.0, 1.0
                )
                v_p = jnp.clip(
                    (hvx * evx + hvy * evy + hvz * evz) / ev2, 0.0, 1.0
                )
                sel = kindv == 3.0
                u = jnp.where(sel, u_p, u)
                v = jnp.where(sel, v_p, v)
            if not ktex:
                out_ref[UV_BASE + 0, :] = u
                out_ref[UV_BASE + 1, :] = v
                out_ref[UV_BASE + 2, :] = jnp.where(hit_f, slotv, -1.0)

        # --- contribution rows.  ktex: texel fetched IN-KERNEL — the
        # nearest-neighbor lookup (Code/material.hpp:122-133: v flipped,
        # C-style truncation, tint already inside D) becomes a one-hot
        # row matmul on the MXU against the VMEM-resident (3W, T*H) u8
        # texture matrix plus a masked column reduction on the VPU.  An
        # XLA-side gather at bench width measured 26.5 ms PER LEVEL; the
        # matmul is ~2 us/block and exact (u8 integers are exact in bf16,
        # one-hot is exact, MXU accumulates f32).
        if ktex:
            n_tex = twh_ref.shape[1]
            twid = zero
            thgt = zero
            for t in range(n_tex):
                sel_t = slotv == float(t)
                twid = jnp.where(sel_t, twh_ref[0, t], twid)
                thgt = jnp.where(sel_t, twh_ref[1, t], thgt)
            xx = jnp.clip(
                jnp.floor(u * (twid - 1.0)), 0.0,
                jnp.maximum(twid - 1.0, 0.0),
            )
            yy = jnp.clip(
                jnp.floor((1.0 - v) * (thgt - 1.0)), 0.0,
                jnp.maximum(thgt - 1.0, 0.0),
            )
            th_tot = tex_ref.shape[1]
            th_pad = th_tot // n_tex        # padded atlas height
            gy = (slotv * th_pad + yy).astype(jnp.int32)
            rows_i = lax.broadcasted_iota(jnp.int32, (th_tot, w), 0)
            oh = (rows_i == gy[None, :]).astype(jnp.bfloat16)
            rowv = lax.dot_general(
                tex_ref[...], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3W_tex, block)
            tw_pad = tex_ref.shape[0] // 3
            cols_i = lax.broadcasted_iota(jnp.int32, (tw_pad, w), 0)
            xsel = (cols_i == xx.astype(jnp.int32)[None, :]).astype(
                jnp.float32
            )
            inv255 = 1.0 / 255.0
            has_t = hit_f & (slotv >= 0.0)
            tr = jnp.sum(rowv[0:tw_pad] * xsel, axis=0) * inv255
            tg = jnp.sum(rowv[tw_pad : 2 * tw_pad] * xsel, axis=0) * inv255
            tb = jnp.sum(rowv[2 * tw_pad :] * xsel, axis=0) * inv255
            tr = jnp.where(has_t, tr, 1.0)
            tg = jnp.where(has_t, tg, 1.0)
            tb = jnp.where(has_t, tb, 1.0)
            if record:
                out_ref[hr + 2 + n_lights + 0, :] = tr
                out_ref[hr + 2 + n_lights + 1, :] = tg
                out_ref[hr + 2 + n_lights + 2, :] = tb
            out_ref[C_BASE + 0, :] = d_r * tr + s_r
            out_ref[C_BASE + 1, :] = d_g * tg + s_g
            out_ref[C_BASE + 2, :] = d_b * tb + s_b
        elif has_tex:
            out_ref[C_BASE + 0, :] = d_r
            out_ref[C_BASE + 1, :] = d_g
            out_ref[C_BASE + 2, :] = d_b
            out_ref[S_BASE + 0, :] = s_r
            out_ref[S_BASE + 1, :] = s_g
            out_ref[S_BASE + 2, :] = s_b
        else:
            out_ref[C_BASE + 0, :] = d_r + s_r
            out_ref[C_BASE + 1, :] = d_g + s_g
            out_ref[C_BASE + 2, :] = d_b + s_b

        # --- reflection continuation (Code/raytracer.cpp:307-333)
        ddn = rb.dx * nx + rb.dy * ny + rb.dz * nz
        rdx = rb.dx - 2.0 * ddn * nx
        rdy = rb.dy - 2.0 * ddn * ny
        rdz = rb.dz - 2.0 * ddn * nz
        if glossy and 'glossy' not in ablate:
            # Fuzz sampled OUTSIDE the kernel (see module docstring) and
            # fed in as fuzz rows 0..2.
            fx = fuzz_ref[0, :]
            fy = fuzz_ref[1, :]
            fzz = fuzz_ref[2, :]
            gx = rdx + rough * fx
            gy = rdy + rough * fy
            gz = rdz + rough * fzz
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
        rd2 = rdx * rdx + rdy * rdy + rdz * rdz
        ok = hit_f & (refl > 0.0) & (rd2 > C.EPS_GLOSSY_DIR2)
        tp2 = tp * refl
        cox, coy, coz = sox, soy, soz

        if refraction:
            # --- refraction continuation (Code/raytracer.cpp:118-150):
            # external medium always n=1 (:121), indices swap + normal
            # flips when exiting (cos_i > 0, :126-129), TIR yields a zero
            # direction (:136-139), direction renormalized (:149), origin
            # offset -1e-4 * effective normal (:147).  Lanes whose material
            # refracts (trans > 0) take this continuation; one-way scenes
            # (wave_supported rejects has_two_way) make the choice
            # exclusive per material, preserving the in-slot discipline.
            exiting = ddn > 0.0
            eta = jnp.where(exiting, ior, 1.0) / jnp.where(
                exiting, 1.0, jnp.maximum(ior, _TINY)
            )
            nsg = jnp.where(exiting, -1.0, 1.0)
            nex, ney, nez = nsg * nx, nsg * ny, nsg * nz
            cos_abs = jnp.abs(ddn)
            disc = 1.0 - eta * eta * (1.0 - cos_abs * cos_abs)
            cos_t = jnp.sqrt(jnp.maximum(disc, 0.0))
            kk = eta * cos_abs - cos_t
            tx = eta * rb.dx + kk * nex
            ty = eta * rb.dy + kk * ney
            tz = eta * rb.dz + kk * nez
            tn2 = tx * tx + ty * ty + tz * tz
            inv_t = 1.0 / jnp.sqrt(jnp.where(tn2 > 0.0, tn2, 1.0))
            live_t = (disc >= 0.0) & (tn2 > C.EPS_REFRACT_DIR2)
            tx = jnp.where(live_t, tx * inv_t, 0.0)
            ty = jnp.where(live_t, ty * inv_t, 0.0)
            tz = jnp.where(live_t, tz * inv_t, 0.0)
            use_refr = trans > 0.0
            ok_refr = hit_f & use_refr & live_t
            # Merge the masks in f32: Mosaic cannot select between two
            # i1 vectors (trunci to i1 is unsupported).
            ok_f = jnp.where(use_refr, 1.0, 0.0) * jnp.where(
                ok_refr, 1.0, 0.0
            ) + jnp.where(use_refr, 0.0, 1.0) * jnp.where(ok, 1.0, 0.0)
            ok = ok_f > 0.0
            tp2 = tp * jnp.where(use_refr, trans, refl)
            cox = jnp.where(use_refr, px - nex * C.EPS_NORMAL_OFFSET, cox)
            coy = jnp.where(use_refr, py - ney * C.EPS_NORMAL_OFFSET, coy)
            coz = jnp.where(use_refr, pz - nez * C.EPS_NORMAL_OFFSET, coz)
            rdx = jnp.where(use_refr, tx, rdx)
            rdy = jnp.where(use_refr, ty, rdy)
            rdz = jnp.where(use_refr, tz, rdz)

        if min_tp > 0.0:
            ok = ok & (tp2 > min_tp)
        out_ref[0, :] = cox
        out_ref[1, :] = coy
        out_ref[2, :] = coz
        out_ref[3, :] = rdx
        out_ref[4, :] = rdy
        out_ref[5, :] = rdz
        # row 6 stays 0 (secondary time, Code/shapes.hpp:28)
        out_ref[7, :] = jnp.where(ok, 1.0, 0.0)
        out_ref[8, :] = jnp.where(ok, tp2, 0.0)
        out_ref[hr, :] = act_hit
        if record:
            out_ref[hr + 1, :] = jnp.where(hit_f, best_id_f, -1.0)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18),
)
def wave_level_call(
    out_prev, fuzz, table, lights, tex, twh, ranges, motion, n_lights,
    glossy, refraction, min_tp, has_tex, uv_kinds, area, nss, ktex,
    record=0, ablate=(),
):
    """One bounce level.  out_prev: the previous level's (rows, R_pad)
    output (or the primary bootstrap tensor); the queue is its row-block 0.
    fuzz: (F, R_pad) XLA-sampled unit-ball rows — glossy fuzz first (when
    glossy), then 3*nss rows per area light in light order.  tex/twh: the
    pack_tex_matrix operands when ktex, else (8, 128)/(2, 1) dummies.

    record > 0 (differentiable mode) appends 1 + n_lights (+3 ktex)
    recording rows; the custom VJP replays the level through the jnp
    reconstruction (kernels/wave_ref.py) given those recorded discrete
    decisions and differentiates THAT — cotangents flow to the queue
    rows, the shaded geom table, and the light table."""
    r_pad = out_prev.shape[1]
    rows = out_rows(has_tex and not ktex, has_tex and uv_kinds[0]) + record
    kernel = functools.partial(
        _wave_kernel,
        ranges=ranges, motion=motion, n_lights=n_lights, glossy=glossy,
        refraction=refraction, min_tp=min_tp, has_tex=has_tex,
        uv_kinds=uv_kinds, area=area, nss=nss, ktex=ktex, record=record,
        ablate=ablate,
    )
    # Input block = the FULL row dimension (Mosaic requires block rows
    # divisible by 8 or equal to the array's); the kernel reads only the
    # queue rows 0..8 — the extra rows are a few hundred MB/s of DMA,
    # noise next to the repacking they replace.
    return pl.pallas_call(
        kernel,
        grid=(r_pad // WAVE_BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (out_prev.shape[0], WAVE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (fuzz.shape[0], WAVE_BLOCK),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shaded geom table
            # VMEM twin of the SAME table (tiny): scalar loops read SMEM,
            # the one-hot winner-record matmul reads VMEM vectors.
            pl.BlockSpec(
                table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # light table
            # texture matrix: whole-array resident in VMEM (<= 192 KB);
            # the index map is block-invariant so Mosaic fetches it once.
            pl.BlockSpec(
                tex.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # texture (w, h) table
        ],
        out_specs=pl.BlockSpec(
            (rows, WAVE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, r_pad), jnp.float32),
        interpret=pallas_interpret(),
    )(out_prev, fuzz, table, table, lights, tex, twh)


def _wave_level_fwd(out_prev, fuzz, table, lights, tex, twh, *nd):
    out = wave_level_call(out_prev, fuzz, table, lights, tex, twh, *nd)
    record = nd[11]
    if not record:
        # Inference mode: no recording rows, zero cotangents (the general
        # path handles AD for scenes that never requested record mode).
        return out, None
    return out, (out_prev, fuzz, table, lights, out)


def _wave_level_bwd(
    ranges, motion, n_lights, glossy, refraction, min_tp, has_tex,
    uv_kinds, area, nss, ktex, record, ablate, res, g,
):
    if res is None:
        return (None, None, None, None, None, None)
    from ray_tracying_tpu.kernels.wave_ref import wave_level_ref

    out_prev, fuzz, table, lights, out = res
    rows = out.shape[0]
    hr = rows - 1 - record
    best_id = out[hr + 1]
    vis = out[hr + 2 : hr + 2 + n_lights]
    texel = (
        out[hr + 2 + n_lights : hr + 2 + n_lights + 3] if ktex else None
    )
    kinds = {k for k, _, _ in ranges}
    kp = (0 in kinds, 1 in kinds, 2 in kinds, 3 in kinds)

    def recon(out_prev, table, lights):
        return wave_level_ref(
            out_prev, fuzz, table, lights, best_id, vis, texel,
            motion=motion, n_lights=n_lights, glossy=glossy,
            refraction=refraction, min_tp=min_tp, ktex=ktex,
            kinds_present=kp, rows=rows, hr=hr,
        )

    _, vjp = jax.vjp(recon, out_prev, table, lights)
    gp, gt, gl = vjp(g)
    return gp, None, gt, gl, None, None


wave_level_call.defvjp(_wave_level_fwd, _wave_level_bwd)


def wave_supported(scene: Scene, light_samples: int = 1) -> bool:
    """Static gate for the fused level path (see module docstring)."""
    if not (0 < scene.n_geoms <= WAVE_MAX_GEOMS):
        return False
    # Two-way materials (reflect AND refract) branch the ray tree — only
    # they break the in-slot queue; one-way refraction runs in-kernel.
    # The light loop is unrolled per light (one in-kernel any-hit loop
    # each); 8 keeps kernel size/compile time sane — beyond that the
    # general path applies (throughput pinned by tools/bench_general.py).
    if scene.has_two_way or scene.n_lights > 8:
        return False
    if scene.has_textures and scene.tex_atlas is None:
        return False
    # Cap the fuzz operand (3 rows per area-light shadow sample).
    n_area = sum(1 for a in scene.lights.is_area if a)
    if n_area and light_samples * n_area > 32:
        return False
    return True


def wave_tables(scene: Scene, stop_grad: bool = True):
    """(shaded table (31|32, G) transposed for SMEM, static kind ranges,
    light table (8, L)).  Kind segments are OCC_CHUNK-padded so the
    in-kernel any-hit loops can unroll; the same table serves closest hit,
    material recovery, and shadow tests.

    stop_grad=False (differentiable mode) keeps the packing traceable so
    table/light cotangents from the level VJP chain back to the Scene's
    material, transform, and light leaves."""
    table, ranges = pack_geom_table_shaded(
        scene, chunk=OCC_CHUNK, with_tex=scene.has_textures
    )
    lights = pack_light_table(scene)
    if stop_grad:
        return (
            lax.stop_gradient(table.T),
            ranges,
            lax.stop_gradient(lights),
        )
    return table.T, ranges, lights


def wave_diff_supported(scene: Scene, light_samples: int = 1) -> bool:
    """Static gate for the DIFFERENTIABLE fused path: everything
    wave_supported requires, plus textures must be in-kernel (the
    glue-texture layout's uv rows are not reconstructed by wave_ref)."""
    if not wave_supported(scene, light_samples):
        return False
    if scene.has_textures and not tex_kernel_supported(scene):
        return False
    return True
