"""Differentiable jnp reconstruction of one fused bounce level.

The fused level megakernel (kernels/wavefront.py) is fast but opaque to
AD.  Its custom VJP therefore runs the kernel for the PRIMAL (with
`record` rows appended: winner geom id, per-light visibility, and the
fetched texel) and, in the backward pass, re-expresses the level as this
plain-jnp function of (queue, fuzz, table, lights) GIVEN those recorded
discrete decisions, then differentiates the reconstruction:

  - hit SELECTION (which geom wins) and shadow visibility are recorded
    and stop-gradient — they are piecewise-constant in every parameter
    (the BASELINE.json "closest-hit re-use" scope, same contract as the
    general path's kernels/closest_hit custom VJP);
  - the winner's hit distance/normal are RECOMPUTED differentiably from
    the winner's table row via the same `geom_t` math the kernels use,
    so camera/geometry gradients keep their dt/d(origin) terms;
  - shading, attenuation, throughput weights, and the continuation spawn
    (glossy fuzz included — the same fuzz rows the kernel consumed) are
    the reference's formulas, cited in kernels/wavefront.py.

Cost: one O(R * (G + L)) elementwise pass plus a (R, G) one-hot matmul —
no shadow-ray loops (visibility is recorded), which is why the fused
backward is an order of magnitude cheaper than re-shading from scratch.

Reconstructs `raytracer.cpp:280-351` differentiated w.r.t. materials,
lights, and ray/camera parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.kernels.closest_hit import geom_t
from ray_tracying_tpu.kernels.geom_table import GEOM_COLS

_INF = float("inf")
_TINY = 1e-20


class _WinnerCols:
    """Duck-typed geom-table ref over per-LANE winner columns: geom_t
    reads `table_ref[i, g]` scalars per geom; here [i, g] yields the
    (R,)-vector of column i of each lane's winning geom, so the same
    kind-dispatch math runs vectorized over winners."""

    def __init__(self, cols):
        self.cols = cols

    def __getitem__(self, key):
        i, _ = key
        return self.cols[i]


def _safe_sqrt(x2):
    """sqrt with a finite gradient at 0 (dead/padded lanes hold zeros;
    sqrt'(0)=inf times a zero cotangent would poison the VJP with NaN).
    Values are identical to jnp.sqrt(max(x2, 0))."""
    pos = x2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x2, 1.0)), 0.0)


class _Rays:
    __slots__ = ("ox", "oy", "oz", "dx", "dy", "dz", "tm", "dnorm")

    def __init__(self, q):
        self.ox, self.oy, self.oz = q[0], q[1], q[2]
        self.dx, self.dy, self.dz = q[3], q[4], q[5]
        self.tm = q[6]
        self.dnorm = _safe_sqrt(
            self.dx * self.dx + self.dy * self.dy + self.dz * self.dz
        )


def wave_level_ref(
    out_prev, fuzz, table, lights, best_id, vis, texel, *, motion,
    n_lights, glossy, refraction, min_tp, ktex, kinds_present, rows, hr,
):
    """Rebuild the level output tensor (rows, R) from recorded decisions.

    out_prev: (rows, R) previous level output (queue in rows 0..8).
    table: (cols, R-transposed) shaded geom table as the kernel gets it.
    best_id: (R,) recorded winner id (-1 miss, stop-gradient).
    vis: (L, R) recorded per-light averaged visibility (stop-gradient).
    texel: (3, R) recorded texel (ktex scenes; stop-gradient) or None.
    kinds_present: static (spheres, cubes, rects, planes) flags.
    """
    q = out_prev[:9]
    rb = _Rays(q)
    act = lax.stop_gradient(q[7]) > 0.0
    tp = q[8]
    r = q.shape[1]
    zero = jnp.zeros((r,), jnp.float32)

    best_id = lax.stop_gradient(best_id)
    vis = lax.stop_gradient(vis)
    hit_f = (best_id >= 0.0) & act

    # --- winner-row gather: one-hot over the table's id column (exact
    # f32 matmul on the MXU; serial per-lane gathers are slow on TPU).
    ids_col = lax.stop_gradient(table[16])  # (G,)
    oh = (best_id[:, None] == ids_col[None, :]).astype(jnp.float32)
    n_mat = 14 if refraction else 12
    need = list(range(17)) + list(range(GEOM_COLS, GEOM_COLS + n_mat))
    sub = table[jnp.asarray(need)]  # (n_need, G)
    win = lax.dot_general(
        oh, sub.T, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).T  # (n_need, R)
    wincols = [win[i] for i in range(17)]
    mats = win[17:]
    dr, dg, db, sr, sg, sb, ka, kd, ks, shin, rough, refl = mats[:12]
    trans = mats[12] if refraction else zero
    ior = mats[13] if refraction else zero

    # --- winner hit distance + unnormalized normal, the exact kernel
    # math (kernels/closest_hit.geom_t), differentiable w.r.t. ray and
    # winner transform.
    has_s, has_c, has_r, has_p = kinds_present
    # inf=1e30: a FINITE miss sentinel — true-inf primals turn the zero
    # cotangents of masked lanes into NaN (0 * inf) in backward mul rules.
    spec = dict(
        spheres=has_s, cubes=has_c, rects=has_r, planes=has_p,
        motion=motion, single=False, inf=1e30,
    )
    best_t, _, (bnx, bny, bnz) = geom_t(
        0, _WinnerCols(wincols), rb, spec, want_normal=True
    )
    ln = _safe_sqrt(bnx * bnx + bny * bny + bnz * bnz)
    inv_n = 1.0 / jnp.maximum(ln, _TINY)
    nx, ny, nz = bnx * inv_n, bny * inv_n, bnz * inv_n

    t_fin = jnp.where(hit_f & (best_t < 1e29), best_t, 0.0)
    px = rb.ox + t_fin * rb.dx
    py = rb.oy + t_fin * rb.dy
    pz = rb.oz + t_fin * rb.dz
    vx, vy, vz = -rb.dx, -rb.dy, -rb.dz

    w_miss = jnp.where(act & ~(best_id >= 0.0), tp, 0.0)
    w_local = jnp.where(hit_f, tp * jnp.maximum(0.0, 1.0 - refl - trans), 0.0)

    amb = ka * w_local
    d_r, d_g, d_b = dr * amb, dg * amb, db * amb
    s_r = C.BACKGROUND_RGB[0] * w_miss
    s_g = C.BACKGROUND_RGB[1] * w_miss
    s_b = C.BACKGROUND_RGB[2] * w_miss

    # --- Blinn-Phong from the light center, visibility RECORDED
    # (Code/raytracer.cpp:244-262; kernels/wavefront.py light loop).
    for li in range(n_lights):
        lpx, lpy, lpz = lights[0, li], lights[1, li], lights[2, li]
        lr, lg, lb = lights[3, li], lights[4, li], lights[5, li]
        inten = lights[6, li]
        lvx, lvy, lvz = lpx - px, lpy - py, lpz - pz
        d2 = lvx * lvx + lvy * lvy + lvz * lvz
        dist = jnp.sqrt(jnp.maximum(d2, _TINY))
        inv_d = 1.0 / jnp.maximum(dist, _TINY)
        lcx, lcy, lcz = lvx * inv_d, lvy * inv_d, lvz * inv_d
        ndotl = jnp.maximum(0.0, nx * lcx + ny * lcy + nz * lcz)
        hx, hy, hz = lcx + vx, lcy + vy, lcz + vz
        hn = _safe_sqrt(hx * hx + hy * hy + hz * hz)
        inv_h = 1.0 / jnp.maximum(hn, _TINY)
        ndoth = jnp.maximum(
            0.0, nx * hx * inv_h + ny * hy * inv_h + nz * hz * inv_h
        )
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
        v_li = vis[li]
        d_r = d_r + lr * dr * dif * v_li
        d_g = d_g + lg * dg * dif * v_li
        d_b = d_b + lb * db * dif * v_li
        s_r = s_r + lr * sr * spc * v_li
        s_g = s_g + lg * sg * spc * v_li
        s_b = s_b + lb * sb * spc * v_li

    if ktex and texel is not None:
        tex = lax.stop_gradient(texel)
        c_r = d_r * tex[0] + s_r
        c_g = d_g * tex[1] + s_g
        c_b = d_b * tex[2] + s_b
    else:
        c_r, c_g, c_b = d_r + s_r, d_g + s_g, d_b + s_b

    # --- continuation spawn (Code/raytracer.cpp:307-344), fuzz rows as
    # consumed by the kernel.
    sox = px + nx * C.EPS_NORMAL_OFFSET
    soy = py + ny * C.EPS_NORMAL_OFFSET
    soz = pz + nz * C.EPS_NORMAL_OFFSET
    ddn = rb.dx * nx + rb.dy * ny + rb.dz * nz
    rdx = rb.dx - 2.0 * ddn * nx
    rdy = rb.dy - 2.0 * ddn * ny
    rdz = rb.dz - 2.0 * ddn * nz
    if glossy:
        fx, fy, fzz = fuzz[0], fuzz[1], fuzz[2]
        gx = rdx + rough * fx
        gy = rdy + rough * fy
        gz = rdz + rough * fzz
        gn = _safe_sqrt(gx * gx + gy * gy + gz * gz)
        inv_g = 1.0 / jnp.maximum(gn, _TINY)
        gx, gy, gz = gx * inv_g, gy * inv_g, gz * inv_g
        below = lax.stop_gradient(gx * nx + gy * ny + gz * nz) < 0.0
        gx = jnp.where(below, 0.0, gx)
        gy = jnp.where(below, 0.0, gy)
        gz = jnp.where(below, 0.0, gz)
        isg = lax.stop_gradient(rough) > 0.0
        rdx = jnp.where(isg, gx, rdx)
        rdy = jnp.where(isg, gy, rdy)
        rdz = jnp.where(isg, gz, rdz)
    rd2 = lax.stop_gradient(rdx * rdx + rdy * rdy + rdz * rdz)
    ok = hit_f & (lax.stop_gradient(refl) > 0.0) & (rd2 > C.EPS_GLOSSY_DIR2)
    tp2 = tp * refl
    cox, coy, coz = sox, soy, soz

    if refraction:
        exiting = lax.stop_gradient(ddn) > 0.0
        eta = jnp.where(exiting, ior, 1.0) / jnp.where(
            exiting, 1.0, jnp.maximum(ior, _TINY)
        )
        nsg = jnp.where(exiting, -1.0, 1.0)
        nex, ney, nez = nsg * nx, nsg * ny, nsg * nz
        cos_abs = jnp.abs(ddn)
        disc = 1.0 - eta * eta * (1.0 - cos_abs * cos_abs)
        cos_t = _safe_sqrt(disc)
        kk = eta * cos_abs - cos_t
        tx = eta * rb.dx + kk * nex
        ty = eta * rb.dy + kk * ney
        tz = eta * rb.dz + kk * nez
        tn2 = tx * tx + ty * ty + tz * tz
        inv_t = 1.0 / jnp.sqrt(jnp.where(tn2 > 0.0, tn2, 1.0))
        live_t = (lax.stop_gradient(disc) >= 0.0) & (
            lax.stop_gradient(tn2) > C.EPS_REFRACT_DIR2
        )
        tx = jnp.where(live_t, tx * inv_t, 0.0)
        ty = jnp.where(live_t, ty * inv_t, 0.0)
        tz = jnp.where(live_t, tz * inv_t, 0.0)
        use_refr = lax.stop_gradient(trans) > 0.0
        ok = jnp.where(use_refr, hit_f & use_refr & live_t, ok)
        tp2 = tp * jnp.where(use_refr, trans, refl)
        cox = jnp.where(use_refr, px - nex * C.EPS_NORMAL_OFFSET, cox)
        coy = jnp.where(use_refr, py - ney * C.EPS_NORMAL_OFFSET, coy)
        coz = jnp.where(use_refr, pz - nez * C.EPS_NORMAL_OFFSET, coz)
        rdx = jnp.where(use_refr, tx, rdx)
        rdy = jnp.where(use_refr, ty, rdy)
        rdz = jnp.where(use_refr, tz, rdz)

    if min_tp > 0.0:
        ok = ok & (lax.stop_gradient(tp2) > min_tp)
    ok = lax.stop_gradient(ok)

    out = [
        cox, coy, coz, rdx, rdy, rdz, zero,
        lax.stop_gradient(jnp.where(ok, 1.0, 0.0)),
        jnp.where(ok, tp2, 0.0),
        c_r, c_g, c_b,
    ]
    # act_hit + record rows: discrete, echoed with zero gradient.
    out = jnp.stack(out + [zero] * (rows - len(out)))
    rest = lax.stop_gradient(
        jnp.concatenate(
            [
                jnp.where(hit_f, 1.0, 0.0)[None],
                best_id[None],
                vis,
            ]
            + ([texel] if (ktex and texel is not None) else []),
            axis=0,
        )
    )
    return out.at[hr : hr + rest.shape[0]].set(rest)
