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

from ray_tracying_tpu.core.gather import onehot_gather
from ray_tracying_tpu.scene.types import Scene

KIND_PLANE = 3
GEOM_COLS = 17
# Material columns appended by pack_geom_table_shaded (cols 17..30):
# diffuse rgb, specular rgb, k_ambient, k_diffuse, k_specular, shininess,
# roughness, reflectivity, transparency, refractive index — everything the
# fused shading megakernel needs for either continuation (the kernel only
# sweeps the transparency/ior columns when the scene refracts).  Textured
# scenes append one more column, the texture atlas slot (col 31; -1 = no
# texture).
MAT_COLS = 14
SHADED_COLS = GEOM_COLS + MAT_COLS


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


def pack_geom_table_chunked(scene: Scene, chunk: int):
    """Load-order geom table padded to a multiple of `chunk` with never-hit
    zero rows (gid 0, kind 0 — a zero transform degenerates every
    primitive test to a miss).  Used by the geom-chunked brute kernel for
    scenes whose full table exceeds SMEM."""
    table = pack_geom_table(scene)
    g = table.shape[0]
    pad = -(-g // chunk) * chunk - g
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, GEOM_COLS), table.dtype)], axis=0
        )
    return table


def pack_geom_table_sorted(scene: Scene, chunk: int = 1, pad_gid: float = 0.0):
    """Kind-sorted geom table + static per-kind loop ranges.

    Returns (table, ranges) where table is the (G, 17) table with rows
    stably sorted by kind (spheres, cubes, rects, planes) and ranges is a
    static tuple of (kind_code, start, end) for each nonempty kind.  The
    brute-force kernel runs one kind-specialized inner loop per range,
    dropping the per-row kind dispatch entirely.  Row order is id-tagged
    (col 16), so the reported winner ids are unchanged; only exact-t ties
    BETWEEN kinds can break differently from load order — a measure-zero
    deviation from min_element first-wins (Code/acceleration.cpp:112).

    chunk > 1 pads every kind segment to a multiple of `chunk` with
    all-zero rows, which miss every ray for every kind (zero transforms
    degenerate each primitive test) — the occlusion kernel unrolls its
    early-exit loop by `chunk` and needs aligned segment ends.  pad_gid
    sets the pad rows' id column: keep 0 (harmless — pads never win a
    closest-hit min) or pass a negative sentinel when a consumer matches
    table rows by id and must never match a pad
    (pack_geom_table_shaded's winner-record sweep).

    Requires scene.kind_counts (set by the loader); falls back to a single
    mixed range when counts don't cover the table (hand-built scenes).
    """
    table = pack_geom_table(scene)
    ns, nc, nr = scene.kind_counts
    if ns + nc + nr != scene.n_prims:
        counts = []
        kinds = []
        if scene.n_prims:
            counts.append(scene.n_prims)
            kinds.append(-1)  # mixed kinds
        if scene.n_planes:
            counts.append(scene.n_planes)
            kinds.append(KIND_PLANE)
    else:
        order = jnp.argsort(table[:, 15], stable=True)
        table = table[order]
        counts = [ns, nc, nr, scene.n_planes]
        kinds = [0, 1, 2, KIND_PLANE]
    if chunk > 1:
        padded = [-(-c // chunk) * chunk for c in counts]
        segs = []
        start = 0
        for kind, c, p in zip(kinds, counts, padded):
            seg = table[start : start + c]
            if p > c:
                pad = jnp.zeros((p - c, GEOM_COLS), table.dtype)
                pad = pad.at[:, 15].set(float(max(kind, 0)))
                pad = pad.at[:, 16].set(pad_gid)
                seg = jnp.concatenate([seg, pad], axis=0)
            segs.append(seg)
            start += c
        table = jnp.concatenate(segs, axis=0)
        counts = padded
    bounds = [0]
    for c in counts:
        bounds.append(bounds[-1] + c)
    ranges = tuple(
        (kind, bounds[i], bounds[i + 1])
        for i, kind in enumerate(kinds)
        if bounds[i + 1] > bounds[i]
    )
    return table, ranges


def pack_geom_table_shaded(scene: Scene, chunk: int = 1, with_tex: bool = False):
    """Kind-sorted geom table with the per-geom material record appended
    (SHADED_COLS columns; +1 texture-slot column when with_tex) for the
    fused shading megakernel (kernels/wavefront.py).  Material rows follow
    the table's id column; chunk-pad rows carry id -2 so the kernel's
    winner-record id-match sweep can never select one (they also never win
    the closest-hit min — zero transforms miss every ray)."""
    table, ranges = pack_geom_table_sorted(scene, chunk=chunk, pad_gid=-2.0)
    ids = jnp.round(table[:, 16]).astype(jnp.int32)
    m = scene.materials
    cols = [
        m.diffuse,
        m.specular,
        m.k_ambient[:, None],
        m.k_diffuse[:, None],
        m.k_specular[:, None],
        m.shininess[:, None],
        m.roughness[:, None],
        m.reflectivity[:, None],
        m.transparency[:, None],
        m.ior[:, None],
    ]
    if with_tex:
        cols.append(m.tex_id.astype(jnp.float32)[:, None])
    mat = jnp.concatenate(cols, axis=1)  # (M, MAT_COLS [+1])
    # Pad ids (-2) gather zero rows; real rows get their material record.
    matrows = onehot_gather(mat, ids)  # (G, MAT_COLS); G is small here
    if with_tex:
        # onehot_gather zeroes out-of-range rows, which would turn pad
        # rows' "no texture" into slot 0; force the -1 sentinel there.
        matrows = matrows.at[:, -1].set(
            jnp.where(ids >= 0, matrows[:, -1], -1.0)
        )
    return jnp.concatenate([table, matrows], axis=1), ranges


def pack_light_table(scene: Scene) -> jnp.ndarray:
    """(8, L) light table for the megakernel: [px py pz | r g b |
    intensity | radius] per column (Code/light.hpp:5-14)."""
    li = scene.lights
    return jnp.stack(
        [
            li.position[:, 0], li.position[:, 1], li.position[:, 2],
            li.color[:, 0], li.color[:, 1], li.color[:, 2],
            li.intensity, li.radius,
        ],
        axis=0,
    ).astype(jnp.float32)
