#!/usr/bin/env python3
"""Group-occupancy of live lanes entering each bounce level on a scene:
how many G-lane groups contain >=1 live lane, for candidate group sizes.
Decides whether group-granular shrink compaction can replace lane-level
sorts (fragmentation => overflow risk).  Diagnostic only."""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ray_tracying_tpu as rt
from ray_tracying_tpu.render.camera import pixel_rays
from ray_tracying_tpu.render import integrator as I


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--scene", default=os.path.join(REPO, "golden/ASCII/scene.json"))
    args = ap.parse_args()

    scene = rt.load_scene(args.scene)
    width, height = scene.camera.resolution
    key = jax.random.key(0)
    spp = 16
    rows_n = args.rays // (width * spp)
    n = rows_n * width * spp
    ys = jnp.arange(rows_n, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    sub = jax.random.uniform(key, (rows_n, width, spp, 2))
    px = (xs + sub[..., 0]).reshape(-1)
    py = (ys * (height / max(rows_n, 1)) + sub[..., 1]).reshape(-1)
    o, d = pixel_rays(scene.camera, px, py, key)
    tm = jax.random.uniform(jax.random.fold_in(key, 9), (n,))

    from ray_tracying_tpu.kernels.wavefront import (
        Q_ROWS, WAVE_BLOCK, out_rows, pack_tex_matrix,
        tex_kernel_supported, wave_level_call, wave_tables,
    )

    r_pad = -(-n // WAVE_BLOCK) * WAVE_BLOCK
    has_tex = scene.has_textures
    ktex = tex_kernel_supported(scene)
    rows = out_rows(has_tex and not ktex, has_tex and scene.has_spheres)
    table, ranges, lights = wave_tables(scene)
    if ktex:
        tex_m, twh = pack_tex_matrix(scene)
    else:
        tex_m = jnp.zeros((8, 128), jnp.bfloat16)
        twh = jnp.zeros((2, 1), jnp.float32)
    area = tuple(scene.lights.is_area)
    uv_kinds = (scene.has_spheres, scene.has_cubes, scene.has_rects,
                scene.n_planes > 0)
    qrows = jnp.concatenate(
        [o.T, d.T, tm[None, :], jnp.ones((2, n), jnp.float32)], axis=0
    )
    prev = jnp.pad(qrows, ((0, rows - Q_ROWS), (0, r_pad - n)))

    @jax.jit
    def level(prev):
        fuzz = jnp.zeros((1, r_pad), jnp.float32)
        return wave_level_call(
            prev, fuzz, table, lights, tex_m, twh, ranges,
            scene.has_motion, scene.n_lights, scene.has_glossy,
            scene.has_refraction, 0.0, has_tex, uv_kinds, area, 1, ktex,
        )

    gsizes = (128, 256, 512, 2048)

    @jax.jit
    def occ_stats(prev):
        act = prev[7] > 0
        res = [jnp.sum(act)]
        for g in gsizes:
            grp = jnp.any(act.reshape(-1, g), axis=1)
            res.append(jnp.mean(grp.astype(jnp.float32)) * 100)
        return jnp.stack([r.astype(jnp.float32) for r in res])

    print(f"{'lvl':>3} {'live':>9} {'live%':>6}", end="")
    for g in gsizes:
        print(f" {'g' + str(g) + ' grp%':>10}", end="")
    print()
    for lv in range(11):
        st = np.asarray(occ_stats(prev))
        live = int(st[0])
        print(f"{lv:>3} {live:>9} {100 * live / r_pad:>6.2f}", end="")
        for i, g in enumerate(gsizes):
            print(f" {st[1 + i]:>10.2f}", end="")
        print()
        prev = level(prev)


if __name__ == "__main__":
    main()
