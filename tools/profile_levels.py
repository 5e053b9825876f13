#!/usr/bin/env python3
"""Per-level, per-pass cost breakdown of the wavefront trace on the bench
scene (VERDICT r1 item 6: where do 11 bounce levels spend the frame?).

Unrolls the integrator's level loop in host Python with each pass jitted
separately (closest-hit kernel / shade+occlusion / spawn), so every pass
can be timed with block_until_ready.  Also reports per-level live-ray and
live-BLOCK occupancy (blocks of BLOCK_R rays — the kernel's dead-block
skip granularity).  Diagnostic only; the shipped integrator stays a
lax.scan."""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ray_tracying_tpu as rt
from ray_tracying_tpu.core import constants as C
from ray_tracying_tpu.core.vecmath import dot, reflect
from ray_tracying_tpu.kernels.closest_hit import BLOCK_R
from ray_tracying_tpu.render.camera import pixel_rays
from ray_tracying_tpu.render.intersect import closest_hit
from ray_tracying_tpu.render.materials import gather_materials
from ray_tracying_tpu.render.shade import shade


def timed(fn, *args, **kw):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args, **kw))
    return out, (time.time() - t0) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--bvh", action="store_true")
    ap.add_argument("--scene", default=os.path.join(REPO, "golden/ASCII/scene.json"))
    args = ap.parse_args()

    scene = rt.load_scene(args.scene)
    if args.bvh:
        from ray_tracying_tpu.accel.lbvh import with_bvh

        scene = with_bvh(scene)
    width, height = scene.camera.resolution
    key = jax.random.key(0)

    # One bench-shaped tile: rows*width*16 spp scanline rays.
    spp = 16
    rows = args.rays // (width * spp)
    n = rows * width * spp
    ys = jnp.arange(rows, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    sub = jax.random.uniform(key, (rows, width, spp, 2))
    px = (xs + sub[..., 0]).reshape(-1)
    py = (ys * (height / max(rows, 1)) + sub[..., 1]).reshape(-1)
    o, d = pixel_rays(scene.camera, px, py, key)
    tm = jax.random.uniform(jax.random.fold_in(key, 9), (n,))

    f_hit = jax.jit(
        lambda s, o, d, t, a: closest_hit(s, o, d, t, a, args.bvh, False)
    )

    def _shade(s, hit, o, k, act):
        mrec = gather_materials(s, hit.geom_id)
        local = shade(s, hit, o, k, 1, mrec, act, args.bvh)
        return local, mrec

    f_shade = jax.jit(_shade)

    def _spawn(s, q_o, q_d, hit, mrec, act):
        rdir = reflect(q_d, hit.normal)
        tp_ok = act & (mrec.reflectivity > 0.0) & (dot(rdir, rdir) > 1e-3)
        return hit.point + hit.normal * C.EPS_NORMAL_OFFSET, rdir, tp_ok

    f_spawn = jax.jit(_spawn)

    q_o, q_d, q_t = o, d, tm
    act = jnp.ones(n, bool)
    print(f"{n} rays/tile, blocks of {BLOCK_R}, bvh={args.bvh}")
    print(
        f"{'lvl':>3} {'live':>9} {'live%':>6} {'blk%':>6} "
        f"{'hit_ms':>8} {'shade_ms':>9} {'spawn_ms':>9}"
    )
    tot = dict(hit=0.0, shade=0.0, spawn=0.0)
    for level in range(11):
        a = np.asarray(act)
        live = int(a.sum())
        blk = float(a.reshape(-1, BLOCK_R).any(axis=1).mean()) * 100
        if level == 0:  # warm the jits so level 0 isn't compile time
            jax.block_until_ready(f_hit(scene, q_o, q_d, q_t, act))
        hit, t_hit = timed(f_hit, scene, q_o, q_d, q_t, act)
        act_hit = act & hit.valid
        if level == 0:
            jax.block_until_ready(f_shade(scene, hit, q_o, key, act_hit))
        (local, mrec), t_shade = timed(f_shade, scene, hit, q_o, key, act_hit)
        if level == 0:
            jax.block_until_ready(f_spawn(scene, q_o, q_d, hit, mrec, act_hit))
        (no, nd, nact), t_spawn = timed(f_spawn, scene, q_o, q_d, hit, mrec, act_hit)
        print(
            f"{level:>3} {live:>9} {100.0 * live / n:>6.2f} {blk:>6.1f} "
            f"{t_hit:>8.2f} {t_shade:>9.2f} {t_spawn:>9.2f}"
        )
        tot["hit"] += t_hit
        tot["shade"] += t_shade
        tot["spawn"] += t_spawn
        q_o, q_d, q_t, act = no, nd, jnp.zeros(n), nact
    print(
        f"totals: hit {tot['hit']:.1f} ms, shade {tot['shade']:.1f} ms, "
        f"spawn {tot['spawn']:.1f} ms  => {sum(tot.values()):.1f} ms/tile"
    )


if __name__ == "__main__":
    main()
