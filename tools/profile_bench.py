#!/usr/bin/env python3
"""Perf breakdown on the bvh stress scene: time closest-hit alone, shade
alone, and the full wavefront trace, brute-force vs LBVH, at several tile
sizes.  Diagnostic only (not the headline bench)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ray_tracying_tpu as rt
from ray_tracying_tpu.accel.lbvh import with_bvh
from ray_tracying_tpu.render.camera import pixel_rays
from ray_tracying_tpu.render.integrator import trace_wavefront
from ray_tracying_tpu.render.intersect import closest_hit, min_hit_t


def timeit(label, fn, *args, trials=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(trials):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / trials
    print(f"{label:55s} {dt*1e3:9.2f} ms")
    return dt


def main():
    scene = rt.load_scene(os.path.join(REPO, "golden", "ASCII", "scene.json"))
    scene_b = with_bvh(scene)
    key = jax.random.key(0)
    width, height = scene.camera.resolution

    for n in (1 << 20, 1 << 22):
        k1, k2 = jax.random.split(jax.random.fold_in(key, n))
        xs = jax.random.uniform(k1, (n,)) * width
        ys = jax.random.uniform(k2, (n,)) * height
        o, d = pixel_rays(scene.camera, xs, ys, key)
        tm = jnp.zeros(n)
        act = jnp.ones(n, bool)

        ch = jax.jit(lambda s, o, d, t, a: closest_hit(s, o, d, t, a, False))
        chb = jax.jit(lambda s, o, d, t, a: closest_hit(s, o, d, t, a, True))
        mh = jax.jit(lambda s, o, d, t, a: min_hit_t(s, o, d, t, a, False))
        tw = jax.jit(
            lambda s, o, d, t, k: trace_wavefront(s, o, d, t, k, 1, 2, False)
        )
        twb = jax.jit(
            lambda s, o, d, t, k: trace_wavefront(s, o, d, t, k, 1, 2, True)
        )

        print(f"--- N = {n} rays ---")
        t_ch = timeit("closest_hit brute", ch, scene, o, d, tm, act)
        t_chb = timeit("closest_hit bvh", chb, scene_b, o, d, tm, act)
        timeit("min_hit_t brute (shadow-style)", mh, scene, o, d, tm, act)
        t_tw = timeit("trace_wavefront full (11 levels) brute", tw, scene, o, d, tm, key)
        t_twb = timeit("trace_wavefront full (11 levels) bvh", twb, scene_b, o, d, tm, key)
        print(f"  full-trace rays/s brute: {n/t_tw:,.0f}   bvh: {n/t_twb:,.0f}")
        print(f"  one closest-hit pass:  brute {n/t_ch:,.0f} rays/s, bvh {n/t_chb:,.0f} rays/s")


if __name__ == "__main__":
    main()
