#!/usr/bin/env python3
"""Stage-level breakdown of the SHIPPED fused path on the bench scene:
times full _trace_wave at increasing max_depth and across shrink
schedules, so the cost of each level group + each shrink-compaction sort
falls out of the differences.  Diagnostic only."""

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
from ray_tracying_tpu.render.camera import pixel_rays
from ray_tracying_tpu.render.integrator import _trace_wave


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument(
        "--scene", default=os.path.join(REPO, "golden/ASCII/scene.json")
    )
    args = ap.parse_args()

    scene = rt.load_scene(args.scene)
    width, height = scene.camera.resolution
    key = jax.random.key(0)
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

    def run(max_depth, shrink):
        f = jax.jit(
            lambda o, d, tm: _trace_wave(
                scene, o, d, tm, key, 1, 0.0, False, max_depth, shrink
            )
        )
        return timeit(f, o, d, tm)

    print(f"{n} rays/tile")
    for depth, shrink, label in [
        (0, (), "L0 only"),
        (1, (), "L0-1"),
        (10, ((2, 4), (4, 2)), "full shipped ((2,4),(4,2))"),
        (10, ((1, 2), (2, 2), (4, 2)), "((1,2),(2,2),(4,2))"),
        (10, ((1, 2), (2, 4), (4, 2)), "((1,2),(2,4),(4,2))"),
        (10, ((2, 4), (4, 4)), "((2,4),(4,4))"),
        (10, ((2, 4), (4, 2), (6, 2)), "((2,4),(4,2),(6,2))"),
        (10, (), "full unshrunk"),
    ]:
        ms = run(depth, shrink)
        print(f"{label:>38}: {ms:8.2f} ms  ({n/ms*1e3/1e6:6.2f} Mrays/s)")


if __name__ == "__main__":
    main()
