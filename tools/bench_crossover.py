#!/usr/bin/env python3
"""Brute-force megakernel vs LBVH traversal kernel across scene sizes.

The bundled reference scene has 141 geoms — small enough that the O(R*G)
brute kernel wins on a TPU (no divergence, perfect pipelining).  This
bench sweeps procedural sphere_field scenes to find the crossover where
the traversal kernel's pruning overtakes brute force.  Timing uses
chained dependent dispatches (scan) because plain block_until_ready
returns early through the axon tunnel.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from ray_tracying_tpu import models
from ray_tracying_tpu.accel.lbvh import with_bvh
from ray_tracying_tpu.render.camera import pixel_rays


@functools.partial(jax.jit, static_argnames=("k", "use_bvh", "sort_rays"))
def chained(scene, o, d, tm, k, use_bvh, sort_rays=False):
    from ray_tracying_tpu.render.intersect import min_hit_t

    def body(carry, _):
        tmc = carry
        t = min_hit_t(scene, o, d, tmc, None, use_bvh, sort_rays)
        nxt = jnp.where(jnp.isfinite(t), t - jnp.floor(t), 0.0)
        return nxt, t[0]

    out, ts = jax.lax.scan(body, tm, None, length=k)
    return out[0] + ts.sum()


def per_pass_ms(scene, o, d, tm, use_bvh, reps=10, sort_rays=False):
    f = lambda K: float(chained(scene, o, d, tm, K, use_bvh, sort_rays))
    f(1)
    f(reps + 1)
    t0 = time.time(); f(1); a = time.time() - t0
    t0 = time.time(); f(reps + 1); b = time.time() - t0
    return (b - a) / reps * 1e3


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--incoherent", action="store_true",
                    help="random pixel order (worst case for the "
                    "block-coherent traversal) instead of scanline order")
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[128, 512, 2048, 8192, 24576, 49152, 98304])
    args = ap.parse_args()

    from ray_tracying_tpu.accel.lbvh import with_chunks
    from ray_tracying_tpu.kernels.closest_hit import BRUTE_SMEM_MAX_GEOMS

    n_rays = 1 << 20
    key = jax.random.key(0)
    print(
        f"{'geoms':>8} {'brute ms':>10} {'lbvh ms':>10} {'lbvh+sort':>10} "
        f"{'winner':>10}"
    )
    print(
        f"(sizes > {BRUTE_SMEM_MAX_GEOMS} exceed the SMEM-resident table "
        "and run the chunk-culled streaming kernels — columns become "
        "chunk / chunk+sort)"
    )
    for n in args.sizes:
        scene = models.sphere_field(n=n, res=(320, 180))
        big = n + 1 > BRUTE_SMEM_MAX_GEOMS
        scene_b = with_chunks(scene) if big else with_bvh(scene)
        w, h = scene.camera.resolution
        if args.incoherent:
            k1, k2 = jax.random.split(jax.random.fold_in(key, n))
            xs = jax.random.uniform(k1, (n_rays,)) * w
            ys = jax.random.uniform(k2, (n_rays,)) * h
        else:
            # Scanline order with subpixel samples — what render tiles
            # actually trace (spp consecutive rays per pixel).
            spp = max(1, n_rays // (w * h))
            idx = jnp.arange(n_rays) // spp
            xs = (idx % w).astype(jnp.float32) + 0.5
            ys = (idx // w % h).astype(jnp.float32) + 0.5
        o, d = pixel_rays(scene.camera, xs, ys, key)
        tm = jnp.zeros(n_rays)
        if big:
            # Beyond-SMEM: the chunk-streaming kernel IS the path (both
            # with and without the coherence ray sort); the dense brute
            # kernel can't hold the table and the SMEM LBVH is gated off.
            ms_chunk = per_pass_ms(scene_b, o, d, tm, False)
            ms_sort = per_pass_ms(scene_b, o, d, tm, False, sort_rays=True)
            winner = "chunk" if ms_chunk <= ms_sort else "chunk+sort"
            print(
                f"{n + 1:>8} {'-':>10} {ms_chunk:>10.2f} {ms_sort:>10.2f} "
                f"{winner:>10}  (chunk-stream)"
            )
            continue
        ms_brute = per_pass_ms(scene, o, d, tm, False)
        ms_bvh = per_pass_ms(scene_b, o, d, tm, True)
        ms_sort = per_pass_ms(scene_b, o, d, tm, True, sort_rays=True)
        best = min(ms_brute, ms_bvh, ms_sort)
        winner = (
            "brute" if best == ms_brute
            else ("lbvh" if best == ms_bvh else "lbvh+sort")
        )
        print(
            f"{n + 1:>8} {ms_brute:>10.2f} {ms_bvh:>10.2f} {ms_sort:>10.2f} "
            f"{winner:>10}"
        )


if __name__ == "__main__":
    main()
