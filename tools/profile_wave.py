#!/usr/bin/env python3
"""Per-level cost breakdown of the FUSED wave path (the headline bench
path) on the bundled bvh scene, with live-lane occupancy per level.

Round-3 note: shadow visibility is now fused INTO the level megakernel
(kernels/wavefront.py), so there is exactly one kernel per level — the
separate occlusion columns of the r2 profile are gone.  The r2 "before"
numbers (occ as separate kernels): wave 152.7 ms + occ 188.5 ms = 341 ms
per 4.2M-ray tile, with occ stuck at ~16 ms/level even at 0.1% live.

Timing methodology: block_until_ready can return early through the axon
tunnel (BASELINE.md), so every pass is timed as a lax.scan CHAIN of
`--chain` data-dependent calls on the SAME input (the output feeds back
as `prev + 0*out`, preserving the level's queue state while forcing
serialization), divided by the chain length.

Writes a JSON report to --out (default stdout only).
"""

import argparse
import functools
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
from ray_tracying_tpu.core.sampling import uniform_in_unit_sphere
from ray_tracying_tpu.render.camera import pixel_rays


def timed_chain(fn, feedback, x, chain):
    """Median-of-3 wall time of a lax.scan chain of `chain` dependent
    calls of fn on x (feedback(x, out) must return a tensor == x with a
    data dependency on out).  Returns ms per call."""

    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(c)
            return feedback(c, out), None

        c, _ = jax.lax.scan(body, x0, None, length=chain)
        return c

    jax.block_until_ready(run(x))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(x))
        ts.append((time.time() - t0) * 1e3 / chain)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--scene", default=os.path.join(REPO, "golden/ASCII/scene.json")
    )
    ap.add_argument("--light-samples", type=int, default=1)
    args = ap.parse_args()

    from ray_tracying_tpu.kernels.wavefront import (
        Q_ROWS,
        WAVE_BLOCK,
        out_rows,
        wave_level_call,
        wave_supported,
        wave_tables,
    )

    scene = rt.load_scene(
        args.scene, textures_dir=os.path.join(REPO, "golden/Textures")
    )
    assert wave_supported(scene, args.light_samples), "scene outside the wave gate"
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

    from ray_tracying_tpu.kernels.wavefront import (
        pack_tex_matrix,
        tex_kernel_supported,
    )

    n_l = scene.n_lights
    has_tex = scene.has_textures
    ktex = tex_kernel_supported(scene)
    r_pad = -(-n // WAVE_BLOCK) * WAVE_BLOCK
    rows_out = out_rows(has_tex and not ktex, has_tex and scene.has_spheres)
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
    boot = jnp.pad(qrows, ((0, rows_out - Q_ROWS), (0, r_pad - n)))

    def fuzz_for(k):
        parts = []
        if scene.has_glossy:
            parts.append(uniform_in_unit_sphere(k, (r_pad,)).T)
        for li in range(n_l):
            if area[li]:
                s = uniform_in_unit_sphere(
                    jax.random.fold_in(k, 2 + li), (r_pad, args.light_samples)
                )
                parts.append(
                    s.transpose(1, 2, 0).reshape(3 * args.light_samples, r_pad)
                )
        if not parts:
            return jnp.zeros((1, r_pad), jnp.float32)
        return jnp.concatenate(parts, axis=0)

    step = jax.jit(
        lambda p, k: wave_level_call(
            p, fuzz_for(k), table, lights, tex_m, twh, ranges,
            scene.has_motion, n_l, scene.has_glossy, scene.has_refraction,
            0.0, has_tex, uv_kinds, area, args.light_samples, ktex,
        )
    )

    report = {
        "scene": os.path.basename(args.scene),
        "rays": n,
        "wave_block": WAVE_BLOCK,
        "n_lights": n_l,
        "fused_occlusion": True,
        "backend": jax.devices()[0].platform,
        "levels": [],
    }
    prev = boot
    tot_wave = 0.0
    print(
        f"{n} rays/tile, WAVE_BLOCK={WAVE_BLOCK}, lights={n_l}, "
        f"backend={jax.devices()[0].platform}"
    )
    print(f"{'lvl':>3} {'live':>9} {'live%':>6} {'wave_ms':>8}")
    for level in range(11):
        k_level = jax.random.fold_in(key, level)
        fz = fuzz_for(jax.random.fold_in(k_level, 1))
        live = int(np.asarray(jnp.sum(prev[7] > 0)))

        t_wave = timed_chain(
            lambda c: wave_level_call(
                c, fz, table, lights, tex_m, twh, ranges, scene.has_motion,
                n_l, scene.has_glossy, scene.has_refraction, 0.0, has_tex,
                uv_kinds, area, args.light_samples, ktex,
            ),
            lambda c, out: c + 0.0 * out,
            prev,
            args.chain,
        )
        prev = jax.block_until_ready(step(prev, jax.random.fold_in(k_level, 1)))

        row = {
            "level": level,
            "live": live,
            "live_frac": round(live / n, 5),
            "wave_ms": round(t_wave, 3),
        }
        report["levels"].append(row)
        tot_wave += t_wave
        print(f"{level:>3} {live:>9} {100*live/n:>6.2f} {t_wave:>8.2f}")

    report["total_ms_per_tile"] = round(tot_wave, 2)
    print(
        f"totals: wave {tot_wave:.1f} ms/tile of {n} rays "
        f"({n / tot_wave / 1e3:.1f}M rays/s kernel-only)"
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
