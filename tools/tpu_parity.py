#!/usr/bin/env python3
"""On-hardware parity check: render the golden scenes on the real TPU
(Pallas kernels compiled, not interpreted) and diff against the committed
reference goldens (golden/Output/*.ppm).

This makes "golden parity on the TPU" an artifact (TPU_PARITY.json)
instead of a commit-message claim — CPU pytest runs the same scenes
through the jnp oracle / interpreted kernels only (tests/conftest.py
forces cpu).

Coverage (r4 expansion — every row renders on hardware):
  - deterministic scenes, brute megakernel AND LBVH routes, <= 1 uint8
    (the reference's exact output contract, Code/raytracer.cpp:446-457)
  - the stochastic effect demos (soft shadows / DoF / motion blur /
    glossy) vs their goldens with the statistical tolerance of
    tests/test_parity_golden.py (different RNG streams, same estimator:
    mean |diff| < 1.0, p99 <= 8)
  - a 50k-geom sphere_field closest-hit through the beyond-SMEM
    chunk-streaming kernels vs the dense jnp oracle (t allclose, ids
    equal) — the any-N acceleration story
    (reference Code/acceleration.cpp:20-64) on hardware
  - a 1-device-mesh shard_map(trace) case, bit-identical to the
    unsharded trace — proof that shard_map∘pallas_call lowers and runs
    on the hardware path multi-chip would use

Usage: python tools/tpu_parity.py        (requires the TPU backend)
Writes TPU_PARITY.json at the repo root and exits nonzero on failure.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Persistent compilation cache BEFORE the first backend touch: the suite
# is compile-dominated (r4: 458 s for one case), and re-runs hit the
# cache across processes (VERDICT r4 item 7).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SCENES = os.path.join(REPO, "scenes")
GOLD = os.path.join(REPO, "golden", "Output")
TEX = os.path.join(REPO, "golden", "Textures")

# (scene, golden, samples_sqrt, light_samples, use_bvh)
DET_CASES = [
    ("det_basic", "det_basic_s1.ppm", 1, 1, False),
    ("det_basic", "det_basic_s1.ppm", 1, 1, True),
    ("det_mirrors", "det_mirrors_s1.ppm", 1, 1, False),
    # two-way (mirror+glass on ONE material): compacted-queue discipline
    ("det_twoway", "det_twoway_s1.ppm", 1, 1, False),
    ("texture", "texture_s1.ppm", 1, 1, False),
    ("texture", "texture_s1.ppm", 1, 1, True),
    ("bvh_det", "bvh_det_s1.ppm", 1, 1, False),
    ("bvh_det", "bvh_det_s1.ppm", 1, 1, True),
]

# Stochastic effects: both images are Monte-Carlo estimates with
# different RNG streams; tolerance matches tests/test_parity_golden.py.
STOCH_CASES = [
    ("softshadow", "softshadow_s4_l16.ppm", 4, 16, False),
    ("det_twoway", "det_twoway_s6.ppm", 6, 1, False),
    ("dof", "dof_s6.ppm", 6, 1, False),
    ("motion", "motion_s6.ppm", 6, 1, False),
    ("glossy", "glossy_s6.ppm", 6, 1, False),
    ("bvh_glossy", "bvh_glossy_s8.ppm", 8, 1, False),
]


def run_det_case(rt, scene_name, golden, s, ls, use_bvh):
    scene = rt.load_scene(
        os.path.join(SCENES, f"{scene_name}.json"), textures_dir=TEX
    )
    opts = rt.RenderOptions(samples_sqrt=s, light_samples=ls, use_bvh=use_bvh)
    t0 = time.time()
    img = np.asarray(rt.render_to_srgb_u8(scene, opts, key=jax.random.key(0)))
    t_first = time.time() - t0
    t0 = time.time()
    img = np.asarray(rt.render_to_srgb_u8(scene, opts, key=jax.random.key(0)))
    t_run = time.time() - t0
    gold = np.asarray(rt.read_ppm(os.path.join(GOLD, golden)))
    diff = np.abs(img.astype(int) - gold.astype(int))
    return {
        "scene": scene_name,
        "kind": "deterministic",
        "use_bvh": use_bvh,
        "max_uint8_diff": int(diff.max()),
        "frac_nonzero": float((diff > 0).mean()),
        "tol": 1,
        "pass": bool(diff.max() <= 1 and (diff > 0).mean() < 0.01),
        "seconds": round(t_first, 3),
        "run_seconds": round(t_run, 3),
        "compile_seconds": round(max(t_first - t_run, 0.0), 3),
    }


def run_stoch_case(rt, scene_name, golden, s, ls, use_bvh):
    scene = rt.load_scene(
        os.path.join(SCENES, f"{scene_name}.json"), textures_dir=TEX
    )
    opts = rt.RenderOptions(samples_sqrt=s, light_samples=ls, use_bvh=use_bvh)
    t0 = time.time()
    img = np.asarray(rt.render_to_srgb_u8(scene, opts, key=jax.random.key(7)))
    t_first = time.time() - t0
    t0 = time.time()
    img = np.asarray(rt.render_to_srgb_u8(scene, opts, key=jax.random.key(7)))
    t_run = time.time() - t0
    gold = np.asarray(rt.read_ppm(os.path.join(GOLD, golden)))
    diff = np.abs(img.astype(np.float32) - gold.astype(np.float32))
    mean = float(diff.mean())
    p99 = float(np.percentile(diff, 99))
    return {
        "scene": scene_name,
        "kind": "stochastic",
        "use_bvh": use_bvh,
        "mean_diff": round(mean, 4),
        "p99_diff": round(p99, 2),
        "tol": "mean<1.0, p99<=8",
        "pass": bool(mean < 1.0 and p99 <= 8),
        "seconds": round(t_first, 3),
        "run_seconds": round(t_run, 3),
        "compile_seconds": round(max(t_first - t_run, 0.0), 3),
    }


def run_chunk_case(rt, n_geoms=50_000, n_rays=4096):
    """Beyond-SMEM chunk-streaming closest hit vs the dense jnp oracle."""
    from ray_tracying_tpu.accel.lbvh import with_chunks
    from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_chunks
    from ray_tracying_tpu.models import zoo
    from ray_tracying_tpu.render import intersect as I
    from ray_tracying_tpu.render.camera import pixel_rays

    scene = with_chunks(zoo.sphere_field(n=n_geoms, res=(128, 72)))
    w, h = scene.camera.resolution
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.uniform(0, w, n_rays), jnp.float32)
    py = jnp.asarray(rng.uniform(0, h, n_rays), jnp.float32)
    o, d = pixel_rays(scene.camera, px, py, jax.random.key(1))
    tm = jnp.zeros(n_rays, jnp.float32)

    t0 = time.time()
    t_k, id_k = jax.block_until_ready(closest_hit_tid_chunks(scene, o, d, tm))
    dt = time.time() - t0
    # Dense oracle in ray blocks: (block, geoms) temporaries — the full
    # (4096, 50k) matrix exhausts HBM through intersect's intermediates.
    blk = 256
    t_parts, id_parts = [], []
    oracle = jax.jit(
        lambda ob, db, tb: I.all_hit_t(scene, ob, db, tb)
    )
    for i in range(0, n_rays, blk):
        tmat = oracle(o[i : i + blk], d[i : i + blk], tm[i : i + blk])
        t_b = jnp.min(tmat, axis=1)
        id_b = jnp.where(
            jnp.isfinite(t_b), jnp.argmin(tmat, axis=1).astype(jnp.int32), -1
        )
        t_parts.append(np.asarray(t_b))
        id_parts.append(np.asarray(id_b))
    t_ref = np.concatenate(t_parts)
    id_ref = np.concatenate(id_parts)
    t_k, id_k = np.asarray(t_k), np.asarray(id_k)
    fin = np.isfinite(t_ref)
    t_ok = bool(
        np.allclose(t_k[fin], t_ref[fin], rtol=1e-5, atol=1e-5)
        and (np.isfinite(t_k) == fin).all()
    )
    id_ok = bool((id_k == id_ref).all())
    return {
        "scene": f"sphere_field_{n_geoms}",
        "kind": "chunk_stream",
        "geoms": int(scene.n_geoms),
        "rays": int(n_rays),
        "hit_frac": float(fin.mean()),
        "t_allclose": t_ok,
        "ids_equal": id_ok,
        "pass": bool(t_ok and id_ok),
        "seconds": round(dt, 3),
    }


def run_sharded_case(rt):
    """shard_map(trace) on a 1-device mesh must lower, run, and produce
    the bit-identical image to the unsharded trace (deterministic scene,
    so the per-shard RNG fold is inert)."""
    from ray_tracying_tpu.parallel.sharding import (
        make_mesh,
        trace_wavefront_sharded,
    )
    from ray_tracying_tpu.render.camera import pixel_rays
    from ray_tracying_tpu.render.integrator import trace_wavefront

    scene = rt.load_scene(
        os.path.join(SCENES, "det_basic.json"), textures_dir=TEX
    )
    w, h = scene.camera.resolution
    xs = (np.arange(w, dtype=np.float32) + 0.5)
    ys = (np.arange(h, dtype=np.float32) + 0.5)
    px, py = np.meshgrid(xs, ys)
    key = jax.random.key(0)
    o, d = pixel_rays(scene.camera, px.ravel(), py.ravel(), key)
    tm = jnp.zeros(o.shape[0], jnp.float32)

    mesh = make_mesh(1)
    f = jax.jit(
        lambda o, d, tm: trace_wavefront_sharded(
            scene, o, d, tm, key, 1, mesh
        )
    )
    t0 = time.time()
    sharded = np.asarray(jax.block_until_ready(f(o, d, tm)))
    dt = time.time() - t0
    base = np.asarray(
        jax.jit(
            lambda o, d, tm: trace_wavefront(
                scene, o, d, tm, jax.random.fold_in(key, 0), 1
            )
        )(o, d, tm)
    )
    max_abs = float(np.abs(sharded - base).max())
    return {
        "scene": "det_basic",
        "kind": "sharded",
        "mesh_devices": 1,
        "rays": int(o.shape[0]),
        "max_abs_diff": max_abs,
        "pass": bool(max_abs == 0.0),
        "seconds": round(dt, 3),
    }


def main():
    import ray_tracying_tpu as rt

    backend = jax.default_backend()
    results = {"backend": backend, "devices": len(jax.devices()), "cases": []}
    ok = True
    for scene_name, golden, s, ls, use_bvh in DET_CASES:
        case = run_det_case(rt, scene_name, golden, s, ls, use_bvh)
        ok &= case["pass"]
        results["cases"].append(case)
        print(json.dumps(case))
    for scene_name, golden, s, ls, use_bvh in STOCH_CASES:
        case = run_stoch_case(rt, scene_name, golden, s, ls, use_bvh)
        ok &= case["pass"]
        results["cases"].append(case)
        print(json.dumps(case))
    for runner in (run_chunk_case, run_sharded_case):
        case = runner(rt)
        ok &= case["pass"]
        results["cases"].append(case)
        print(json.dumps(case))

    results["ok"] = bool(ok)
    with open(os.path.join(REPO, "TPU_PARITY.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"TPU_PARITY.json written: ok={ok} backend={backend}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
