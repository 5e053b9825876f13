#!/usr/bin/env python3
"""On-hardware parity check: render the deterministic golden scenes on the
real TPU (Pallas kernels compiled, not interpreted) and diff against the
committed reference goldens (golden/Output/*.ppm).

This makes "golden parity <= 1 uint8 on the TPU" an artifact
(TPU_PARITY.json) instead of a commit-message claim — CPU pytest runs the
same scenes through the jnp oracle / interpreted kernels only
(tests/conftest.py forces cpu).

Covers both kernel routes: brute megakernel (use_bvh=False) and LBVH
traversal (use_bvh=True), plus the fused-normal inference path the
pipeline selects on its own.

Usage: python tools/tpu_parity.py        (requires the TPU backend)
Writes TPU_PARITY.json at the repo root and exits nonzero on failure.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402

SCENES = os.path.join(REPO, "scenes")
GOLD = os.path.join(REPO, "golden", "Output")
TEX = os.path.join(REPO, "golden", "Textures")

# (scene, golden, samples_sqrt, light_samples, use_bvh, max_uint8_diff)
CASES = [
    ("det_basic", "det_basic_s1.ppm", 1, 1, False, 1),
    ("det_basic", "det_basic_s1.ppm", 1, 1, True, 1),
    ("det_mirrors", "det_mirrors_s1.ppm", 1, 1, False, 1),
    ("texture", "texture_s1.ppm", 1, 1, False, 1),
    ("bvh_det", "bvh_det_s1.ppm", 1, 1, False, 1),
    ("bvh_det", "bvh_det_s1.ppm", 1, 1, True, 1),
]


def main():
    import ray_tracying_tpu as rt

    backend = jax.default_backend()
    results = {"backend": backend, "devices": len(jax.devices()), "cases": []}
    ok = True
    for scene_name, golden, s, ls, use_bvh, tol in CASES:
        scene = rt.load_scene(
            os.path.join(SCENES, f"{scene_name}.json"), textures_dir=TEX
        )
        opts = rt.RenderOptions(
            samples_sqrt=s, light_samples=ls, use_bvh=use_bvh
        )
        t0 = time.time()
        img = np.asarray(
            rt.render_to_srgb_u8(scene, opts, key=jax.random.key(0))
        )
        dt = time.time() - t0
        gold = np.asarray(rt.read_ppm(os.path.join(GOLD, golden)))
        diff = np.abs(img.astype(int) - gold.astype(int))
        case = {
            "scene": scene_name,
            "use_bvh": use_bvh,
            "max_uint8_diff": int(diff.max()),
            "frac_nonzero": float((diff > 0).mean()),
            "tol": tol,
            "pass": bool(diff.max() <= tol and (diff > 0).mean() < 0.01),
            "seconds": round(dt, 3),
        }
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
