#!/usr/bin/env python3
"""Cost of the _wave_tex_modulate XLA glue (atlas gather + trig) per
full-width call on the bench scene, via chained timing.  Diagnostic."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ray_tracying_tpu as rt
from ray_tracying_tpu.render.integrator import _wave_tex_modulate
from ray_tracying_tpu.kernels.wavefront import out_rows

CHAIN = 20


def main():
    scene = rt.load_scene(os.path.join(REPO, "golden/ASCII/scene.json"))
    n = 4177920
    rows = out_rows(True, scene.has_spheres)
    key = jax.random.key(0)
    out = jax.random.uniform(key, (rows, n), jnp.float32)

    @jax.jit
    def run(out):
        def body(c, _):
            contrib = _wave_tex_modulate(scene, c)
            return c.at[9:12].set(contrib), None

        c, _ = jax.lax.scan(body, out, None, length=CHAIN)
        return c

    jax.block_until_ready(run(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(out))
        ts.append((time.time() - t0) * 1e3 / CHAIN)
    print("modulate @", n, "lanes:", round(float(np.median(ts)), 2), "ms")


if __name__ == "__main__":
    main()
