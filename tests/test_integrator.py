"""Wavefront integrator semantics tests (render/integrator.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracying_tpu.render.integrator import trace_wavefront
from ray_tracying_tpu.scene.loader import load_scene_dict

from test_scene_loader import minimal_camera


def trace_dirs(scene, dirs, key=0):
    dirs = jnp.asarray(dirs, jnp.float32)
    o = jnp.zeros_like(dirs)
    return np.asarray(
        trace_wavefront(
            scene, o, dirs, jnp.zeros(dirs.shape[0]), jax.random.key(key), 1
        )
    )


def test_miss_is_background():
    s = load_scene_dict(minimal_camera())
    c = trace_dirs(s, [[0, 1, 0], [1, 0, 0]])
    np.testing.assert_allclose(c, 0.1, atol=1e-7)


def test_opaque_hit_no_children():
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 100.0}
    ]
    d["spheres"] = [{"location": [0, 5, 0], "radius": 1.0,
                     "material": {"diffuse_color": [1, 0, 0]}}]
    s = load_scene_dict(d)
    c = trace_dirs(s, [[0, 1, 0]])
    # Red-ish: ambient 0.1*1 plus diffuse; green/blue only ambient+spec.
    assert c[0, 0] > c[0, 1]
    assert c[0, 0] > 0.05


def test_energy_weights_mirror():
    """local*(1-refl) + refl*child (Code/raytracer.cpp:346-350): a perfect
    mirror (refl=1) facing the background returns exactly background."""
    d = minimal_camera()
    d["rectangles"] = [
        {"translation": [0, 5, 0], "rotation": [1.5707963, 0, 0],
         "scale": [4, 4, 1],
         "material": {"reflectivity": 1.0, "roughness": 0.0}}
    ]
    s = load_scene_dict(d)
    c = trace_dirs(s, [[0, 1, 0]])
    np.testing.assert_allclose(c[0], [0.1, 0.1, 0.1], atol=1e-6)


def test_depth_cutoff_two_mirrors():
    """Two facing perfect mirrors: the ray bounces 11 times then the chain
    terminates in black (depth > 10 -> {0,0,0}, Code/raytracer.cpp:290-292),
    so the result is exactly 0 (every level's local weight is 0)."""
    d = minimal_camera()
    for y in (5.0, -5.0):
        d.setdefault("rectangles", []).append(
            {"translation": [0, y, 0], "rotation": [1.5707963, 0, 0],
             "scale": [4, 4, 1],
             "material": {"reflectivity": 1.0, "roughness": 0.0}}
        )
    s = load_scene_dict(d)
    c = trace_dirs(s, [[0, 1, 0]])
    np.testing.assert_allclose(c[0], 0.0, atol=1e-6)


def test_transparency_passthrough():
    """A fully transparent, non-refracting (ior=1) slab passes the
    background through: trans=1 -> child carries all throughput."""
    d = minimal_camera()
    d["rectangles"] = [
        {"translation": [0, 5, 0], "rotation": [1.5707963, 0, 0],
         "scale": [4, 4, 1],
         "material": {"transparency": 1.0, "refractive_index": 1.0}}
    ]
    s = load_scene_dict(d)
    c = trace_dirs(s, [[0, 1, 0]])
    np.testing.assert_allclose(c[0], [0.1, 0.1, 0.1], atol=1e-6)


def test_glossy_absorption_black():
    """roughness >> 1 perturbs most reflection rays below the surface ->
    absorbed (black), so a rough mirror tends to black, not background
    (Code/raytracer.cpp:322-327)."""
    d = minimal_camera()
    d["rectangles"] = [
        {"translation": [0, 5, 0], "rotation": [1.5707963, 0, 0],
         "scale": [4, 4, 1],
         "material": {"reflectivity": 1.0, "roughness": 50.0}}
    ]
    s = load_scene_dict(d)
    n = 512
    c = trace_dirs(s, [[0, 1, 0]] * n)
    # ~half the fuzzed rays point into the surface -> absorbed.  Mean
    # radiance must be well below the full-background 0.1.
    assert c.mean() < 0.08


def test_queue_growth_mirror_plus_glass():
    """Scene with both reflective and refractive materials exercises the
    2-way branching queue; result must stay finite and >= background
    contributions only."""
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 200.0}
    ]
    d["spheres"] = [
        {"location": [-1, 5, 0], "radius": 1.0,
         "material": {"reflectivity": 0.5}},
        {"location": [1.5, 5, 0], "radius": 1.0,
         "material": {"transparency": 0.7, "refractive_index": 1.5}},
    ]
    s = load_scene_dict(d)
    dirs = []
    for x in np.linspace(-0.5, 0.5, 16):
        v = np.array([x, 1.0, 0.0])
        dirs.append(v / np.linalg.norm(v))
    c = trace_dirs(s, dirs)
    assert np.isfinite(c).all()
    assert (c >= 0).all()
