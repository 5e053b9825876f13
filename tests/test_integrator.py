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


def test_stats_single_level_local_scene():
    """No-spawn scene: stats has one level, live == R, hits == hit count."""
    d = minimal_camera()
    d["spheres"] = [{"location": [0, 5, 0], "radius": 1.0}]
    s = load_scene_dict(d)
    dirs = jnp.asarray([[0, 1, 0], [0, -1, 0], [0, 1, 0]], jnp.float32)
    _, st = trace_wavefront(
        s, jnp.zeros_like(dirs), dirs, jnp.zeros(3), jax.random.key(0), 1,
        return_stats=True,
    )
    assert st.live.shape == (1,)
    assert int(st.live[0]) == 3
    assert int(st.hits[0]) == 2
    assert int(st.spawned[0]) == 0
    assert int(st.dropped[0]) == 0


def _mirror_glass_scene():
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
    return load_scene_dict(d)


def test_stats_mirror_glass_no_drops_at_mult2():
    """One-way branching per hit (no material both reflects and refracts):
    queue_mult=2 must never overflow -> dropped identically zero, and the
    live count entering each level equals the previous level's spawns."""
    s = _mirror_glass_scene()
    n = 64
    k1, k2 = jax.random.split(jax.random.key(3))
    dirs = jnp.concatenate(
        [jax.random.uniform(k1, (n, 1)) * 0.8 - 0.4,
         jnp.ones((n, 1)),
         jax.random.uniform(k2, (n, 1)) * 0.4 - 0.2],
        axis=1,
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    _, st = trace_wavefront(
        s, jnp.zeros_like(dirs), dirs, jnp.zeros(n), jax.random.key(0), 1,
        queue_mult=2, return_stats=True,
    )
    assert int(jnp.sum(st.dropped)) == 0
    live = np.asarray(st.live)
    spawned = np.asarray(st.spawned)
    assert live[0] == n
    np.testing.assert_array_equal(live[1:], spawned[:-1])


def test_stats_zoo_scenes_no_drops_at_default_mult():
    """The bundled demo zoo (incl. the mirror+glass cornell) must not drop
    continuations at the default queue_mult=2."""
    from ray_tracying_tpu.models.zoo import cornell

    s = cornell(res=(16, 16))
    assert s.has_reflection and s.has_refraction  # exercises 2-way compaction
    n = 128
    k = jax.random.key(7)
    px = jax.random.uniform(jax.random.fold_in(k, 0), (n,)) * 16
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * 16
    from ray_tracying_tpu.render.camera import pixel_rays

    o, d = pixel_rays(s.camera, px, py, jax.random.fold_in(k, 2))
    _, st = trace_wavefront(
        s, o, d, jnp.zeros(n), jax.random.key(0), 1, queue_mult=2,
        return_stats=True,
    )
    assert int(jnp.sum(st.dropped)) == 0


def test_stats_overflow_is_counted():
    """A material that BOTH reflects and refracts branches 2x per hit;
    queue_mult=1 cannot hold the growth, and the drop counter must see it
    (the drop itself is the documented overflow policy)."""
    d = minimal_camera()
    # Two parallel both-ways slabs: every hit spawns 2 children.
    for y in (5.0, 7.0):
        d.setdefault("rectangles", []).append(
            {"translation": [0, y, 0], "rotation": [1.5707963, 0, 0],
             "scale": [40, 40, 1],
             "material": {"reflectivity": 0.5, "transparency": 0.5,
                          "refractive_index": 1.0, "roughness": 0.0}}
        )
    s = load_scene_dict(d)
    n = 8
    dirs = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    _, st = trace_wavefront(
        s, jnp.zeros_like(dirs), dirs, jnp.zeros(n), jax.random.key(0), 1,
        queue_mult=1, return_stats=True,
    )
    assert int(jnp.sum(st.dropped)) > 0
    # And the roomy queue sees none.
    _, st2 = trace_wavefront(
        s, jnp.zeros_like(dirs), dirs, jnp.zeros(n), jax.random.key(0), 1,
        queue_mult=4, return_stats=True,
    )
    assert int(jnp.sum(st2.dropped)) == 0


def test_stats_do_not_change_image():
    s = _mirror_glass_scene()
    dirs = jnp.asarray([[0, 1, 0], [0.2, 1, 0.1]], jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    o = jnp.zeros_like(dirs)
    t = jnp.zeros(2)
    plain = trace_wavefront(s, o, dirs, t, jax.random.key(1), 1)
    with_st, _ = trace_wavefront(
        s, o, dirs, t, jax.random.key(1), 1, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_st))


def test_render_with_stats_pipeline():
    from ray_tracying_tpu.render.pipeline import RenderOptions, render_with_stats

    s = _mirror_glass_scene()
    img, stats = render_with_stats(s, RenderOptions(samples_sqrt=1))
    assert img.shape[2] == 3
    assert stats["total_dropped"] == 0
    assert stats["levels"][0]["live"] > 0
    assert len(stats["tiles"]) >= 1


def test_segmented_integrator_matches_unsegmented():
    """Deterministic scene (no glossy / area lights): segment gating must
    be bit-identical to the plain in-slot path."""
    d = minimal_camera()
    d["lights"] = [
        {"location": [0, 0, 5], "color": [1, 1, 1], "intensity": 150.0}
    ]
    d["spheres"] = [
        {"location": [0, 6, 0], "radius": 1.5,
         "material": {"diffuse_color": [0.8, 0.2, 0.2],
                      "reflectivity": 0.4, "roughness": 0.0}},
    ]
    d["rectangles"] = [
        {"translation": [0, 6, -2], "rotation": [0, 0, 0], "scale": [10, 10, 1],
         "material": {"diffuse_color": [0.3, 0.5, 0.3], "reflectivity": 0.2,
                      "roughness": 0.0}},
    ]
    s = load_scene_dict(d)
    n = 128
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)
    o = jnp.zeros_like(dirs)
    t = jnp.zeros(n)
    plain = trace_wavefront(s, o, dirs, t, jax.random.key(2), 1, segments=1)
    seg = trace_wavefront(s, o, dirs, t, jax.random.key(2), 1, segments=4)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(seg))
    # Stats agree too (deterministic scene).
    _, st1 = trace_wavefront(
        s, o, dirs, t, jax.random.key(2), 1, segments=1, return_stats=True
    )
    _, st4 = trace_wavefront(
        s, o, dirs, t, jax.random.key(2), 1, segments=4, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(st1.live), np.asarray(st4.live))
    np.testing.assert_array_equal(np.asarray(st1.hits), np.asarray(st4.hits))
    np.testing.assert_array_equal(
        np.asarray(st1.spawned), np.asarray(st4.spawned)
    )
