"""Analytic intersection unit tests against hand-computed cases, covering
each primitive's reference quirks (citations in render/intersect.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_tracying_tpu.render import intersect as I
from ray_tracying_tpu.scene.loader import load_scene_dict

from test_scene_loader import minimal_camera


def scene_with(**kwargs):
    d = minimal_camera()
    d.update(kwargs)
    return load_scene_dict(d)


def hit_one(scene, o, d, time=0.0):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    return I.closest_hit(scene, o, d, jnp.asarray([time], jnp.float32))


def test_unit_sphere_frontal():
    s = scene_with(spheres=[{"location": [0, 5, 0], "radius": 1.0}])
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(h.point[0]), [0, 4, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, -1, 0], atol=1e-4)


def test_sphere_inside_hits_far_side():
    s = scene_with(spheres=[{"location": [0, 0, 0], "radius": 2.0}])
    h = hit_one(s, [0, 0, 0], [1, 0, 0])
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(2.0, abs=1e-4)


def test_sphere_t_min_epsilon():
    """Hits with t <= 0.001 are rejected (Code/shapes.cpp:231)."""
    s = scene_with(spheres=[{"location": [0, 0, 0], "radius": 1.0}])
    # Origin on the surface pointing outward: both roots <= eps -> miss.
    h = hit_one(s, [0, 1.0005, 0], [0, 1, 0])
    assert not bool(h.valid[0])


def test_scaled_sphere_euclidean_t():
    """hit.t is the Euclidean distance to the world hit point even for
    non-uniform scale (Code/shapes.cpp:251-253)."""
    s = scene_with(spheres=[{"location": [0, 10, 0], "scale": [3.0, 1.0, 1.0]}])
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert float(h.t[0]) == pytest.approx(9.0, abs=1e-3)
    # Normal of an ellipsoid uses the inverse-transpose, still unit.
    assert np.linalg.norm(np.asarray(h.normal[0])) == pytest.approx(1.0, abs=1e-5)


def test_cube_frontal_face_normal():
    s = scene_with(cubes=[{"translation": [0, 3, 0], "rotation": [0, 0, 0]}])
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert float(h.t[0]) == pytest.approx(2.5, abs=1e-4)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, -1, 0], atol=1e-5)


def test_cube_inside_exit_keeps_entry_normal():
    """Ray starting inside a cube exits through t_far but the normal comes
    from the entry axis (reference quirk, Code/shapes.cpp:392-402)."""
    s = scene_with(cubes=[{"translation": [0, 0, 0], "rotation": [0, 0, 0]}])
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(0.5, abs=1e-5)
    # Entry axis for a +y ray through the center is y with sign -1.
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, -1, 0], atol=1e-5)


def test_cube_no_t_epsilon():
    """Cube uses t > 0, not the 0.001 epsilon: a hit at t=5e-4 counts
    (Code/shapes.cpp:392-393)."""
    s = scene_with(cubes=[{"translation": [0, 0, 0], "rotation": [0, 0, 0]}])
    h = hit_one(s, [0, -0.5005, 0], [0, 1, 0])
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(5e-4, abs=2e-4)


def test_rect_bounds_and_uv():
    s = scene_with(
        rectangles=[{"translation": [0, 4, 0], "rotation": [1.5707963, 0, 0],
                     "scale": [2.0, 2.0, 1.0]}]
    )
    # Rect rotated about x: local z -> world -y; spans x,z in [-1,1].
    h = hit_one(s, [0.5, 0, 0.25], [0, 1, 0])
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(4.0, abs=1e-4)
    # u = local_x + 0.5; local x = world x / 2 = 0.25 -> u = 0.75
    assert float(h.uv[0, 0]) == pytest.approx(0.75, abs=1e-5)
    miss = hit_one(s, [2.5, 0, 0], [0, 1, 0])
    assert not bool(miss.valid[0])


def test_plane_quad_parametric_t():
    s = scene_with(
        planes=[{"corners": [[-1, 5, -1], [1, 5, -1], [1, 5, 1], [-1, 5, 1]]}]
    )
    # Plane hit.t is the PARAMETRIC t (Code/shapes.cpp:458,481): use an
    # unnormalized direction to expose the difference.
    o = jnp.asarray([[0, 0, 0]], jnp.float32)
    d = jnp.asarray([[0, 2.0, 0]], jnp.float32)
    h = I.closest_hit(s, o, d, jnp.zeros(1))
    assert bool(h.valid[0])
    assert float(h.t[0]) == pytest.approx(2.5, abs=1e-5)  # 5 / |d|=2


def test_plane_point_in_quad_rejects_outside():
    s = scene_with(
        planes=[{"corners": [[-1, 5, -1], [1, 5, -1], [1, 5, 1], [-1, 5, 1]]}]
    )
    h = hit_one(s, [1.5, 0, 0], [0, 1, 0])
    assert not bool(h.valid[0])


def test_motion_blur_shifts_sphere():
    s = scene_with(
        spheres=[{"location": [0, 5, 0], "radius": 0.5, "velocity": [5.0, 0, 0]}]
    )
    # velocity/5 = 1.0/frame.  At time=1 the sphere center is at x=+1.
    h0 = hit_one(s, [0, 0, 0], [0, 1, 0], time=0.0)
    h1 = hit_one(s, [1.0, 0, 0], [0, 1, 0], time=1.0)
    miss = hit_one(s, [1.0, 0, 0], [0, 1, 0], time=0.0)
    assert bool(h0.valid[0]) and bool(h1.valid[0]) and not bool(miss.valid[0])
    # Advected hit point is reported in world space at the ray's time
    # (Code/shapes.cpp:243-248).
    np.testing.assert_allclose(np.asarray(h1.point[0]), [1.0, 4.5, 0], atol=1e-4)


def test_closest_hit_tie_break_first_geom():
    """Equal-t hits resolve to the first geom in load order, matching
    min_element / intersect_linear first-wins (Code/acceleration.cpp:112,133)."""
    d = minimal_camera()
    d["spheres"] = [
        {"location": [0, 5, 0], "radius": 1.0},
        {"location": [0, 5, 0], "radius": 1.0},
    ]
    s = load_scene_dict(d)
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert int(h.geom_id[0]) == 0


def test_empty_scene_misses():
    s = scene_with()
    h = hit_one(s, [0, 0, 0], [0, 1, 0])
    assert not bool(h.valid[0])
    assert np.isinf(float(h.t[0]))


def test_min_hit_t_matches_closest_hit():
    d = minimal_camera()
    d["spheres"] = [{"location": [0, 5, 0], "radius": 1.0}]
    d["cubes"] = [{"translation": [0, 8, 0], "rotation": [0, 0, 0]}]
    s = load_scene_dict(d)
    o = jnp.zeros((1, 3))
    dd = jnp.asarray([[0, 1, 0]], jnp.float32)
    t = I.min_hit_t(s, o, dd, jnp.zeros(1))
    h = I.closest_hit(s, o, dd, jnp.zeros(1))
    assert float(t[0]) == pytest.approx(float(h.t[0]), rel=1e-5)


def test_occluded_matches_min_hit_t():
    d = minimal_camera()
    d["spheres"] = [{"location": [0, 5, 0], "radius": 1.0}]
    d["cubes"] = [{"translation": [2, 8, 0], "rotation": [0, 0, 0]}]
    d["rectangles"] = [
        {"translation": [0, 12, 0], "rotation": [1.5707963, 0, 0],
         "scale": [30.0, 30.0, 1.0]}
    ]
    s = load_scene_dict(d)
    rng = np.random.default_rng(0)
    n = 64
    o = jnp.asarray(rng.normal(size=(n, 3)) * 2.0, jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    maxt = jnp.asarray(rng.uniform(0.5, 20.0, size=n), jnp.float32)
    blocked = I.occluded(s, o, dd, maxt)
    t = I.min_hit_t(s, o, dd, jnp.zeros(n))
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(t <= maxt))


def test_occluded_kernel_interpret_matches_oracle():
    """Exercise the Pallas occlusion kernel (interpret mode) incl. the
    chunk-padded kind segments and the early-exit while loop."""
    import os

    if os.environ.get("RTT_SKIP_INTERPRET") == "1":
        pytest.skip("interpret disabled")
    d = minimal_camera()
    d["spheres"] = [{"location": [0, 5, 0], "radius": 1.0}]
    d["cubes"] = [{"translation": [2, 8, 0], "rotation": [0.2, 0.1, 0.4]}]
    s = load_scene_dict(d)
    rng = np.random.default_rng(1)
    n = 32
    o = jnp.asarray(rng.normal(size=(n, 3)) * 2.0, jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    maxt = jnp.asarray(rng.uniform(0.5, 20.0, size=n), jnp.float32)
    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        from ray_tracying_tpu.kernels.closest_hit import occluded_tid

        blocked = np.asarray(occluded_tid(s, o, dd, maxt))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    t = np.asarray(I.min_hit_t(s, o, dd, jnp.zeros(n)))
    np.testing.assert_array_equal(blocked, t <= np.asarray(maxt))


def test_chunked_brute_kernel_interpret_matches_oracle(monkeypatch):
    """Force the geom-chunked kernel (big-scene path) on a small scene in
    interpret mode: results must match the dense jnp oracle exactly."""
    import os

    if os.environ.get("RTT_SKIP_INTERPRET") == "1":
        pytest.skip("interpret disabled")
    from ray_tracying_tpu.kernels import closest_hit as CH

    d = minimal_camera()
    d["spheres"] = [
        {"location": [x, 5 + 0.3 * x, 0.1 * x], "radius": 0.5}
        for x in range(-3, 4)
    ]
    d["cubes"] = [{"translation": [0, 9, 0], "rotation": [0.1, 0.2, 0.3]}]
    d["planes"] = [
        {"corners": [[-9, 12, -9], [9, 12, -9], [9, 12, 9], [-9, 12, 9]]}
    ]
    s = load_scene_dict(d)
    assert s.n_geoms == 9
    monkeypatch.setattr(CH, "BRUTE_SMEM_MAX_GEOMS", 4)
    monkeypatch.setattr(CH, "GEOM_CHUNK", 4)  # 9 geoms -> 3 chunks (padded)

    rng = np.random.default_rng(2)
    n = 48
    o = jnp.asarray(rng.normal(size=(n, 3)) * 1.5, jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    tm = jnp.zeros(n)

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        t_k, id_k = CH.closest_hit_tid(s, o, dd, tm)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    tmat = I.all_hit_t(s, o, dd, tm)
    t_ref = jnp.min(tmat, axis=1)
    id_ref = jnp.where(
        jnp.isfinite(t_ref), jnp.argmin(tmat, axis=1).astype(jnp.int32), -1
    )
    np.testing.assert_allclose(
        np.asarray(t_k), np.asarray(t_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(id_k), np.asarray(id_ref))


def test_fused_normal_kernel_matches_pass2():
    """Fused-attribute kernel (interpret): t/id/normal/point must match the
    pass-2 reconstruction path on a scene with every primitive kind."""
    import os

    if os.environ.get("RTT_SKIP_INTERPRET") == "1":
        pytest.skip("interpret disabled")
    d = minimal_camera()
    d["spheres"] = [
        {"location": [0, 5, 0], "radius": 1.0},
        {"location": [2, 6, 0.5], "rotation": [0.3, 0.2, 0.7],
         "scale": [0.8, 0.5, 1.2], "velocity": [1.0, 0.0, 0.0]},
    ]
    d["cubes"] = [{"translation": [-2, 7, 0], "rotation": [0.1, 0.9, 0.4],
                   "scale": [0.7, 1.1, 0.6]}]
    d["rectangles"] = [{"translation": [0, 9, 0], "rotation": [1.0, 0.2, 0.0],
                        "scale": [6.0, 6.0, 1.0]}]
    d["planes"] = [
        {"corners": [[-9, 12, -9], [9, 12, -9], [9, 12, 9], [-9, 12, 9]]}
    ]
    s = load_scene_dict(d)
    rng = np.random.default_rng(3)
    n = 96
    o = jnp.asarray(rng.normal(size=(n, 3)) * 1.5, jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    tm = jnp.asarray(rng.uniform(0.0, 1.0, size=n), jnp.float32)

    import os

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        fast = I.closest_hit(s, o, dd, tm, differentiable=False)
        slow = I.closest_hit(s, o, dd, tm, differentiable=True)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(np.asarray(fast.valid), np.asarray(slow.valid))
    m = np.asarray(fast.valid)
    np.testing.assert_array_equal(
        np.asarray(fast.geom_id)[m], np.asarray(slow.geom_id)[m]
    )
    np.testing.assert_allclose(
        np.asarray(fast.t)[m], np.asarray(slow.t)[m], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast.point)[m], np.asarray(slow.point)[m],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fast.normal)[m], np.asarray(slow.normal)[m],
        rtol=1e-4, atol=1e-4,
    )
