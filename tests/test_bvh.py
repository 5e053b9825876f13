"""LBVH build invariants (numpy) and traversal parity (Pallas interpret
mode on CPU — exercises the exact kernel code)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ray_tracying_tpu.accel import lbvh
from ray_tracying_tpu.scene.loader import load_scene_dict

from test_scene_loader import minimal_camera


def cluttered_scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    d = minimal_camera()
    d["spheres"] = [
        {"location": rng.uniform(-3, 3, 3).tolist(), "radius": float(rng.uniform(0.1, 0.5))}
        for _ in range(n // 2)
    ]
    d["cubes"] = [
        {"translation": rng.uniform(-3, 3, 3).tolist(),
         "rotation": rng.uniform(0, 6.28, 3).tolist(),
         "scale": rng.uniform(0.1, 0.5, 3).tolist()}
        for _ in range(n - n // 2 - 1)
    ]
    d["planes"] = [
        {"corners": [[-4, 4, -1], [4, 4, -1], [4, 4, 3], [-4, 4, 3]]}
    ]
    return load_scene_dict(d)


def test_build_invariants():
    scene = cluttered_scene()
    aabbs = lbvh.geom_aabbs(scene)
    boxes, topo, order = lbvh.build_lbvh(aabbs)
    g = aabbs.shape[0]

    # Every geom appears exactly once across leaves.
    seen = []
    for left, right, first, count in topo:
        if left < 0:
            seen.extend(order[first:first + count])
            assert count <= lbvh.LEAF_SIZE
    assert sorted(seen) == list(range(g))

    # Parent boxes contain child boxes; leaf boxes contain member AABBs.
    for i, (left, right, first, count) in enumerate(topo):
        if left >= 0:
            for child in (left, right):
                assert (boxes[child][:3] >= boxes[i][:3] - 1e-5).all()
                assert (boxes[child][3:] <= boxes[i][3:] + 1e-5).all()
        else:
            members = aabbs[order[first:first + count]]
            assert (members[:, :3] >= boxes[i][:3] - 1e-5).all()
            assert (members[:, 3:] <= boxes[i][3:] + 1e-5).all()


def test_sphere_aabb_includes_velocity_extent():
    """Sphere boxes merge the velocity-displaced corners
    (Code/shapes.cpp:272-285)."""
    d = minimal_camera()
    d["spheres"] = [
        {"location": [0, 0, 0], "radius": 1.0, "velocity": [10.0, 0, 0]}
    ]
    scene = load_scene_dict(d)
    box = lbvh.geom_aabbs(scene)[0]
    # velocity/5 = 2: box spans [-1, 1+2] in x.
    np.testing.assert_allclose(box[:3], [-1, -1, -1], atol=1e-5)
    np.testing.assert_allclose(box[3:], [3, 1, 1], atol=1e-5)


@pytest.mark.skipif(
    os.environ.get("RTT_SKIP_INTERPRET") == "1", reason="interpret disabled"
)
def test_bvh_kernel_matches_jnp_reference():
    """Interpret-mode BVH traversal must produce the jnp brute-force hit
    set exactly (same winner ids and distances)."""
    from ray_tracying_tpu.render import intersect as I

    scene = lbvh.with_bvh(cluttered_scene(24))
    n = 64
    rng = np.random.default_rng(5)
    o = jnp.asarray(
        np.repeat([[0.0, -4.0, 1.0]], n, axis=0)
        + rng.uniform(-0.2, 0.2, (n, 3)),
        jnp.float32,
    )
    dirs = rng.normal(size=(n, 3))
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.5
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs, jnp.float32)
    t0 = jnp.zeros(n)

    tm = I.all_hit_t(scene, o, d, t0)
    t_ref = np.asarray(jnp.min(tm, axis=1))
    id_ref = np.asarray(jnp.argmin(tm, axis=1))
    hit_ref = np.isfinite(t_ref)

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        from ray_tracying_tpu.kernels.bvh_traverse import closest_hit_tid_bvh
        from ray_tracying_tpu.kernels.closest_hit import closest_hit_tid

        t_b, id_b = (np.asarray(x) for x in closest_hit_tid_bvh(scene, o, d, t0))
        t_k, id_k = (np.asarray(x) for x in closest_hit_tid(scene, o, d, t0))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]

    # Brute-force kernel parity.
    assert (np.isfinite(t_k) == hit_ref).all()
    assert (id_k[hit_ref] == id_ref[hit_ref]).all()
    np.testing.assert_allclose(t_k[hit_ref], t_ref[hit_ref], rtol=1e-5)
    # BVH kernel parity.
    assert (np.isfinite(t_b) == hit_ref).all()
    assert (id_b[hit_ref] == id_ref[hit_ref]).all()
    np.testing.assert_allclose(t_b[hit_ref], t_ref[hit_ref], rtol=1e-5)
