"""Chunk-culled streaming kernels (kernels/chunk_stream.py) — the
beyond-SMEM scene path — vs the dense jnp oracle, in interpret mode."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import ray_tracying_tpu.render.intersect as I
from ray_tracying_tpu.accel.lbvh import build_chunks, geom_aabbs, with_chunks
from ray_tracying_tpu.scene.loader import load_scene_dict

from test_scene_loader import minimal_camera

needs_interpret = pytest.mark.skipif(
    os.environ.get("RTT_SKIP_INTERPRET") == "1", reason="interpret disabled"
)


def mixed_scene():
    """Every geom kind + one motion sphere, spread out so chunk AABBs
    separate spatially."""
    d = minimal_camera()
    d["spheres"] = [
        {"location": [x * 2.0, 5 + 0.3 * x, 0.1 * x], "radius": 0.5}
        for x in range(-3, 4)
    ]
    d["spheres"].append(
        {"location": [0, 7, 2], "radius": 0.6, "velocity": [2.0, 0, 0]}
    )
    d["cubes"] = [
        {"translation": [0, 9, 0], "rotation": [0.1, 0.2, 0.3]},
        {"translation": [-4, 8, 1], "rotation": [0, 0.5, 0],
         "scale": [0.7, 1.2, 0.9]},
    ]
    d["rectangles"] = [
        {"translation": [3, 10, 0], "rotation": [1.0, 0, 0], "scale": [4, 4, 1]}
    ]
    d["planes"] = [
        {"corners": [[-9, 12, -9], [9, 12, -9], [9, 12, 9], [-9, 12, 9]]}
    ]
    return load_scene_dict(d)


def rays(n=96, seed=3):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.normal(size=(n, 3)) * 1.5, jnp.float32)
    dd = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    tm = jnp.asarray(rng.uniform(size=n), jnp.float32)
    return o, dd, tm


def oracle_tid(s, o, dd, tm):
    tmat = I.all_hit_t(s, o, dd, tm)
    t_ref = jnp.min(tmat, axis=1)
    id_ref = jnp.where(
        jnp.isfinite(t_ref), jnp.argmin(tmat, axis=1).astype(jnp.int32), -1
    )
    return np.asarray(t_ref), np.asarray(id_ref)


def test_build_chunks_invariants():
    s = mixed_scene()
    table, boxes = build_chunks(s, chunk=4)
    g = s.n_geoms
    nc = boxes.shape[0]
    assert table.shape == (nc * 4, 17)
    # Padding rows are all-zero (never hit).
    assert (table[g:] == 0).all()
    # Every real row's id column is a valid geom id, each exactly once.
    ids = np.sort(np.round(table[:g, 16]).astype(int))
    np.testing.assert_array_equal(ids, np.arange(g))
    # Chunk boxes contain their members' reference AABBs.
    aabbs = geom_aabbs(s)
    order_boxes = {int(round(table[i, 16])): i // 4 for i in range(g)}
    for gid, c in order_boxes.items():
        assert (aabbs[gid, :3] >= boxes[c, :3] - 1e-6).all()
        assert (aabbs[gid, 3:] <= boxes[c, 3:] + 1e-6).all()


@needs_interpret
def test_chunk_closest_hit_matches_oracle():
    s = with_chunks(mixed_scene(), chunk=4)
    o, dd, tm = rays()
    from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_chunks

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        t_k, id_k = closest_hit_tid_chunks(s, o, dd, tm)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    t_ref, id_ref = oracle_tid(s, o, dd, tm)
    np.testing.assert_allclose(np.asarray(t_k), t_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(id_k), id_ref)


@needs_interpret
def test_chunk_fused_normals_match_pass2():
    s = with_chunks(mixed_scene(), chunk=4)
    o, dd, tm = rays(seed=5)
    from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_n_chunks

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        t_k, id_k, n_k = closest_hit_tid_n_chunks(s, o, dd, tm)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    ref = I.closest_hit(s, o, dd, tm)  # jnp pass-1 + pass-2 oracle
    valid = np.asarray(ref.valid)
    np.testing.assert_allclose(
        np.asarray(t_k)[valid], np.asarray(ref.t)[valid], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(id_k), np.asarray(ref.geom_id))
    np.testing.assert_allclose(
        np.asarray(n_k)[valid], np.asarray(ref.normal)[valid],
        rtol=1e-4, atol=1e-5,
    )


@needs_interpret
def test_chunk_occlusion_matches_oracle():
    s = with_chunks(mixed_scene(), chunk=4)
    o, dd, _ = rays(seed=7)
    n = o.shape[0]
    maxt = jnp.asarray(np.random.default_rng(9).uniform(2.0, 14.0, n), jnp.float32)
    from ray_tracying_tpu.kernels.chunk_stream import occluded_tid_chunks

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        blocked = np.asarray(occluded_tid_chunks(s, o, dd, maxt))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    t = np.asarray(I.min_hit_t(s, o, dd, jnp.zeros(n)))
    np.testing.assert_array_equal(blocked, t <= np.asarray(maxt))


@needs_interpret
def test_big_scene_routing_uses_chunks(monkeypatch):
    """closest_hit / occluded route through the chunk kernels when the
    scene exceeds the SMEM cap and chunk structures are attached."""
    from ray_tracying_tpu.kernels import closest_hit as CH

    s = with_chunks(mixed_scene(), chunk=4)
    monkeypatch.setattr(CH, "BRUTE_SMEM_MAX_GEOMS", 4)
    o, dd, tm = rays(seed=11)

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        hit = I.closest_hit(s, o, dd, tm, differentiable=False)
        t2 = I.min_hit_t(s, o, dd, tm)
        occ = np.asarray(I.occluded(s, o, dd, jnp.full(o.shape[0], 8.0)))
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    t_ref, id_ref = oracle_tid(s, o, dd, tm)
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit.geom_id), id_ref)
    np.testing.assert_allclose(np.asarray(t2), t_ref, rtol=1e-5, atol=1e-6)
    t0 = np.asarray(I.min_hit_t(s, o, dd, jnp.zeros(o.shape[0])))
    np.testing.assert_array_equal(occ, t0 <= 8.0)


@needs_interpret
def test_ray_sort_results_invariant():
    """sort_rays is results-invariant: sorted-kernel output equals the
    unsorted kernel output slot for slot (both chunk and BVH paths)."""
    from ray_tracying_tpu.accel.lbvh import with_bvh
    from ray_tracying_tpu.kernels.bvh_traverse import closest_hit_tid_bvh
    from ray_tracying_tpu.kernels.chunk_stream import closest_hit_tid_chunks

    s = with_chunks(with_bvh(mixed_scene()), chunk=4)
    o, dd, tm = rays(seed=13)
    perm = np.random.default_rng(1).permutation(o.shape[0])
    o, dd, tm = o[perm], dd[perm], tm[perm]  # shuffled wavefront

    os.environ["RTT_PALLAS_INTERPRET"] = "1"
    try:
        t0, i0 = closest_hit_tid_chunks(s, o, dd, tm)
        t1, i1 = closest_hit_tid_chunks(s, o, dd, tm, sort_rays=True)
        tb0, ib0 = closest_hit_tid_bvh(s, o, dd, tm)
        tb1, ib1 = closest_hit_tid_bvh(s, o, dd, tm, sort_rays=True)
    finally:
        del os.environ["RTT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(tb1), np.asarray(tb0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ib1), np.asarray(ib0))


def test_ray_sort_key_octant_major():
    from ray_tracying_tpu.kernels.ray_sort import ray_sort_key

    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    o = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], jnp.float32)
    d_pos = jnp.asarray([[1.0, 1.0, 1.0]] * 2, jnp.float32)
    d_neg = jnp.asarray([[-1.0, 1.0, 1.0]] * 2, jnp.float32)
    k_pos = np.asarray(ray_sort_key(o, d_pos, lo, hi))
    k_neg = np.asarray(ray_sort_key(o, d_neg, lo, hi))
    # All keys positive (int32 sort order == numeric order).
    assert (k_pos >= 0).all() and (k_neg >= 0).all()
    # Octant is the major key: every -x-direction key sorts after every
    # +x one regardless of origin.
    assert k_neg.min() > k_pos.max()
    # Within an octant, nearby origins get nearby keys (Morton minor).
    assert k_pos[0] != k_pos[1]
