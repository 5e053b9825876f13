"""Pallas TPU BVH traversal kernel: block-coherent flat state machine.

Per-ray stack traversal is lane-divergence poison on a 8x128 VPU, so the
traversal decision is amortized across the whole ray block: a node is
visited iff ANY live ray in the block intersects its AABB (the reference's
slab test, Code/shapes.cpp:55-72, vectorized over the block and reduced to
one scalar).  The stack is a scalar SMEM array shared by the block — the
control flow is scalar, the geometry math stays vector.

The traversal runs as ONE flat `lax.while_loop` with no nested control
flow (nested while/cond/fori stalls the Mosaic compiler): each iteration
pops one node, AABB-tests it against the block, and either tests the
leaf's geoms (the <= LEAF_SIZE loop is fully unrolled with per-slot
enables) or pushes its children — the child nearer the block's mean ray
direction is pushed last so it pops first, which makes the per-ray
best-t pruning bite.  All branching is scalar `where` predication.

For coherent blocks (camera tiles, shadow rays to a common light) this
approaches per-ray traversal quality; for incoherent blocks it degrades
toward brute force but never exceeds it by more than the node-test
overhead.  Rays also prune by their current best-t, which the reference's
traversal never does (it visits both children unconditionally,
Code/acceleration.cpp:75-84) — allowed because the closest hit is a min
over the hit set (SURVEY.md §2 quirk 15).

Leaf geoms run the same `geom_step` as the brute-force kernel over the
Morton-reordered geom table; the table's id column reports reference
load-order ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracying_tpu.accel.lbvh import LEAF_SIZE
from ray_tracying_tpu.kernels.closest_hit import (
    BLOCK_R,
    RayBlock,
    geom_step,
    pack_rays,
    pallas_interpret,
    scene_spec,
)
from ray_tracying_tpu.scene.types import Scene

_INF = float("inf")
STACK_MAX = 96  # depth of a median-split tree over 4*2^94 geoms; plenty


def _bvh_kernel(
    rays_ref, table_ref, box_ref, topo_ref, t_ref, id_ref, stack_ref, *, spec
):
    act = rays_ref[7, :]
    t_ref[0, :] = jnp.full((BLOCK_R,), _INF, jnp.float32)
    id_ref[0, :] = jnp.full((BLOCK_R,), -1, jnp.int32)

    @pl.when(jnp.max(act) > 0.0)
    def _():
        rb = RayBlock(rays_ref)
        live = act > 0.0

        def node_any_hit(node, best_t):
            """Reference slab test (shapes.cpp:55-72) vectorized over the
            block; a ray also prunes once its best hit is nearer than the
            box entry."""
            t_near = jnp.full(rb.ox.shape, -_INF, jnp.float32)
            t_far = jnp.full(rb.ox.shape, _INF, jnp.float32)
            miss = jnp.zeros(rb.ox.shape, jnp.bool_)
            for axis, (oo, dd) in enumerate(
                ((rb.ox, rb.dx), (rb.oy, rb.dy), (rb.oz, rb.dz))
            ):
                mn = box_ref[axis, node]
                mx = box_ref[axis + 3, node]
                par = jnp.abs(dd) < 1e-6
                d_safe = jnp.where(par, 1.0, dd)
                s1 = (mn - oo) / d_safe
                s2 = (mx - oo) / d_safe
                ent = jnp.where(par, -_INF, jnp.minimum(s1, s2))
                ext = jnp.where(par, _INF, jnp.maximum(s1, s2))
                miss = miss | (par & ((oo < mn) | (oo > mx)))
                t_near = jnp.maximum(t_near, ent)
                t_far = jnp.minimum(t_far, ext)
            hit = ~miss & (t_near <= t_far) & (t_far >= 0.0)
            # best_t is Euclidean distance = t * |d|; compare in t units.
            hit = hit & (t_near * rb.dnorm <= best_t)
            return jnp.max(jnp.where(hit & live, 1.0, 0.0)) > 0.0

        # Block mean direction for near-child-first ordering.
        n_block = jnp.float32(BLOCK_R)
        mdx = jnp.sum(rb.dx) / n_block
        mdy = jnp.sum(rb.dy) / n_block
        mdz = jnp.sum(rb.dz) / n_block

        def box_center_proj(node):
            """Scalar projection of a node's box center onto the mean dir."""
            cx = 0.5 * (box_ref[0, node] + box_ref[3, node])
            cy = 0.5 * (box_ref[1, node] + box_ref[4, node])
            cz = 0.5 * (box_ref[2, node] + box_ref[5, node])
            return cx * mdx + cy * mdy + cz * mdz

        stack_ref[0] = 0  # root
        init = (
            jnp.int32(1),                                # stack pointer
            jnp.full(rb.ox.shape, _INF, jnp.float32),    # best_t
            jnp.full(rb.ox.shape, -1, jnp.int32),        # best_id
        )

        def cond(carry):
            sp, _, _ = carry
            return sp > 0

        def body(carry):
            sp, best_t, best_id = carry
            sp_pop = sp - 1
            node = stack_ref[jnp.minimum(sp_pop, STACK_MAX - 1)]
            visit = node_any_hit(node, best_t)
            left = topo_ref[0, node]
            right = topo_ref[1, node]
            first = topo_ref[2, node]
            count = topo_ref[3, node]
            is_leaf = left < 0

            # Leaf: the <= LEAF_SIZE geoms unrolled with per-slot enables.
            leaf_on = visit & is_leaf
            for i in range(LEAF_SIZE):
                best_t, best_id = geom_step(
                    jnp.where(leaf_on, first + i, 0),
                    (best_t, best_id),
                    table_ref,
                    rb,
                    spec,
                    enable=leaf_on & (i < count),
                )

            # Internal: push far child first so the near child pops first
            # (better best-t pruning).
            push = visit & ~is_leaf
            left_near = box_center_proj(left) <= box_center_proj(right)
            near = jnp.where(left_near, left, right)
            far = jnp.where(left_near, right, left)
            slot0 = jnp.minimum(sp_pop, STACK_MAX - 1)
            slot1 = jnp.minimum(sp_pop + 1, STACK_MAX - 1)
            stack_ref[slot0] = jnp.where(push, far, stack_ref[slot0])
            stack_ref[slot1] = jnp.where(push, near, stack_ref[slot1])
            sp = jnp.where(push, sp_pop + 2, sp_pop)
            return sp, best_t, best_id

        _, best_t, best_id = lax.while_loop(cond, body, init)
        t_ref[0, :] = best_t
        id_ref[0, :] = best_id


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _bvh_call(rays, table, boxes, topo, spec_key):
    r_pad = rays.shape[1]
    spec = dict(spec_key)
    kernel = functools.partial(_bvh_kernel, spec=spec)
    t, pid = pl.pallas_call(
        kernel,
        grid=(r_pad // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((8, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_MAX,), jnp.int32)],
        interpret=pallas_interpret(),
    )(rays, table, boxes, topo)
    return t[0], pid[0]


def _bvh_fwd(rays, table, boxes, topo, spec_key):
    return _bvh_call(rays, table, boxes, topo, spec_key), None


def _bvh_bwd(spec_key, _res, _ct):
    return None, None, None, None


_bvh_call.defvjp(_bvh_fwd, _bvh_bwd)


def closest_hit_tid_bvh(scene: Scene, o, d, time, active=None, sort_rays=False):
    """BVH-accelerated closest hit; identical hit set to the brute-force
    kernel.  Requires accel.with_bvh(scene).

    sort_rays: restore block coherence first (kernels/ray_sort.py) — the
    incoherent-wavefront fix; identical results, order-invariant kernel."""
    assert scene.bvh_geoms is not None, "call accel.with_bvh(scene) first"
    if sort_rays:
        from ray_tracying_tpu.kernels.ray_sort import sorted_closest_hit

        lo = lax.stop_gradient(scene.bvh_nodes_box[0, :3])
        hi = lax.stop_gradient(scene.bvh_nodes_box[0, 3:])
        return sorted_closest_hit(
            closest_hit_tid_bvh, scene, o, d, time, active, lo, hi
        )
    r = o.shape[0]
    rays, _ = pack_rays(o, d, time, active)
    spec_key = tuple(sorted(scene_spec(scene).items()))
    # All tables transposed for SMEM row economy (see closest_hit.geom_step).
    t, pid = _bvh_call(
        rays,
        lax.stop_gradient(scene.bvh_geoms.T),
        lax.stop_gradient(scene.bvh_nodes_box.T),
        lax.stop_gradient(scene.bvh_nodes_topo.T),
        spec_key,
    )
    pid = jnp.where(jnp.isfinite(t), pid, -1)
    return t[:r], pid[:r]
