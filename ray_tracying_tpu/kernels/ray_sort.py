"""Coherence-restoring ray sort for the block-coherent kernels.

The block-coherent BVH traversal amortizes node decisions across a whole
2048-ray block, so it feeds on coherence: scanline camera blocks traverse
like single rays, while randomly-ordered rays make every block visit the
union of all lanes' nodes and lose to brute force (BASELINE.md crossover
table).  The TPU-native fix is not per-lane traversal (a scalar stack per
lane is VPU poison) but SORTING the wavefront so blocks become coherent
again: key = direction octant (3 bits) | 30-bit Morton code of the origin
within the scene bounds, one stable multi-operand lax.sort (the same
primitive the integrator compacts with — scatters serialize on TPU,
sorts don't), kernel on the sorted wavefront, then an inverse sort of the
(t, id) results by original slot.

Cost: two sorts (~10 ms + ~5 ms per 1M rays) — noise next to the
traversal win on incoherent wavefronts (measured 8k geoms, shuffled rays:
brute 403 ms, unsorted LBVH 945 ms, sorted LBVH ~60 ms per 1M-ray pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _spread10(v: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10 bits with two zero bits each (Morton spread), int32."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def ray_sort_key(o: jnp.ndarray, d: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """(R,) int32 coherence key: direction octant then origin Morton.

    lo, hi: scene bounds (3,) — callers pass the BVH root box so keys are
    consistent with the tree layout."""
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o - lo) / span * 1023.0, 0.0, 1023.0).astype(jnp.int32)
    morton = (
        (_spread10(q[:, 0]) << 2)
        | (_spread10(q[:, 1]) << 1)
        | _spread10(q[:, 2])
    )
    octant = (
        ((d[:, 0] < 0).astype(jnp.int32) << 2)
        | ((d[:, 1] < 0).astype(jnp.int32) << 1)
        | (d[:, 2] < 0).astype(jnp.int32)
    )
    # Octant is the major key (bits 28-30), origin Morton the minor
    # (morton >> 2 keeps its top 28 bits); total < 2^31 so the int32 key
    # stays positive.  The key is only compared, so relative order is all
    # that matters.
    return (octant << 28) | (morton >> 2)


def sorted_closest_hit(kernel_tid, scene, o, d, time, active, lo, hi):
    """Run a (scene, o, d, time, active) -> (t, id) kernel on the
    coherence-sorted wavefront and unsort the results."""
    r = o.shape[0]
    key = ray_sort_key(o, d, lo, hi)
    slot = jnp.arange(r, dtype=jnp.int32)
    act = (
        jnp.ones(r, jnp.float32)
        if active is None
        else active.astype(jnp.float32)
    )
    (_, ox, oy, oz, dx, dy, dz, tmv, acts, slots) = lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         time, act, slot),
        num_keys=1,
        is_stable=False,
    )
    so = jnp.stack([ox, oy, oz], axis=1)
    sd = jnp.stack([dx, dy, dz], axis=1)
    t_s, id_s = kernel_tid(scene, so, sd, tmv, acts > 0.0)
    # Inverse permutation: sort (slot, t, id) back to original order.
    _, t, pid = lax.sort((slots, t_s, id_s), num_keys=1, is_stable=False)
    return t, pid
