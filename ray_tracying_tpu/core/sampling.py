"""Counter-based random sampling (jax.random / threefry).

The reference threads one global mt19937 through every sampling site and
uses rejection loops (Code/raytracer.cpp:152-171, camera.cpp:90-96).
Rejection sampling is hostile to XLA (data-dependent loop trip counts), so
we draw from the *same distributions* analytically — a documented,
controlled deviation that only perturbs stochastic effects within test
tolerance (SURVEY.md §7 "controlled deviation").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_in_unit_sphere(key: jax.Array, shape: tuple) -> jnp.ndarray:
    """Uniform inside the unit ball (matches the rejection sampler's target
    distribution, Code/raytracer.cpp:152-171).

    Direction from a normalized gaussian; radius = U^(1/3).
    Returns shape + (3,).
    """
    k_dir, k_r = jax.random.split(key)
    g = jax.random.normal(k_dir, shape + (3,), dtype=jnp.float32)
    mag = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    d = g / jnp.maximum(mag, 1e-12)
    u = jax.random.uniform(k_r, shape + (1,), dtype=jnp.float32)
    r = jnp.cbrt(u)
    return d * r


def uniform_in_unit_disk(key: jax.Array, shape: tuple) -> jnp.ndarray:
    """Uniform on the unit disk (target of Code/camera.cpp:90-96).

    Polar method: r = sqrt(U), theta = 2 pi V.  Returns shape + (2,).
    """
    k_r, k_t = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k_r, shape + (1,), dtype=jnp.float32))
    theta = 2.0 * jnp.pi * jax.random.uniform(k_t, shape + (1,), dtype=jnp.float32)
    return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def stratified_offsets(key: jax.Array, n_sqrt: int) -> jnp.ndarray:
    """Jittered n x n stratified sub-pixel offsets in [0,1)^2, flattened to
    (n*n, 2) in the reference's (j outer over y, i inner over x) order
    (Code/raytracer.cpp:46-66)."""
    jitter = jax.random.uniform(key, (n_sqrt, n_sqrt, 2), dtype=jnp.float32)
    jy = jnp.arange(n_sqrt, dtype=jnp.float32)[:, None]
    ix = jnp.arange(n_sqrt, dtype=jnp.float32)[None, :]
    sx = (ix + jitter[..., 0]) / n_sqrt
    sy = (jy + jitter[..., 1]) / n_sqrt
    return jnp.stack([sx, sy], axis=-1).reshape(n_sqrt * n_sqrt, 2)
