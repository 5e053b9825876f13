"""Batched vector math over trailing-axis-3 arrays.

All functions are shape-polymorphic over leading batch dims and operate on
float32 arrays whose last axis is 3.  Reference semantics they mirror:
normalize returns zero for zero vectors (Code/raytracer.cpp:75-79).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product; keeps no trailing axis."""
    return jnp.sum(a * b, axis=-1)


def norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(v, v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize: zero vectors map to zero (reference VecMath::normalize)."""
    mag = norm(v)[..., None]
    return jnp.where(mag > 0.0, v / jnp.where(mag > 0.0, mag, 1.0), 0.0)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """R = I - 2 (I.N) N.  Incident is assumed unit length, so R is unit.
    (semantics of Code/raytracer.cpp:101-115)"""
    return incident - 2.0 * dot(incident, normal)[..., None] * normal


def refract(incident: jnp.ndarray, normal: jnp.ndarray, n_out: jnp.ndarray):
    """Snell refraction with the reference's conventions.

    The external medium is always n=1 (Code/raytracer.cpp:121); when the ray
    exits (cos_i > 0) indices swap and the normal flips
    (Code/raytracer.cpp:126-129).  Total internal reflection yields a zero
    direction (Code/raytracer.cpp:136-139).

    Returns (direction, flipped_normal) where direction is normalized or
    zero on TIR, and flipped_normal is the normal actually used (needed by
    the caller for the -1e-4 origin offset, Code/raytracer.cpp:147).
    """
    cos_i = dot(incident, normal)
    exiting = cos_i > 0.0
    n_in_eff = jnp.where(exiting, n_out, 1.0)
    n_out_eff = jnp.where(exiting, 1.0, n_out)
    n_eff = jnp.where(exiting[..., None], -normal, normal)
    eta = n_in_eff / n_out_eff
    cos_abs = jnp.abs(cos_i)
    disc = 1.0 - eta * eta * (1.0 - cos_abs * cos_abs)
    tir = disc < 0.0
    cos_t = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_dir = incident * eta[..., None] + n_eff * (eta * cos_abs - cos_t)[..., None]
    t_dir = normalize(t_dir)
    t_dir = jnp.where(tir[..., None], 0.0, t_dir)
    return t_dir, n_eff
