"""Batched vector math over trailing-axis-3 arrays.

All functions are shape-polymorphic over leading batch dims and operate on
float32 arrays whose last axis is 3.  Reference semantics they mirror:
normalize returns zero for zero vectors (Code/raytracer.cpp:75-79).
"""

from __future__ import annotations

import jax.numpy as jnp


import jax


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product; keeps no trailing axis."""
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with forward value sqrt(max(x,0)) and zero gradient at x <= 0.

    Bare jnp.sqrt has derivative inf at 0; a zero cotangent times that inf
    is NaN, which poisons every scene-parameter gradient in diff/ (masked
    slots routinely hold zero vectors)."""
    x_safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(x_safe), 0.0)


def norm(v: jnp.ndarray) -> jnp.ndarray:
    return safe_sqrt(dot(v, v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize: zero vectors map to zero (reference VecMath::normalize),
    with a well-defined (zero) gradient there."""
    mag2 = dot(v, v)[..., None]
    mag = jnp.sqrt(jnp.where(mag2 > 0.0, mag2, 1.0))
    return jnp.where(mag2 > 0.0, v / mag, 0.0)


@jax.custom_jvp
def safe_arcsin(x: jnp.ndarray) -> jnp.ndarray:
    """arcsin with exact forward value but derivative clamped at |x|=1
    (bare arcsin has an infinite derivative there — pole hits on spheres
    would NaN the texture-uv gradient)."""
    return jnp.arcsin(x)


@safe_arcsin.defjvp
def _safe_arcsin_jvp(primals, tangents):
    (x,) = primals
    (xd,) = tangents
    y = jnp.arcsin(x)
    dydx = 1.0 / jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return y, xd * dydx


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
