"""Fully-traced differentiable rendering.

`render_linear` is the pipeline's tile renderer without the host loop: the
whole image renders inside one trace, so jax.grad flows pixel gradients
back to any Scene leaf.  Hit decisions (which geom, visibility booleans)
are piecewise-constant and contribute zero gradient; everything downstream
of a fixed hit — shading, attenuation, throughput weights, camera/lens
geometry, textures — is smooth (the BASELINE.json "closest-hit re-use"
scope).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ray_tracying_tpu.render.pipeline import RenderOptions, _render_tile
from ray_tracying_tpu.scene.types import Scene


def render_linear(
    scene: Scene,
    key: jax.Array,
    opts: Optional[RenderOptions] = None,
) -> jnp.ndarray:
    """Render the full image in one traced call -> (H, W, 3) linear f32."""
    opts = opts or RenderOptions()
    width, height = scene.camera.resolution
    tile, _ = _render_tile(
        scene,
        jnp.float32(0.0),
        key,
        height,
        width,
        opts.samples_sqrt,
        opts.light_samples,
        opts.queue_mult,
        opts.use_bvh,
        opts.min_throughput,
        differentiable=True,
    )
    return tile


def mse_loss(
    scene: Scene,
    target_linear: jnp.ndarray,
    key: jax.Array,
    opts: Optional[RenderOptions] = None,
) -> jnp.ndarray:
    img = render_linear(scene, key, opts)
    return jnp.mean((img - target_linear) ** 2)
