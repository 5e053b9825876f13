"""Inverse-rendering optimization loop (the BASELINE.json
glossy-param-fitting config): gradient-descend selected scene parameters
to match a target image.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ray_tracying_tpu.diff import params as P
from ray_tracying_tpu.diff.render import mse_loss
from ray_tracying_tpu.render.pipeline import RenderOptions
from ray_tracying_tpu.scene.types import Scene


def fit(
    scene: Scene,
    target_linear: jnp.ndarray,
    param_paths: Iterable[str],
    steps: int = 100,
    learning_rate: float = 5e-2,
    opts: Optional[RenderOptions] = None,
    key: Optional[jax.Array] = None,
    resample_noise: bool = True,
) -> Tuple[Scene, Dict[str, jnp.ndarray], list]:
    """Adam-optimize the given scene leaves against the target.

    resample_noise: redraw the per-step render RNG (stochastic effects act
    as unbiased noise on the gradient); fix it for deterministic scenes.
    Returns (fitted scene, fitted params, loss history).
    """
    opts = opts or RenderOptions(samples_sqrt=1, light_samples=1)
    if key is None:
        key = jax.random.key(0)
    theta = P.extract(scene, param_paths)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta)

    @jax.jit
    def step(theta, opt_state, k):
        def loss_fn(th):
            return mse_loss(P.apply(scene, th), target_linear, k, opts)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grads, opt_state)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    history = []
    for i in range(steps):
        k = jax.random.fold_in(key, i) if resample_noise else key
        theta, opt_state, loss = step(theta, opt_state, k)
        history.append(float(loss))
    return P.apply(scene, theta), theta, history
