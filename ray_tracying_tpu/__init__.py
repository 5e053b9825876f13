"""ray_tracying_tpu — a TPU-native differentiable Whitted ray tracer.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
reference C++ renderer (EricZhang12138/Ray_Tracying): recursive Whitted
shading with distributed-ray-tracing effects (stratified antialiasing,
soft shadows from spherical area lights, thin-lens depth of field, motion
blur, glossy reflection), loaded from the same scene.json schema, with
BVH-accelerated intersection.

Architecture (nothing here is a translation of the reference C++):
  - scene/   : scene.json -> frozen SoA pytree of arrays
  - core/    : vec math, transforms, sampling (counter-based jax.random)
  - accel/   : LBVH build (host + C++) and flat traversal structures
  - kernels/ : Pallas TPU kernels for the hot intersection paths
  - render/  : camera ray gen + iterative wavefront integrator
  - parallel/: multi-chip sharding (Mesh + shard_map) over pixel tiles
  - diff/    : differentiable rendering / inverse-rendering optimizers
  - io/      : PPM P3 codec (byte-compatible with the reference)
  - cli/     : command line mirroring the reference flags
"""

from ray_tracying_tpu.scene.types import (
    Scene,
    Camera,
    Lights,
    Materials,
    Primitives,
    Planes,
    KIND_SPHERE,
    KIND_CUBE,
    KIND_RECT,
)
from ray_tracying_tpu.scene.loader import load_scene, load_scene_dict
from ray_tracying_tpu.render.pipeline import (
    RenderOptions,
    render_image,
    render_to_srgb_u8,
)
from ray_tracying_tpu.io.ppm import read_ppm, write_ppm

__version__ = "0.1.0"

__all__ = [
    "Scene",
    "Camera",
    "Lights",
    "Materials",
    "Primitives",
    "Planes",
    "KIND_SPHERE",
    "KIND_CUBE",
    "KIND_RECT",
    "load_scene",
    "load_scene_dict",
    "RenderOptions",
    "render_image",
    "render_to_srgb_u8",
    "read_ppm",
    "write_ppm",
]
