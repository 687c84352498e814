"""tpu-ray: a TPU-native wavefront path tracer (RTIOW trilogy capabilities).

Built from scratch in JAX for TPU; see SURVEY.md for the structural map of
the reference implementation this framework matches feature-for-feature.

Submodules are imported lazily (PEP 562) so that ``jax.config`` can still be
adjusted (e.g. forcing the CPU backend) after ``import tpu_ray`` - importing
any compute module initializes the JAX backend, after which platform
selection is frozen.
"""
from __future__ import annotations

import importlib

__version__ = "0.1.0"
__all__ = [
    "Camera", "film", "trace", "objects", "build_scene", "SceneData",
    "SCENES", "render",
]

_LAZY = {
    "Camera": ("tpu_ray.core.camera", "Camera"),
    "film": ("tpu_ray.core.film", None),
    "trace": ("tpu_ray.integrator", "trace"),
    "objects": ("tpu_ray.models.objects", None),
    "build_scene": ("tpu_ray.models.compile", "build_scene"),
    "SceneData": ("tpu_ray.models.scene_data", "SceneData"),
    "SCENES": ("tpu_ray.models.scenes", "SCENES"),
    "render": ("tpu_ray.renderer", "render"),
}


def __getattr__(name):
    if name in _LAZY:
        module_name, attr = _LAZY[name]
        mod = importlib.import_module(module_name)
        value = mod if attr is None else getattr(mod, attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'tpu_ray' has no attribute {name!r}")
