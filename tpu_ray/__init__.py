"""tpu-ray: a TPU-native wavefront path tracer (RTIOW trilogy capabilities).

Built from scratch in JAX for TPU; see SURVEY.md for the structural map of
the reference implementation this framework matches feature-for-feature.
"""
from .core.camera import Camera
from .core import film
from .integrator import trace
from .models import objects
from .models.compile import build_scene
from .models.scene_data import SceneData
from .models.scenes import SCENES
from .renderer import render

__version__ = "0.1.0"
__all__ = [
    "Camera", "film", "trace", "objects", "build_scene", "SceneData",
    "SCENES", "render",
]
