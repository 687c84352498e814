from . import intersect, lights, scatter, textures  # noqa: F401
