from . import compile, objects, scene_data, scenes  # noqa: F401
