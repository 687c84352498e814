from . import camera, film, rng, vec  # noqa: F401
