from . import color, constants, fresnel, onb, rng, sampler, transform, vecmath  # noqa: F401
