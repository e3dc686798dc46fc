"""Physical constants and common refractive indices.

Semantics follow the reference's ``libwurblpt/constants.hpp:26-44`` (speed of light,
common refractive indices used by glass materials and the ToF optical-path-length
accumulation), re-expressed as plain Python floats for use inside jitted JAX code.
"""

# Speed of light in vacuum [m/s] (drives ToF phase computation).
SPEED_OF_LIGHT = 299792458.0

# Planck constant times speed of light [J*m] (spectral radiometry helpers).
PLANCK_H = 6.62607015e-34
PLANCK_HC = PLANCK_H * SPEED_OF_LIGHT

# Common refractive indices (at ~589 nm).
REFRACTIVE_INDEX_VACUUM = 1.0
REFRACTIVE_INDEX_AIR = 1.000293
REFRACTIVE_INDEX_WATER = 1.333
REFRACTIVE_INDEX_GLASS_BK7 = 1.5168
REFRACTIVE_INDEX_GLASS_FLINT = 1.62
REFRACTIVE_INDEX_DIAMOND = 2.417

# Numerical tolerances used by geometry code.
EPSILON = 1.0e-4
DIR_EPSILON = 1.0e-6
