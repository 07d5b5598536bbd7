"""Shared rasterizer constants.

Single source of truth for the cutoffs that tie the three stages together:
preprocess computes screen AABBs with the same CUTOFF the blend stage uses to
gate contributions, so tile binning (AABB tests) captures *exactly* the set of
splats the oracle would blend. Values follow the reference rasterizer's
reconstructed semantics (SURVEY.md §2.10 [RECON]).
"""

# Frustum near-plane cull for splat centers [RECON].
NEAR_CULL = 0.2

# Screen-space low-pass filter: rho2d = FILTER_INV_SQUARE * |d|^2, a fixed
# ~0.7px-sigma anti-aliasing floor [RECON]. Its gradient is removed
# (reference README.md:118).
FILTER_INV_SQUARE = 2.0

# Gaussian evaluated out to CUTOFF sigmas; beyond that a splat contributes
# nothing (this mirrors the reference's 3-sigma screen AABB, which bounds the
# set of pixels the CUDA kernel ever evaluates).
CUTOFF = 3.0

# Minimum screen radius so the low-pass footprint is fully rasterized:
# alpha = exp(-rho2d/2) falls below 1/255 at |d| ~ 2.35px.
MIN_RADIUS = 3.0

ALPHA_MIN = 1.0 / 255.0
ALPHA_CLAMP = 0.99
T_EPS = 1e-4
MEDIAN_T = 0.5
DIST_NEAR = 0.2
DIST_FAR = 100.0
INTERSECT_NEAR = 0.2  # minimum per-pixel intersection depth [RECON]
