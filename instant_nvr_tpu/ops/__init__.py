from . import math, lbs, ray, rendering, grid_sample, hashgrid, knn, searchsorted, select, ssim  # noqa: F401
