"""Cross-cutting utilities (reference: Common/header/).

- orientation: 3-D rotation toolkit (orientation_tools.h), branch-free JAX
- math: square / almost_equal (MathUtilities.h) + interpolation helpers
"""
from . import math, orientation

__all__ = ["math", "orientation"]
