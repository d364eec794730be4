"""
geometry
========

Core projective-geometry primitives, written as pure jittable JAX functions.

Replaces the OpenCV calls used by the reference:
``cv2.projectPoints``, ``cv2.undistortPoints``, ``cv2.perspectiveTransform``,
``cv2.Rodrigues`` (reference usage: /root/reference/simplestereo/active.py,
calibration.py, rectification.py).
"""

from .rotations import rodrigues_to_matrix, matrix_to_rodrigues
from .distortion import distort_normalized, undistort_normalized, undistort_points, distort_points
from .projection import (
    project_points,
    perspective_transform,
    to_homogeneous,
    from_homogeneous,
    cross_product_matrix,
)

__all__ = [
    "rodrigues_to_matrix",
    "matrix_to_rodrigues",
    "distort_normalized",
    "undistort_normalized",
    "undistort_points",
    "distort_points",
    "project_points",
    "perspective_transform",
    "to_homogeneous",
    "from_homogeneous",
    "cross_product_matrix",
]
