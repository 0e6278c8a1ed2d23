"""Pinhole camera model.

Parity surface vs reference src/pinhole.rs:
  * ``CameraIntrinsics`` fields + ``new`` defaults (pinhole.rs:10-35),
  * ``new_from_fov_horizontal`` (pinhole.rs:37-60, including its
    vfov = hfov / aspect approximation),
  * ``project`` / ``project_culled`` / ``unproject`` (pinhole.rs:65-93),
  * K-matrix conversions (pinhole.rs:97-115),
  * ``CameraExtrinsics`` / ``CameraModel`` containers (pinhole.rs:4-23).

All math methods accept scalars or arrays (jnp broadcasting), so the same
intrinsics object serves both the scalar reference API and the batched
device-side pipeline.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CameraIntrinsics:
    image_width: int
    image_height: int
    focal_x: float
    focal_y: float
    principal_x: float
    principal_y: float

    # ------------------------------------------------------------ builders
    @staticmethod
    def new(
        image_width: int,
        image_height: int,
        focal_x: float,
        focal_y: float,
        principal_x: float | None = None,
        principal_y: float | None = None,
    ) -> "CameraIntrinsics":
        """Principal point defaults to the image centre (pinhole.rs:26-35)."""
        return CameraIntrinsics(
            image_width=image_width,
            image_height=image_height,
            focal_x=focal_x,
            focal_y=focal_y,
            principal_x=(
                principal_x if principal_x is not None else image_width / 2.0
            ),
            principal_y=(
                principal_y if principal_y is not None else image_height / 2.0
            ),
        )

    @staticmethod
    def new_from_fov_horizontal(
        horizontal_fov_radians: float,
        sensor_width_mm: float,
        resolution_x: int,
        resolution_y: int,
    ) -> "CameraIntrinsics":
        """Derive intrinsics from horizontal FOV (pinhole.rs:37-60).

        Keeps the reference's approximation vfov = hfov / aspect_ratio.
        """
        aspect_ratio = resolution_x / resolution_y
        vertical_fov_radians = horizontal_fov_radians / aspect_ratio
        sensor_height_mm = sensor_width_mm / aspect_ratio
        horizontal_focal_length_mm = (sensor_width_mm * 0.5) / math.tan(
            horizontal_fov_radians * 0.5
        )
        vertical_focal_length_mm = (sensor_height_mm * 0.5) / math.tan(
            vertical_fov_radians * 0.5
        )
        return CameraIntrinsics(
            image_width=resolution_x,
            image_height=resolution_y,
            focal_x=horizontal_focal_length_mm,
            focal_y=vertical_focal_length_mm,
            principal_x=resolution_x * 0.5,
            principal_y=resolution_y * 0.5,
        )

    # ---------------------------------------------------------------- math
    def project(self, x, y, z):
        """Camera space -> homogeneous image coords (pinhole.rs:65-71)."""
        return (
            x * self.focal_x + z * self.principal_x,
            y * self.focal_y + z * self.principal_y,
            z,
        )

    def project_culled(self, x, y, z):
        """Perspective-divide projection; None when z <= 0 (pinhole.rs:76-84).

        For array inputs returns (u, v, valid_mask) instead of None.
        """
        if np.isscalar(x) and np.isscalar(y) and np.isscalar(z):
            if z <= 0.0:
                return None
            return (
                (x * self.focal_x) / z + self.principal_x,
                (y * self.focal_y) / z + self.principal_y,
            )
        x, y, z = jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
        valid = z > 0.0
        zsafe = jnp.where(valid, z, 1.0)
        return (
            (x * self.focal_x) / zsafe + self.principal_x,
            (y * self.focal_y) / zsafe + self.principal_y,
            valid,
        )

    def unproject(self, x, y):
        """Image plane -> normalized camera coords at z=1 (pinhole.rs:88-93)."""
        return (
            (x - self.principal_x) / self.focal_x,
            (y - self.principal_y) / self.focal_y,
        )

    # ------------------------------------------------------------ matrices
    def k_matrix(self) -> np.ndarray:
        """3x3 K matrix (pinhole.rs:97-105)."""
        return np.array(
            [
                [self.focal_x, 0.0, self.principal_x],
                [0.0, self.focal_y, self.principal_y],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float32,
        )

    def k_matrix_3x4(self) -> np.ndarray:
        """3x4 [K | 0] matrix (pinhole.rs:107-115)."""
        return np.concatenate(
            [self.k_matrix(), np.zeros((3, 1), dtype=np.float32)], axis=1
        )


@dataclass(frozen=True)
class CameraExtrinsics:
    """World pose of the camera (pinhole.rs:4-8)."""

    basis: np.ndarray = field(
        default_factory=lambda: np.eye(3, dtype=np.float32)
    )
    origin: np.ndarray = field(
        default_factory=lambda: np.zeros(3, dtype=np.float32)
    )


@dataclass(frozen=True)
class CameraModel:
    """Intrinsics + extrinsics bundle (pinhole.rs:20-23)."""

    intrinsics: CameraIntrinsics
    extrinsics: CameraExtrinsics
