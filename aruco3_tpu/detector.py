"""Detector API — stub, full pipeline lands in the next commits."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .dictionaries import ARDictionary


@dataclass(frozen=True)
class DetectorConfig:
    """Tunables, defaults matching reference src/aruco.rs:32-43."""

    threshold_window: int = 7
    contour_simplification_epsilon: float = 0.05
    min_side_length_factor: float = 0.2
    min_corner_separation_factor: float = 0.1
    homography_sample_size: int = 49
    filter_high_bit_errors: bool = True


@dataclass
class Marker:
    """Decoded marker (reference src/aruco.rs:7-13)."""

    id: int
    code: int
    corners: list[tuple[int, int]]
    hamming_distance: int


@dataclass
class Detection:
    """Pipeline output incl. debug intermediates (reference src/aruco.rs:15-21)."""

    grey: np.ndarray | None = None
    candidates: list = field(default_factory=list)
    homographies: list = field(default_factory=list)
    markers: list[Marker] = field(default_factory=list)


class Detector:
    def __init__(self, config: DetectorConfig, dictionary: ARDictionary):
        self.config = config
        self.dictionary = dictionary

    def detect(self, image) -> Detection:
        raise NotImplementedError("detect pipeline lands next")
