"""Frame-cube geometry and dataset.

A video is treated as a 3D volume: frame width -> x, frame height -> y,
time -> z, normalized into an NDC-like box (reference:
frame_cube/frame.py:65-190).  ``scale = max(H, W, T) / 2`` and the frame
plane for frame ``i`` sits at ``z = (i - T/2) / scale``.

The reference encodes the two per-frame view directions as 4x4 glm lookAt
matrices (frame_cube/frame.py:18-43).  For an axis-aligned orthographic
camera those matrices reduce to two facts we keep explicitly instead:

  * forward view (eye looking toward -z): view coords (x, y), depth
    increases as world z *decreases*;
  * reversed view ("_s", looking toward +z): view x is mirrored
    (x -> -x) and depth increases as world z *increases*.

So a view is ``(flip: bool)``: the renderer mirrors x and reverses the
z compositing order for the reversed view, and the training loop x-flips
the reversed image before averaging (reference: pipeline/train.py:368-375).
"""

from __future__ import annotations

import pathlib
import pickle
from dataclasses import dataclass
from typing import List, Optional, Union

import numpy as np


@dataclass
class Frame:
    """One z-plane of the frame cube (reference: frame_cube/frame.py:46-59)."""

    image_id: int
    image: Optional[np.ndarray]     # [H, W, 3] float32 in [0, 1]; None = dummy
    x_min: float                    # NDC x of pixel column 0
    y_min: float                    # NDC y of pixel row 0
    z: float                        # NDC z of the frame plane (== cam z)
    image_width: int
    image_height: int
    scale: float                    # pixels per NDC unit


def frame_geometry(width: int, height: int, num_frames: int):
    """NDC scaling for a (width, height, num_frames) cube.

    Mirrors frame_cube/frame.py:98-101: scale = max(H, W, T)/2,
    x_min = -W/2/scale, y_min = -H/2/scale, z_min = -T/2/scale.
    """
    scale = max(height, width, num_frames) / 2
    x_min = -width / 2 / scale
    y_min = -height / 2 / scale
    z_min = -num_frames / 2 / scale
    return scale, x_min, y_min, z_min


def frame_z(image_id: int, num_frames: int, scale: float) -> float:
    """z of frame plane i (reference: frame_cube/frame.py:158)."""
    return (image_id - num_frames / 2) / scale


class FrameCubeDataset:
    """Loads all frames (and optical-flow pickles) of one GOP into host RAM.

    Reference: frame_cube/frame.py:65-277.  Frames are PNG/JPG files sorted
    by name; optical flow is one pickle per frame pair, an array of shape
    [2, H, W] holding backward flow (u, v) in pixels.
    """

    def __init__(
        self,
        main_dir: Union[str, pathlib.Path, None] = None,
        optical_flow_dir: Union[str, pathlib.Path, None] = None,
        images: Optional[np.ndarray] = None,
        flows: Optional[np.ndarray] = None,
        prefetch: bool = True,
    ):
        if images is not None:
            # in-memory construction (tests, synthetic data)
            self.images = np.asarray(images, dtype=np.float32)  # [T, H, W, 3]
            self.flows = None if flows is None else np.asarray(flows, np.float32)
            self._paths: List[pathlib.Path] = []
            self._flow_paths: List[pathlib.Path] = []
            t, h, w = self.images.shape[0], self.images.shape[1], self.images.shape[2]
        else:
            main_dir = pathlib.Path(main_dir)
            self._paths = sorted(p for p in main_dir.iterdir() if p.is_file())
            if optical_flow_dir:
                flow_dir = pathlib.Path(optical_flow_dir)
                self._flow_paths = sorted(p for p in flow_dir.iterdir() if p.is_file())
            else:
                self._flow_paths = []
            first = self._load_image(self._paths[0])
            t, h, w = len(self._paths), first.shape[0], first.shape[1]
            self.images = None
            self.flows = None
            if prefetch:
                self.images = np.stack(
                    [self._load_image(p) for p in self._paths], axis=0)
                if self._flow_paths:
                    self.flows = np.stack(
                        [self._load_flow(p) for p in self._flow_paths], axis=0)

        self.height = h
        self.width = w
        self.num_frames = t
        self.scale, self.x_min, self.y_min, self.z_min = frame_geometry(w, h, t)

    # -- IO -----------------------------------------------------------------
    @staticmethod
    def _load_image(path: pathlib.Path) -> np.ndarray:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, dtype=np.float32) / 255.0  # [H, W, 3]

    @staticmethod
    def _load_flow(path: pathlib.Path) -> np.ndarray:
        with open(path, "rb") as f:
            uv = pickle.load(f)
        return np.asarray(uv, dtype=np.float32)  # [2, H, W]

    # -- accessors ----------------------------------------------------------
    def __len__(self) -> int:
        return self.num_frames

    @property
    def len_z_frames(self) -> int:
        return self.num_frames

    def get_z_frame(self, image_id: int, load_image: bool = True) -> Frame:
        if load_image:
            if self.images is not None:
                image = self.images[image_id]
            else:
                image = self._load_image(self._paths[image_id])
        else:
            image = None
        return Frame(
            image_id=image_id,
            image=image,
            x_min=self.x_min,
            y_min=self.y_min,
            z=frame_z(image_id, self.num_frames, self.scale),
            image_width=self.width,
            image_height=self.height,
            scale=self.scale,
        )

    def get_dummy_frame(self, image_id: int) -> Frame:
        return self.get_z_frame(image_id, load_image=False)

    def __getitem__(self, idx: int) -> Frame:
        return self.get_z_frame(idx)

    def get_optical_flow(self, idx: int) -> Optional[np.ndarray]:
        if self.flows is not None:
            return self.flows[idx]
        if self._flow_paths:
            return self._load_flow(self._flow_paths[idx])
        return None
