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


class _LazyF32Frames:
    """Per-item float32 view over a compact (uint8/float16) frame stack.

    Keeps the decoded GOP in RAM/disk at native precision (a 600-frame
    1080p GOP is 3.7 GB as uint8 vs 15 GB as float32) and converts one
    frame at a time on access — every consumer of ``dataset.images`` /
    ``dataset.flows`` indexes per frame (report.evaluate_video,
    parallel/spmd, train/fit)."""

    def __init__(self, raw: np.ndarray, divisor: float = 1.0):
        self._raw = raw
        self._div = divisor

    @property
    def shape(self):
        return self._raw.shape

    def __len__(self) -> int:
        return len(self._raw)

    def __getitem__(self, idx):
        out = np.asarray(self._raw[idx], np.float32)
        if self._div != 1.0:
            out = out / self._div   # divide (not mul-by-inverse): bit-
        return out                  # identical to the uncached loader


class FrameCubeDataset:
    """Loads all frames (and optical-flow pickles) of one GOP into host RAM.

    Reference: frame_cube/frame.py:65-277.  Frames are PNG/JPG files sorted
    by name; optical flow is one pickle per frame pair, an array of shape
    [2, H, W] holding backward flow (u, v) in pixels.

    With ``cache=True`` (default) the decoded arrays are persisted under
    ``<main_dir>/.cube_cache/`` (uint8 frames + native-precision flows,
    ``np.memmap``-backed) so that relaunches skip the PNG decode — ~20
    minutes for a 600-frame 1080p GOP on this 1-core host, paid once.
    ``images``/``flows`` then become lazy per-frame float32 views; the
    raw stacks are exposed as ``images_u8`` / ``flows_raw`` for consumers
    that want the compact dtype directly (train/fit.py uploads uint8 to
    HBM).
    """

    def __init__(
        self,
        main_dir: Union[str, pathlib.Path, None] = None,
        optical_flow_dir: Union[str, pathlib.Path, None] = None,
        images: Optional[np.ndarray] = None,
        flows: Optional[np.ndarray] = None,
        prefetch: bool = True,
        cache: bool = True,
    ):
        self.images_u8: Optional[np.ndarray] = None
        self.flows_raw: Optional[np.ndarray] = None
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
                u8, flow_raw = (self._load_cached(main_dir) if cache
                                else (None, None))
                if u8 is None:
                    u8, flow_raw = self._decode_all(
                        main_dir if cache else None)
                self.images_u8 = u8
                self.images = _LazyF32Frames(u8, 255.0)
                if flow_raw is not None:
                    self.flows_raw = flow_raw
                    self.flows = _LazyF32Frames(flow_raw)

        self.height = h
        self.width = w
        self.num_frames = t
        self.scale, self.x_min, self.y_min, self.z_min = frame_geometry(w, h, t)

    # -- IO -----------------------------------------------------------------
    _CACHE_VERSION = 1

    def _manifest(self) -> dict:
        return {
            "version": self._CACHE_VERSION,
            "frames": [[p.name, p.stat().st_size] for p in self._paths],
            "flows": [[p.name, p.stat().st_size] for p in self._flow_paths],
        }

    def _load_cached(self, main_dir: pathlib.Path):
        """Return (img_u8, flow_raw) mmaps if a valid cache exists."""
        import json

        cdir = main_dir / ".cube_cache"
        man = cdir / "manifest.json"
        if not man.exists():
            return None, None
        try:
            saved = json.loads(man.read_text())
        except (OSError, ValueError):
            return None, None
        if saved != self._manifest():
            return None, None
        try:
            u8 = np.load(cdir / "img_u8.npy", mmap_mode="r")
            flow = (np.load(cdir / "flow.npy", mmap_mode="r")
                    if self._flow_paths else None)
        except (OSError, ValueError):
            return None, None
        return u8, flow

    def _decode_all(self, cache_root: Optional[pathlib.Path]):
        """Decode every frame (uint8) and flow (native precision); when
        ``cache_root`` is given, persist them under ``.cube_cache/``
        (tmp-file + rename + manifest-last, so an interrupted build never
        looks valid)."""
        import json

        from PIL import Image
        from numpy.lib.format import open_memmap

        cdir = None
        if cache_root is not None:
            cdir = cache_root / ".cube_cache"
            cdir.mkdir(exist_ok=True)

        with Image.open(self._paths[0]) as im0:
            w, h = im0.size
        t = len(self._paths)
        if cdir is not None:
            u8 = open_memmap(cdir / "img_u8.npy.tmp", mode="w+",
                             dtype=np.uint8, shape=(t, h, w, 3))
        else:
            u8 = np.empty((t, h, w, 3), np.uint8)
        for i, p in enumerate(self._paths):
            u8[i] = np.asarray(Image.open(p).convert("RGB"), np.uint8)

        flow = None
        if self._flow_paths:
            f0 = self._load_flow_raw(self._flow_paths[0])
            fdtype = np.float16 if f0.dtype == np.float16 else np.float32
            fshape = (len(self._flow_paths),) + f0.shape
            if cdir is not None:
                flow = open_memmap(cdir / "flow.npy.tmp", mode="w+",
                                   dtype=fdtype, shape=fshape)
            else:
                flow = np.empty(fshape, fdtype)
            flow[0] = f0
            for i, p in enumerate(self._flow_paths[1:], start=1):
                flow[i] = self._load_flow_raw(p)

        if cdir is not None:
            u8.flush()
            (cdir / "img_u8.npy.tmp").rename(cdir / "img_u8.npy")
            if flow is not None:
                flow.flush()
                (cdir / "flow.npy.tmp").rename(cdir / "flow.npy")
            (cdir / "manifest.json").write_text(json.dumps(self._manifest()))
            u8 = np.load(cdir / "img_u8.npy", mmap_mode="r")
            if flow is not None:
                flow = np.load(cdir / "flow.npy", mmap_mode="r")
        return u8, flow

    @staticmethod
    def _load_flow_raw(path: pathlib.Path) -> np.ndarray:
        with open(path, "rb") as f:
            return np.asarray(pickle.load(f))

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
