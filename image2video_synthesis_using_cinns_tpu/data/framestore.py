"""Packed-frame dataset cache (python side of ``native/framestore.cpp``).

``FrameStore.build`` decodes a video dataset ONCE into a single binary file
(uint8 RGB, video-major); ``FrameStore`` then serves random clip windows out
of an mmap — the native library does a threaded batch gather, a pure-numpy
mmap fallback covers environments without the compiled ``libframestore.so``
(build with ``make -C native``).

This replaces per-epoch image decoding in the hot input path: the loader asks
for (video, start, length) windows and hands contiguous uint8 batches
straight to the on-device augmentation.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct

import numpy as np

MAGIC = b"FSTORE01"
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libframestore.so"),
    "libframestore.so",
]


def _load_lib():
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.fs_open.restype = ctypes.c_void_p
        lib.fs_open.argtypes = [ctypes.c_char_p]
        lib.fs_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.fs_num_frames.restype = ctypes.c_int64
        lib.fs_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fs_read_batch.restype = ctypes.c_int
        lib.fs_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.fs_close.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_lib()


class FrameStore:
    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        with open(path + ".json") as f:
            self.index = json.load(f)
        self._handle = None
        self._lib = _LIB if use_native else None
        if self._lib is not None:
            self._handle = self._lib.fs_open(path.encode())
            if not self._handle:
                self._lib = None

        # numpy fallback / metadata
        with open(path, "rb") as f:
            header = f.read(32)
            assert header[:8] == MAGIC, f"bad framestore {path}"
            (self.n_videos,) = struct.unpack("<q", header[8:16])
            self.height, self.width, self.channels = struct.unpack(
                "<iii", header[16:28]
            )
            self.offsets = np.fromfile(f, dtype=np.int64, count=self.n_videos + 1)
        self._data_start = 32 + (self.n_videos + 1) * 8
        self._frame_bytes = self.height * self.width * self.channels
        if self._lib is None:
            self._mmap = np.memmap(path, dtype=np.uint8, mode="r")

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "numpy"

    def num_frames(self, vid: int) -> int:
        return int(self.offsets[vid + 1] - self.offsets[vid])

    def read_batch(self, vids, starts, length: int) -> np.ndarray:
        vids = np.ascontiguousarray(vids, dtype=np.int64)
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        b = len(vids)
        out = np.empty((b, length, self.height, self.width, self.channels), np.uint8)
        if self._lib is not None:
            rc = self._lib.fs_read_batch(
                self._handle,
                vids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                b, length,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                raise IndexError(f"fs_read_batch failed with {rc}")
            return out
        for i, (v, s) in enumerate(zip(vids, starts)):
            off = self._data_start + (self.offsets[v] + s) * self._frame_bytes
            flat = self._mmap[off : off + length * self._frame_bytes]
            out[i] = flat.reshape(length, self.height, self.width, self.channels)
        return out

    def read_window(self, item: dict) -> np.ndarray:
        """Loader hook: item carries 'index' (video) and 'start'."""
        vid = self.index["video_map"][str(item["index"])] if "video_map" in self.index else item["index"]
        return self.read_batch([vid], [item["start"]], len(item["paths"]))[0]

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.fs_close(self._handle)
            self._handle = None

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, dataset, path: str, imread=None) -> "FrameStore":
        """Decode every frame of ``dataset`` (a datasets.VideoDataset) once
        into a packed file. Videos keep the dataset's index order."""
        from .loader import _imread_rgb

        imread = imread or _imread_rgb
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

        counts = []
        first = imread(dataset.frame_path(dataset.videos[0], _first_frame(dataset)))
        h, w, c = first.shape

        with open(path, "wb") as f:
            f.write(MAGIC)
            n = len(dataset.videos)
            f.write(struct.pack("<q", n))
            f.write(struct.pack("<iii", h, w, c))
            f.write(b"\x00" * 4)
            # placeholder offsets, rewritten at the end
            f.write(np.zeros(n + 1, np.int64).tobytes())
            for vi, video in enumerate(dataset.videos):
                nf = dataset.num_frames[vi]
                counts.append(nf)
                for k in range(nf):
                    frame = imread(dataset.frame_path(video, _first_frame(dataset) + k))
                    assert frame.shape == (h, w, c)
                    f.write(np.ascontiguousarray(frame, np.uint8).tobytes())
            offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            f.seek(32)
            f.write(offsets.tobytes())
        with open(path + ".json", "w") as f:
            json.dump({"n_videos": len(counts), "height": h, "width": w}, f)
        return cls(path)


def _first_frame(dataset) -> int:
    return 0
