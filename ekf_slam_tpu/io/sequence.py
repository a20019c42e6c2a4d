"""Image-sequence IO: native C++ loader with a NumPy fallback.

The reference reads its monocular sequence with imread in takeImage.m
('%s%04d.pgm', first channel). Here the runtime path is native
(native/imageio.cpp: threaded PGM/PPM batch loader, C ABI via ctypes) with
a pure-NumPy fallback so the package works before `build_native()` runs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libimageio.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "imageio.cpp"))

_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> bool:
    """Compile native/imageio.cpp -> libimageio.so with g++. Returns True
    on success (or if already built)."""
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC_PATH, "-o", _SO_PATH],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.seq_open.restype = ctypes.c_void_p
    lib.seq_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    lib.seq_len.restype = ctypes.c_int
    lib.seq_len.argtypes = [ctypes.c_void_p]
    lib.seq_load_batch.restype = ctypes.c_int
    lib.seq_load_batch.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.seq_close.argtypes = [ctypes.c_void_p]
    lib.load_pnm_gray.restype = ctypes.c_int
    lib.load_pnm_gray.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def write_pgm(path: str, arr: np.ndarray, binary: bool = True,
              maxval: int = 255) -> None:
    """Write a grayscale uint8 (H, W) array as P5 (binary) or P2 (ascii)
    PGM — the inverse of takeImage.m's imread, used to materialize rendered
    sequences in the on-disk layout the reference consumes."""
    h, w = arr.shape
    if binary:
        with open(path, "wb") as f:
            f.write(f"P5\n{w} {h}\n{maxval}\n".encode())
            f.write(arr.astype(np.uint8).tobytes())
    else:
        with open(path, "w") as f:
            f.write(f"P2\n{w} {h}\n{maxval}\n")
            f.write(" ".join(str(int(v)) for v in arr.ravel()))


def write_ppm(path: str, arr_rgb: np.ndarray) -> None:
    """Write an RGB uint8 (H, W, 3) array as binary P6 PPM."""
    h, w, _ = arr_rgb.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr_rgb.astype(np.uint8).tobytes())


# ------------------------------------------------------------- numpy fallback

def _load_pgm_numpy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, dims, maxval with '#' comments
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic = tokens[0].decode()
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    ch = 3 if magic in ("P3", "P6") else 1
    if magic in ("P5", "P6"):
        i += 1  # single whitespace after maxval
        dt = np.uint8 if maxv < 256 else ">u2"
        arr = np.frombuffer(data, dt, count=w * h * ch, offset=i)
    elif magic in ("P2", "P3"):
        arr = np.array(data[i:].split()[: w * h * ch], dtype=np.int32)
    else:
        raise ValueError(f"unsupported PNM magic {magic!r} in {path}")
    arr = arr.reshape(h, w, ch)[:, :, 0].astype(np.float32) / maxv
    return arr


def load_pgm(path: str) -> np.ndarray:
    """Single grayscale image in [0,1] (takeImage.m equivalent)."""
    lib = _load_lib()
    if lib is None:
        return _load_pgm_numpy(path)
    max_elems = 16_000_000
    out = np.empty(max_elems, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ok = lib.load_pnm_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, ctypes.byref(h), ctypes.byref(w))
    if not ok:
        raise IOError(f"failed to load {path}")
    return out[: h.value * w.value].reshape(h.value, w.value).copy()


class ImageSequence:
    """printf-pattern frame sequence with native threaded batch loading.

    >>> seq = ImageSequence("/data/seq/%04d.pgm", start=1, count=100)
    >>> batch = seq.load(0, 8)   # (8, H, W) float32 in [0,1]
    """

    def __init__(self, pattern: str, start: int, count: int):
        self.pattern = pattern
        self.start = start
        self.count = count
        self._handle = None
        lib = _load_lib()
        if lib is not None:
            h = ctypes.c_int()
            w = ctypes.c_int()
            handle = lib.seq_open(pattern.encode(), start, count,
                                  ctypes.byref(h), ctypes.byref(w))
            if handle:
                self._handle = handle
                self.height, self.width = h.value, w.value
                return
        first = _load_pgm_numpy(pattern % start)
        self.height, self.width = first.shape

    def __len__(self):
        return self.count

    def load(self, first: int, n: int) -> np.ndarray:
        """Frames [first, first+n) as (n, H, W) float32."""
        lib = _load_lib()
        if self._handle is not None and lib is not None:
            out = np.empty((n, self.height, self.width), np.float32)
            got = lib.seq_load_batch(
                self._handle, first, n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if got != n:
                raise IOError(
                    f"loaded {got}/{n} frames from {self.pattern}")
            return out
        return np.stack([
            _load_pgm_numpy(self.pattern % (self.start + first + i))
            for i in range(n)])

    def close(self):
        lib = _load_lib()
        if self._handle is not None and lib is not None:
            lib.seq_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class VideoSequence:
    """Video-file frame source (takeImageFromAvi.m:1-5 analog): decodes the
    file to grayscale [0,1] frames through ffmpeg. The whole clip is
    decoded once on open and cached (the reference's aviread also loads
    from a fully-indexed avi; SLAM input clips are short). Requires ffmpeg
    on PATH — raises RuntimeError otherwise."""

    def __init__(self, path: str):
        import shutil
        import subprocess
        if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
            raise RuntimeError("VideoSequence requires ffmpeg/ffprobe; "
                               "use ImageSequence for PGM/PPM frames")
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height", "-of", "csv=p=0",
             path], check=True, capture_output=True, text=True)
        w, h = (int(t) for t in probe.stdout.strip().split(",")[:2])
        raw = subprocess.run(
            ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
             "-pix_fmt", "gray", "-"],
            check=True, capture_output=True).stdout
        n = len(raw) // (w * h)
        self.height, self.width, self.count = h, w, n
        self._frames = (np.frombuffer(raw, np.uint8, count=n * h * w)
                        .reshape(n, h, w).astype(np.float32) / 255.0)

    def __len__(self):
        return self.count

    def load(self, first: int, n: int) -> np.ndarray:
        """Frames [first, first+n) as (n, H, W) float32 in [0,1]."""
        if first < 0 or first + n > self.count:
            raise IndexError(f"frames [{first}, {first + n}) out of "
                             f"range 0..{self.count}")
        return self._frames[first:first + n].copy()
