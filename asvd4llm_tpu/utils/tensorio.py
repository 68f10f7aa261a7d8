"""ctypes bindings for the native tensorio library + a torch-free
safetensors reader.

The C++ side (native/tensorio.cpp) does the mmap and the hot bf16/f16->f32
conversions; Python parses the 8-byte-length-prefixed JSON header of the
safetensors format and wraps tensors as numpy arrays. Falls back to a
pure-numpy implementation when the .so hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import json
import logging
import os
import struct
import numpy as np

log = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libtensorio.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # build artifact, not committed — build on first use
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH), "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:
            log.warning("native tensorio build failed (%s); numpy fallback", e)
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ts_open.restype = ctypes.c_void_p
    lib.ts_open.argtypes = [ctypes.c_char_p]
    lib.ts_size.restype = ctypes.c_uint64
    lib.ts_size.argtypes = [ctypes.c_void_p]
    lib.ts_ptr.restype = ctypes.c_void_p
    lib.ts_ptr.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.ts_close.argtypes = [ctypes.c_void_p]
    lib.bf16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_uint64]
    lib.f16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_uint64]
    lib.f32_to_bf16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_uint64]
    lib.ts_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                            ctypes.c_uint64]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


_ST_DTYPES = {
    "F32": (np.float32, 4), "F16": (np.float16, 2), "BF16": (None, 2),
    "I64": (np.int64, 8), "I32": (np.int32, 4), "I16": (np.int16, 2),
    "I8": (np.int8, 1), "U8": (np.uint8, 1), "BOOL": (np.bool_, 1),
    "F64": (np.float64, 8),
}


def bf16_bytes_to_f32(buf: np.ndarray) -> np.ndarray:
    """buf: uint16 array of bf16 bit patterns -> float32 (native or numpy)."""
    lib = _load_lib()
    out = np.empty(buf.shape, np.float32)
    if lib is not None and buf.size:
        src = np.ascontiguousarray(buf)
        lib.bf16_to_f32(src.ctypes.data, out.ctypes.data, src.size)
    else:
        out[...] = (buf.astype(np.uint32) << 16).view(np.float32)
    return out


def f32_to_bf16_bits(arr: np.ndarray) -> np.ndarray:
    """float32 -> uint16 bf16 bit patterns (round-to-nearest-even)."""
    lib = _load_lib()
    src = np.ascontiguousarray(arr, np.float32)
    out = np.empty(src.shape, np.uint16)
    if lib is not None and src.size:
        lib.f32_to_bf16(src.ctypes.data, out.ctypes.data, src.size)
    else:
        bits = src.view(np.uint32)
        lsb = (bits >> 16) & 1
        out[...] = ((bits + 0x7FFF + lsb) >> 16).astype(np.uint16)
    return out


class SafetensorsFile:
    """Torch-free reader for one .safetensors file."""

    def __init__(self, path: str):
        self.path = path
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.ts_open(path.encode())
        if self._handle:
            n = self._lib.ts_size(self._handle)
            hdr_ptr = self._lib.ts_ptr(self._handle, 0)
            raw = ctypes.string_at(hdr_ptr, 8)
        else:
            self._mm = np.memmap(path, dtype=np.uint8, mode="r")
            raw = bytes(self._mm[:8])
        (hdr_len,) = struct.unpack("<Q", raw)
        file_size = (self._lib.ts_size(self._handle) if self._handle
                     else self._mm.size)
        if hdr_len > file_size - 8:
            self.close()
            raise ValueError(
                f"{path}: corrupt safetensors header (len {hdr_len} "
                f"exceeds file size {file_size})")
        if self._handle:
            hdr = ctypes.string_at(self._lib.ts_ptr(self._handle, 8), hdr_len)
        else:
            hdr = bytes(self._mm[8:8 + hdr_len])
        self.header = json.loads(hdr)
        self.header.pop("__metadata__", None)
        self._data_start = 8 + hdr_len
        self._file_size = file_size

    def keys(self):
        return list(self.header)

    def _raw(self, offset: int, nbytes: int) -> np.ndarray:
        # data_offsets come from the (untrusted) JSON header: bound-check
        # against the mapping before any copy, or a truncated/malicious
        # file turns into an OOB read through ts_copy's memcpy.
        off = self._data_start + offset
        if offset < 0 or nbytes < 0 or off + nbytes > self._file_size:
            raise ValueError(
                f"{self.path}: tensor range [{off}, {off + nbytes}) exceeds "
                f"file size {self._file_size}")
        if self._handle:
            buf = np.empty((nbytes,), np.uint8)
            if nbytes:
                ptr = self._lib.ts_ptr(self._handle, off)
                if not ptr:
                    raise ValueError(f"{self.path}: bad offset {off}")
                self._lib.ts_copy(ptr, buf.ctypes.data, nbytes)
            return buf
        return np.asarray(self._mm[off:off + nbytes])

    def tensor(self, name: str, *, to_f32: bool = True) -> np.ndarray:
        info = self.header[name]
        dtype_tag = info["dtype"]
        shape = tuple(info["shape"])
        b0, b1 = info["data_offsets"]
        if not (0 <= b0 <= b1):
            raise ValueError(f"{self.path}: bad data_offsets for {name!r}: "
                             f"({b0}, {b1})")
        _, itemsize = _ST_DTYPES[dtype_tag]
        expect = int(np.prod(shape, dtype=np.int64)) * itemsize if shape else itemsize
        if b1 - b0 != expect:
            raise ValueError(
                f"{self.path}: {name!r} byte range {b1 - b0} != "
                f"shape {shape} x itemsize {itemsize}")
        raw = self._raw(b0, b1 - b0)
        if dtype_tag == "BF16":
            bits = raw.view(np.uint16)
            arr = bf16_bytes_to_f32(bits) if to_f32 else bits
        else:
            np_dtype, _ = _ST_DTYPES[dtype_tag]
            arr = raw.view(np_dtype)
            if to_f32 and dtype_tag == "F16":
                lib = _load_lib()
                if lib is not None and arr.size:
                    out = np.empty(arr.shape, np.float32)
                    src = np.ascontiguousarray(arr.view(np.uint16))
                    lib.f16_to_f32(src.ctypes.data, out.ctypes.data, src.size)
                    arr = out
                else:
                    arr = arr.astype(np.float32)
        return arr.reshape(shape)

    def close(self):
        if self._handle and self._lib is not None:
            self._lib.ts_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def load_safetensors_state_dict(model_dir: str, *, to_f32: bool = True
                                ) -> dict:
    """Load all .safetensors shards in a checkpoint dir as
    {name: np.ndarray} — the torch-free path into
    models.loader.params_from_state_dict."""
    import glob
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors in {model_dir}")
    sd = {}
    for path in files:
        with SafetensorsFile(path) as f:
            for k in f.keys():
                sd[k] = f.tensor(k, to_f32=to_f32)
    return sd
