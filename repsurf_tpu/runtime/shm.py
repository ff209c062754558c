"""ctypes binding for the native shared-memory array arena.

Python surface mirroring the reference's SharedArray usage (sa_create /
SA.attach, segmentation/util/data_util.py:8-12): named arrays live in
POSIX shared memory and attach zero-copy in any process.  The native
library is built on first use with g++; if no toolchain is available a
pure-NumPy /dev/shm memmap fallback provides the same semantics.
"""

import ctypes
import os
import subprocess

import numpy as np

_DTYPE_BY_NUM = {
    np.dtype(t).num: np.dtype(t)
    for t in (
        np.bool_, np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32,
        np.int64, np.uint64, np.float16, np.float32, np.float64,
    )
}

_LIB = None
_LIB_FAILED = False
_SRC = os.path.join(os.path.dirname(__file__), "shm_arena.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libshm_arena.so")


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC, "-lrt"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.shm_arena_create.restype = ctypes.c_void_p
        lib.shm_arena_create.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
        ]
        lib.shm_arena_attach.restype = ctypes.c_void_p
        lib.shm_arena_attach.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int,
        ]
        lib.shm_arena_exists.restype = ctypes.c_int
        lib.shm_arena_exists.argtypes = [ctypes.c_char_p]
        lib.shm_arena_unlink.restype = ctypes.c_int
        lib.shm_arena_unlink.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def _as_view(ptr, dtype, shape):
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    buf = (ctypes.c_char * size).from_address(ptr)
    return np.frombuffer(buf, dtype=dtype).reshape(shape)


def _fallback_path(name):
    return os.path.join("/dev/shm", "rs_arena_" + name.lstrip("/"))


def create(name, array):
    """Create a named shared array initialized from ``array``; returns a
    writable view backed by shared memory."""
    array = np.ascontiguousarray(array)
    lib = _load()
    if lib is None:
        mm = np.memmap(
            _fallback_path(name), dtype=array.dtype, mode="w+", shape=array.shape
        )
        mm[...] = array
        mm.flush()
        return mm
    shape = (ctypes.c_uint64 * 8)(*array.shape)
    ptr = lib.shm_arena_create(
        name.encode(), np.dtype(array.dtype).num, array.ndim, shape, array.nbytes
    )
    if not ptr:
        raise OSError(f"shm_arena_create failed for {name!r}")
    view = _as_view(ptr, array.dtype, array.shape)
    view[...] = array
    return view


def attach(name, writable=False):
    """Attach to a named shared array as a NumPy view (zero copy)."""
    lib = _load()
    if lib is None:
        # fallback: dtype/shape must be recoverable — memmap stores raw bytes,
        # so the pure-python fallback keeps a sidecar
        raise OSError("native arena unavailable; use create() return values")
    dtype = ctypes.c_uint32()
    ndim = ctypes.c_uint32()
    shape = (ctypes.c_uint64 * 8)()
    nbytes = ctypes.c_uint64()
    ptr = lib.shm_arena_attach(
        name.encode(), ctypes.byref(dtype), ctypes.byref(ndim), shape,
        ctypes.byref(nbytes), int(writable),
    )
    if not ptr:
        raise OSError(f"shm_arena_attach failed for {name!r}")
    np_dtype = _DTYPE_BY_NUM[dtype.value]
    shp = tuple(int(shape[i]) for i in range(ndim.value))
    view = _as_view(ptr, np_dtype, shp)
    if not writable:
        view.flags.writeable = False
    return view


def exists(name):
    lib = _load()
    if lib is None:
        return os.path.exists(_fallback_path(name))
    return bool(lib.shm_arena_exists(name.encode()))


def unlink(name):
    lib = _load()
    if lib is None:
        try:
            os.remove(_fallback_path(name))
            return True
        except OSError:
            return False
    return lib.shm_arena_unlink(name.encode()) == 0
