"""ctypes loader for the native runtime library (native/libirn_native.so).

Build with ``make -C native``. Every consumer has a pure-Python fallback, so
the framework degrades gracefully when the library is absent.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

_LIB_NAME = "libirn_native.so"


def _candidate_paths():
    # the explicit override must win over the in-repo build (it used to
    # be yielded second, where the repo path always shadowed it)
    env = os.environ.get("IRN_TPU_NATIVE_LIB")
    if env:
        yield env
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    yield os.path.join(repo, "native", _LIB_NAME)


@functools.lru_cache(maxsize=1)
def load() -> Optional[ctypes.CDLL]:
    for path in _candidate_paths():
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            _declare(lib)
            return lib
    return None


def _declare(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.irn_dense_crf_label.argtypes = [
        u8p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        i32p,
    ]
    lib.irn_dense_crf_label.restype = None

    lib.irn_dense_crf_label2.argtypes = [
        u8p, i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        i32p, i32p,
    ]
    lib.irn_dense_crf_label2.restype = None

    lib.irn_permutohedral_filter.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p
    ]
    lib.irn_permutohedral_filter.restype = None

    lib.irn_label_components.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p]
    lib.irn_label_components.restype = ctypes.c_int

    lib.irn_rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
    lib.irn_rle_encode.restype = ctypes.c_int

    lib.irn_set_num_threads.argtypes = [ctypes.c_int]
    lib.irn_set_num_threads.restype = ctypes.c_int


def set_num_threads(n: int) -> int:
    """OpenMP threads for the native permutohedral filter (1 = serial, the
    bit-exact single-thread path). Returns the effective count, or 1 when
    the library is absent. Image-level fan-out (cam_to_ir_label's thread
    pool) and filter-level threads multiply — divide the cores."""
    lib = load()
    if lib is None:
        return 1
    return int(lib.irn_set_num_threads(int(n)))
