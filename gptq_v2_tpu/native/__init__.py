"""Native (C++) host-side accelerators, bound via ctypes.

Compiled on demand with the system ``g++`` into a per-user cache directory;
every entry point has a numpy reference implementation in
``ops/packing.py`` that remains the behavioral oracle and fallback when no
toolchain is available.  (The TPU *compute* path needs no native code —
Pallas kernels compile through XLA; this covers host-side load/reshard hot
loops.)
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "pack.cpp"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(os.environ.get("GPTQ_V2_TPU_NATIVE_CACHE",
                                    Path(tempfile.gettempdir()) / "gptq_v2_tpu_native"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / f"pack_{tag}.so"
    if not so.exists():
        # unique tmp per process: concurrent first-time builds must not
        # interleave g++ output into the published .so
        fd, tmp = tempfile.mkstemp(suffix=".so.tmp", dir=cache_dir)
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               str(_SRC), "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic publish
    lib = ctypes.CDLL(str(so))
    i64, pu8, pi32 = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                      ctypes.POINTER(ctypes.c_int32))
    lib.pack_int4.argtypes = [pu8, i64, i64, i64, pi32]
    lib.pack_int4.restype = None
    lib.unpack_int4.argtypes = [pi32, i64, i64, i64, pu8]
    lib.unpack_int4.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None when building is impossible."""
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception as e:  # missing g++, sandboxed fs, ...
            logger.info("native pack unavailable (%s); using numpy fallback", e)
    return _lib


def pack_int4(codes: np.ndarray, group_size: int) -> Optional[np.ndarray]:
    """(R, C_pad) uint8 (C_pad %% 8g == 0) → (C_pad/8, R) int32; None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    r, c = codes.shape
    assert c % (8 * group_size) == 0
    out = np.zeros((c // 8, r), dtype=np.int32)
    lib.pack_int4(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  r, c, group_size,
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def unpack_int4(packed: np.ndarray, group_size: int) -> Optional[np.ndarray]:
    """(C_pad/8, R) int32 → (R, C_pad) uint8; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    c8, r = packed.shape
    c = c8 * 8
    out = np.empty((r, c), dtype=np.uint8)
    lib.unpack_int4(packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    r, c, group_size,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
