"""Fast large-array allocation for the host assembly paths.

Under this environment's kernel, first-touch page faulting of fresh
anonymous memory runs at ~20-100 MB/s on a single core — a cold
``np.full`` of a 4 GB array takes minutes. Prefaulting the mapping in
one ``madvise(MADV_POPULATE_WRITE)`` syscall runs at ~2 GB/s (measured
25x faster), so every large output buffer (union event grids, unstacked
climatologies) goes through :func:`alloc_filled`.

The arrays are ordinary ``np.empty`` allocations (NOT private mmaps):
freed buffers return to the allocator and repeated pipeline calls reuse
warm pages at full speed — an earlier mmap-based version munmapped on
free and repaid the kernel page-supply cost on every detect() call.
"""

from __future__ import annotations

import ctypes

import numpy as np

# plain numpy below this size — the syscall isn't worth it
_SMALL = 1 << 22

_MADV_POPULATE_WRITE = 23  # linux 5.14+
_PAGE = 4096

try:
    _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.madvise.restype = ctypes.c_int
    _libc.madvise.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                              ctypes.c_int]
except OSError:  # non-glibc platform: plain numpy fallback
    _libc = None


def _prefault(arr: np.ndarray) -> None:
    if _libc is None:
        return
    addr = arr.ctypes.data
    start = addr & ~(_PAGE - 1)
    length = arr.nbytes + (addr - start)
    # best-effort: unsupported kernels return EINVAL and first-touch
    # faulting takes over
    _libc.madvise(ctypes.c_void_p(start), ctypes.c_size_t(length),
                  _MADV_POPULATE_WRITE)


def alloc_empty(shape, dtype) -> np.ndarray:
    """Uninitialized array with its pages prefaulted in one syscall."""
    out = np.empty(shape, dtype)
    if out.nbytes >= _SMALL:
        _prefault(out)
    return out


def alloc_filled(shape, fill, dtype) -> np.ndarray:
    """``np.full`` replacement: prefaulted pages + warm fill."""
    out = alloc_empty(shape, dtype)
    out.fill(fill)
    return out
