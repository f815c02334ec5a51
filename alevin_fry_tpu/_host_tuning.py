"""Host allocator tuning for lazily-paged / virtualized hosts.

The pipeline is built on large short-lived NumPy arrays.  glibc serves
allocations above the mmap threshold with fresh ``mmap`` regions and
returns them to the kernel on free, so every new array re-faults all of
its pages.  On bare metal a minor fault costs ~1 us, but on hosts with
lazily-provisioned memory (VM snapshots resumed with userfaultfd,
ballooned guests, overcommitted hypervisors) each first-touch fault can
take ~100 us — making `np.arange(10_000_000)` take seconds and pushing
whole pipeline runs to >90% kernel time.

Keeping allocations on the brk heap and never trimming means each page
is faulted once per process and then reused; measured end-to-end this is
a >10x wall-clock difference on such hosts and is performance-neutral on
normal ones (batch tools don't need to return memory mid-run).

Set ``AFT_NO_MALLOC_TUNE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_applied = False


def apply() -> bool:
    """Apply allocator tuning once per process. Returns True if applied."""
    global _applied
    if _applied or os.environ.get("AFT_NO_MALLOC_TUNE"):
        return _applied
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_MAX, 0)
        libc.mallopt(_M_TRIM_THRESHOLD, 0x7FFFFFFF)
        libc.mallopt(_M_MMAP_THRESHOLD, 0x7FFFFFFF)
        _applied = True
    except (OSError, AttributeError):
        pass
    return _applied
