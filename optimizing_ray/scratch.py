"""Grow-only per-process scratch arenas for hot batch kernels.

First-touch of FRESH pages on this VM pays a hypervisor page-
provisioning wall — documented ~0.5 GB/s in calm periods and measured
as low as **15 MB/s during episodes** (a fresh 12 MB `astype` took
0.93 s while the same ops on reused pages took 9 ms).  Ray worker
processes are long-lived, so kernels that need large temporaries
should allocate them ONCE per process and reuse: this module hands out
uninitialized views of persistent per-key buffers.

Contract: the view returned for a key is valid until the NEXT request
for the same key — callers must consume (copy/reduce) it before
re-entering the producing kernel.  Keys are namespaced per call site.
"""

from __future__ import annotations

import numpy as np

_ARENAS: dict[tuple, np.ndarray] = {}


def get(key: str, n: int, dtype=np.uint64) -> np.ndarray:
    """Uninitialized length-n view of the persistent buffer for (key,
    dtype); grows geometrically (the growth pays the fault wall once)."""
    k = (key, np.dtype(dtype).str)
    buf = _ARENAS.get(k)
    if buf is None or len(buf) < n:
        cap = n if buf is None else max(n, 2 * len(buf))
        buf = np.empty(cap, dtype=dtype)
        _ARENAS[k] = buf
    return buf[:n]
