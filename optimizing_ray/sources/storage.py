"""Storage seam: Parquet now, Lance when available (SURVEY.md §7.0).

The engine's storage contract is narrow on purpose — read a table into a
``ray.data.Dataset`` with column pruning + row filters, and write a
Dataset partitioned by a key column so runs are resumable per partition
(the Ray-native analogue of the reference's one-octree-per-grid-cell
layout, ``WorldPartition.hpp:241``).
"""

from __future__ import annotations

import os
from typing import Any

import ray.data as rd

try:  # pragma: no cover - lance is not installed in this environment
    import lance  # type: ignore  # noqa: F401
    HAVE_LANCE = True
except Exception:  # pragma: no cover
    HAVE_LANCE = False


def read_table(path: str, *, columns: list[str] | None = None,
               filter: Any | None = None, **kwargs) -> rd.Dataset:
    """Read a Parquet (or, when available, Lance) table as a Dataset.

    Always pass ``columns`` in pipelines — pruning at the read is the
    first scale rule (a read that loads all columns for a 2-column
    transform ships 100 TB where 2 TB would do).
    """
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return rd.read_lance(path, columns=columns, **kwargs)  # pragma: no cover
    return rd.read_parquet(path, columns=columns, filter=filter, **kwargs)


def write_partitioned(ds: rd.Dataset, out_dir: str, *, min_rows_per_file: int = 500_000) -> None:
    """Write a Dataset as a directory of Parquet part files (never one giant
    file). For key-partitioned resumable output use
    ``optimizing_ray.state.manifest.resumable_write`` instead."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
