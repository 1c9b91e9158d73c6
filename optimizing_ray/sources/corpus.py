"""Synthetic corpus as a Ray Dataset source.

The reference regenerates its corpus per run on the driver
(``main.cpp:24-33``, ``.Test/QuadTree.cpp:351-365``); at engine scale the
generation itself must be distributed: ``ray.data.range(n)`` provides the
global row indices in blocks, and a zero-copy ``map_batches`` turns each
index block into corpus rows.  Because every value derives from the row
index via a counter-based hash (synth.py), the corpus is identical for
any block split, retry, or parallelism level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray import synth
from optimizing_ray.config import World


def synthetic_documents(n: int, *, variant: str = "flat2d",
                        world: World | None = None, seed: int = 0,
                        with_spans: bool = True,
                        override_num_blocks: int | None = None) -> rd.Dataset:
    """Distributed deterministic corpus of `n` interleaved documents."""

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy().astype(np.int64)
        return synth.documents_batch(idx, variant=variant, world=world,
                                     seed=seed, with_spans=with_spans)

    base = rd.range(n, override_num_blocks=override_num_blocks)
    return base.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
