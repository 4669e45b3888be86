"""Ragged-expansion primitives shared by grid builds and work schedulers.

The recurring pattern in this framework is expanding a ragged list (CSR
counts/offsets) into a dense, statically-sized work array: "position p of
the expansion belongs to segment f".  That is mathematically
``searchsorted(inclusive_scan, p, side='right')`` — but on TPU a
binary search is log2(F) *sequential gather passes* over every query and
measures ~45 ms at flagship sizes, while the whole radix sort is 9 ms.

Since the queries are always ``arange(capacity)`` (dense positions), the
same result is one scatter-add + one cumsum, both O(capacity) and
TPU-friendly:

    ids[p] = (# of segment starts <= p) - 1 = max{f : starts[f] <= p}

which equals ``clip(searchsorted(incl, p, 'right'), 0, F-1)`` for every
in-range position (p < total); out-of-range positions yield F-1 and are
masked by the caller's ``p < total`` validity test, exactly as the
clipped searchsorted result was.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_ids_from_starts(starts, capacity: int):
    """Dense segment ids for positions arange(capacity).

    starts: [F] int32 ascending segment start offsets (an exclusive scan
    of segment lengths; zero-length segments repeat the next start).
    Returns [capacity] int32: for each position p, the segment owning it
    — max{f : starts[f] <= p}.  Positions past the last segment's end
    return F-1 (callers mask with their own validity predicate).
    """
    hist = jnp.zeros((capacity,), jnp.int32).at[starts].add(
        1, mode="drop")
    return jnp.cumsum(hist) - 1
