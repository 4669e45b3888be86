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

_COARSE = 1024


def searchsorted_2level(sorted_arr, queries):
    """int32 side="left" searchsorted: coarse binary search over
    1024-stride row heads + one contiguous [Q, 1024] row gather and
    compare-count.

    jnp.searchsorted lowers to a serial while loop of ~log2(N) gather
    rounds (~2.2 ms at N=590k/Q=16k, ~11 ms at N=3.1M/Q=39k on v5e);
    this halves the loop depth and turns the rest into dense VPU work.
    The answer lies in row b-1 (row b's head is the first element >= q).
    """
    C = _COARSE
    n = sorted_arr.shape[0]
    pad = -n % C
    if pad:
        sorted_arr = jnp.pad(
            sorted_arr, (0, pad),
            constant_values=jnp.iinfo(sorted_arr.dtype).max)
    rows = sorted_arr.reshape(-1, C)
    b = jnp.searchsorted(rows[:, 0], queries, side="left")
    rb = jnp.clip(b - 1, 0, rows.shape[0] - 1)
    win = rows[rb]                                          # [Q, C]
    within = jnp.sum((win < queries[:, None]).astype(jnp.int32), axis=1)
    return jnp.minimum(rb * C + within, n)


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
