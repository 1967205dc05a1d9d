"""Batched string kernels: Levenshtein distance and the reference's
prefix binary search, both vectorized across a numpy batch (no per-row
Python in pandas-UDF hot paths beyond O(unique-values)).

Reference semantics reproduced exactly:
* prefix binary search with its not-found clamps
  (/root/reference/src/main/java/com/utils/BinarySearch.java:6-37) — note it
  returns the FIRST probed mid whose prefix matches (not the leftmost match),
  so we simulate the identical search path rather than using
  ``np.searchsorted``;
* unit-cost Levenshtein (commons-text default,
  /root/reference/src/main/java/com/algorithms/ReferenceSetBlocking.java:170-173).
"""

from __future__ import annotations

import numpy as np


def levenshtein_batch(a_list, b_list) -> np.ndarray:
    """Unit-cost Levenshtein for aligned string arrays, DP vectorized over
    the batch axis (inner loops are O(maxlen^2) *vector* ops, not per-row)."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    a_arr = np.asarray(a_list, dtype=object)
    b_arr = np.asarray(b_list, dtype=object)
    la = np.array([len(s) for s in a_arr], dtype=np.int64)
    lb = np.array([len(s) for s in b_arr], dtype=np.int64)
    maxa = int(la.max()) if n else 0
    maxb = int(lb.max()) if n else 0
    ans = np.zeros(n, dtype=np.int64)
    if maxa == 0:
        return lb.copy()
    if maxb == 0:
        return la.copy()
    # zero-padded code-point matrices via numpy's fixed-width unicode view
    A = np.array(a_arr, dtype=f"U{maxa}").view(np.uint32).reshape(n, maxa)
    B = np.array(b_arr, dtype=f"U{maxb}").view(np.uint32).reshape(n, maxb)

    prev = np.broadcast_to(np.arange(maxb + 1, dtype=np.int64), (n, maxb + 1)).copy()
    ans[la == 0] = lb[la == 0]
    for i in range(1, maxa + 1):
        cur = np.empty((n, maxb + 1), dtype=np.int64)
        cur[:, 0] = i
        sub = (A[:, i - 1 : i] != B).astype(np.int64)  # (n, maxb)
        for j in range(1, maxb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub[:, j - 1],
            )
        hit = la == i
        if hit.any():
            ans[hit] = cur[hit, lb[hit]]
        prev = cur
    return ans


def prefix_binary_search_batch(
    samples_sorted: np.ndarray,
    queries: np.ndarray,
    num_search_chars_base: int,
    rs_size: int,
) -> np.ndarray:
    """Replicates BinarySearch.binarySearch for a batch of queries.

    Prefix length is ``num_search_chars_base + 1`` when the QUERY has length
    > 1 else ``num_search_chars_base`` (ReferenceSetBlocking.java:161-164);
    the same prefix length is applied to the probed sample. Not-found clamps:
    ``high < 0 -> 0``, ``high > rs_size-1 -> high-1``, else ``high``
    (BinarySearch.java:34-36).
    """
    m = len(queries)
    pos = np.zeros(m, dtype=np.int64)
    qlen = np.array([len(q) for q in queries], dtype=np.int64)
    for nsc, mask in (
        (num_search_chars_base, qlen <= 1),
        (num_search_chars_base + 1, qlen > 1),
    ):
        if not mask.any():
            continue
        sp = np.asarray(samples_sorted, dtype=f"U{nsc}")  # truncated prefixes
        qp = np.asarray(queries[mask], dtype=f"U{nsc}")
        pos[mask] = _binary_search_prefix(sp, qp, rs_size)
    return pos


def _binary_search_prefix(sample_prefixes: np.ndarray, q_prefixes: np.ndarray, rs_size: int) -> np.ndarray:
    n = len(sample_prefixes)
    m = len(q_prefixes)
    low = np.zeros(m, dtype=np.int64)
    high = np.full(m, n - 1, dtype=np.int64)
    pos = np.zeros(m, dtype=np.int64)
    done = np.zeros(m, dtype=bool)
    while True:
        act = ~done
        term = act & (high < low)
        if term.any():
            p = high[term]
            p = np.where(p < 0, p + 1, np.where(p > rs_size - 1, p - 1, p))
            pos[term] = p
            done[term] = True
            act = ~done
        if not act.any():
            break
        idx = np.flatnonzero(act)
        mid = low[idx] + (high[idx] - low[idx]) // 2
        sp = sample_prefixes[mid]
        qp = q_prefixes[idx]
        eq = sp == qp
        gt = qp > sp
        pos[idx[eq]] = mid[eq]
        done[idx[eq]] = True
        go_right = gt & ~eq
        go_left = ~gt & ~eq
        low[idx[go_right]] = mid[go_right] + 1
        high[idx[go_left]] = mid[go_left] - 1
    return pos
