"""Sorted-neighborhood candidate generation (the reference's
``createPossibleMatches``,
/root/reference/src/main/java/com/algorithms/MetaBlocking.java:48-76).

Semantics. Within a block sorted ascending by score, element *i* scans its
predecessors with a window that STARTS at ``WINDOW_SIZE`` and grows by one
for every same-party element encountered (MetaBlocking.java:70-72). That
adaptive rule is exactly equivalent to: *pair each element with its
``WINDOW_SIZE - 1`` nearest PRECEDING opposite-party elements* (proof: the
scan continues while ``steps <= W + same_seen - 2``, and steps =
same_seen + opp_seen, so it stops once ``opp_seen = W - 1``).

That equivalence lets us implement it as a fully vectorized numpy kernel
inside ``applyInPandas`` (grouped by blockID) instead of a per-row Python
loop: for each element we take a contiguous slice of the opposite party's
position index. Blocks are bounded by the purge stage, so groups are small
and uniform — the groupBy(blockID) shuffle is the only data movement.

Pairs are emitted Alice-first (record1 = Alice id, record2 = Bob id,
MetaBlocking.java:64-68) and deduplicated across blocks
(``.distinct()``, MetaBlocking.java:35).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import PPRLConfig

_PAIR_SCHEMA = "record1 string, record2 string"


def _window_pairs_block(pdf: pd.DataFrame, w: int) -> pd.DataFrame:
    # total order (score, party, recordID) — deterministic stand-in for the
    # reference's stable Bob-first tiebreak (SURVEY.md §2.6)
    pdf = pdf.sort_values(["score", "party", "recordID"], kind="mergesort")
    party = (pdf["party"].to_numpy() == "A")
    ids = pdf["recordID"].to_numpy()
    n = len(ids)
    k = w - 1
    if n < 2 or k <= 0:
        return pd.DataFrame({"record1": [], "record2": []}, dtype=object)

    out_r1: list[np.ndarray] = []
    out_r2: list[np.ndarray] = []
    pos_a = np.flatnonzero(party)        # sorted positions of Alice elements
    pos_b = np.flatnonzero(~party)
    for cur_pos, opp_pos, cur_is_a in ((pos_a, pos_b, True), (pos_b, pos_a, False)):
        if len(cur_pos) == 0 or len(opp_pos) == 0:
            continue
        # for each current element, number of opposite elements strictly before
        cnt = np.searchsorted(opp_pos, cur_pos)
        take = np.minimum(cnt, k)
        total = int(take.sum())
        if total == 0:
            continue
        # flat indices into opp_pos: for element e, slice [cnt-take, cnt)
        starts = np.repeat(cnt - take, take)
        offs = np.arange(total) - np.repeat(np.cumsum(take) - take, take)
        opp_idx = opp_pos[starts + offs]
        cur_idx = np.repeat(cur_pos, take)
        if cur_is_a:
            out_r1.append(ids[cur_idx])
            out_r2.append(ids[opp_idx])
        else:
            out_r1.append(ids[opp_idx])
            out_r2.append(ids[cur_idx])
    if not out_r1:
        return pd.DataFrame({"record1": [], "record2": []}, dtype=object)
    return pd.DataFrame(
        {"record1": np.concatenate(out_r1), "record2": np.concatenate(out_r2)}
    )


def candidate_pairs(elements: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """(blockID, recordID, party, score) -> distinct (record1, record2).

    record1 is always the Alice id, record2 the Bob id.
    """
    w = cfg.window_size

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _window_pairs_block(pdf, w)

    pairs = elements.groupBy("blockID").applyInPandas(fn, schema=_PAIR_SCHEMA)
    return pairs.dropDuplicates(["record1", "record2"])
