"""String kernels: Levenshtein + the reference's prefix binary search,
including the clamp boundary cases of SURVEY.md §2.8.3."""

import numpy as np
import pytest

from scalable_blocking_for_privacy_preserving_record_linkage_spark.functions.strings import (
    levenshtein_batch,
    prefix_binary_search_batch,
)


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
        ("", "abc", 3),
        ("abc", "", 3),
        ("same", "same", 0),
        ("a", "b", 1),
        ("ab", "ba", 2),
        ("SATURDAY", "SUNDAY", 3),
    ],
)
def test_levenshtein_known(a, b, d):
    assert levenshtein_batch([a], [b])[0] == d


def test_levenshtein_batch_mixed_lengths():
    a = ["", "X", "LONGERSTRING", "AB"]
    b = ["ZZ", "X", "LONG", "BA"]
    assert list(levenshtein_batch(a, b)) == [2, 0, 8, 2]


def _java_binary_search(arr, x, nsc, rs_size):
    """Direct transliteration of BinarySearch.java:6-37 (test oracle)."""

    def rec(low, high):
        if high >= low:
            mid = low + (high - low) // 2
            if arr[mid][:nsc] == x[:nsc]:
                return mid
            if x[:nsc] > arr[mid][:nsc]:
                return rec(mid + 1, high)
            return rec(low, mid - 1)
        if high < 0:
            return high + 1
        if high > rs_size - 1:
            return high - 1
        return high

    return rec(0, len(arr) - 1)


def test_binary_search_matches_java_semantics():
    samples = np.array(sorted(["ANNA", "ANTON", "BETH", "CARL", "CAREN", "DORA", "EMMA", "FRED"]))
    queries = ["CARL", "AAAA", "ZZZZ", "DANA", "B", "ANNIKA", "CA", "EM", "F"]
    got = prefix_binary_search_batch(np.array(samples), np.array(queries, dtype=object), 1, len(samples))
    for q, g in zip(queries, got):
        nsc = 2 if len(q) > 1 else 1
        expected = _java_binary_search(list(samples), q, nsc, len(samples))
        assert g == expected, (q, g, expected)


def test_binary_search_clamps():
    samples = np.array(["BB", "CC", "DD"])
    # below the first element -> clamp to 0 (BinarySearch.java:34)
    assert prefix_binary_search_batch(samples, np.array(["AA"], dtype=object), 1, 3)[0] == 0
    # above the last -> high (== n-1)
    assert prefix_binary_search_batch(samples, np.array(["ZZ"], dtype=object), 1, 3)[0] == 2
