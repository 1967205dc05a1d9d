"""Dedup-family unit tests: simhash recall guarantee, stop-gram capping
exactness, MinHash bucket purge. (The driver contract additionally
value-checks each of these against DuckDB oracles at sf0.01.)"""

import itertools

import pytest
from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    texts = [base]
    # token-level perturbations at growing distance from the base
    toks = base.split()
    for i in range(1, 12):
        t = list(toks)
        for j in range(i):
            t[(3 * j) % len(t)] = f"tok{i}x{j}"
        texts.append(" ".join(t))
    texts += ["completely different content about spark and parquet files"] * 2
    texts += ["", "   "]
    return _docs(spark, texts)


def test_simhash_banding_equals_brute_force(spark, near_dup_docs):
    """For max_hamming < num_chunks the banded join must return EXACTLY
    the brute-force hamming pair set (pigeonhole guarantee)."""
    sims = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_table(near_dup_docs).collect()
    }
    for mh, chunks in ((3, 4), (7, 8)):
        got = {
            (r["id1"], r["id2"])
            for r in dedup.simhash_near_pairs(
                near_dup_docs, max_hamming=mh, num_chunks=chunks
            ).collect()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sims), 2)
            if bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1") <= mh
        }
        assert got == want, f"mh={mh} chunks={chunks}"


def test_simhash_partial_recall_requires_opt_in(spark, near_dup_docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_pairs(near_dup_docs, max_hamming=16, num_chunks=4)
    # opted in: runs, and is a subset of brute force
    dedup.simhash_near_pairs(
        near_dup_docs, max_hamming=16, num_chunks=4, allow_partial_recall=True
    ).collect()


def test_ngram_jaccard_df_cap_exactness(spark, near_dup_docs):
    """Capped run must report IDENTICAL jaccard values for every pair it
    returns, and only drop pairs that share no rare gram."""
    uncapped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(near_dup_docs, q=3, threshold=0.1).collect()
    }
    capped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            near_dup_docs, q=3, threshold=0.1, df_cap=10
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    for pair, j in capped.items():
        assert j == uncapped[pair], pair
    # a generous cap binds nothing: exact equality
    loose = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            near_dup_docs, q=3, threshold=0.1, df_cap=10_000
        ).collect()
    }
    assert loose == uncapped


def test_minhash_bucket_cap_purges_hot_bucket(spark):
    """30 identical docs form one hot bucket per band; a cap below 30
    must drop all their pairs while distinct near-dups survive."""
    texts = ["boilerplate cookie banner text repeated everywhere"] * 30
    texts += [
        "unique article about rivers and mountains in the north",
        "unique article about rivers and mountains in the south",
    ]
    docs = _docs(spark, texts)
    uncapped = dedup.minhash_lsh_pairs(docs, num_hashes=8, num_bands=4, shingle_q=5)
    capped = dedup.minhash_lsh_pairs(
        docs, num_hashes=8, num_bands=4, shingle_q=5, max_bucket_size=10
    )
    n_unc = uncapped.count()
    assert n_unc >= 30 * 29 / 2
    got = {(r["id1"], r["id2"]) for r in capped.collect()}
    assert (30, 31) in got  # the near-dup pair survives
    assert all(a >= 30 for a, _ in got)  # every boilerplate pair is purged


def test_minhash_lsh_pairs_unaffected_by_loose_cap(spark, near_dup_docs):
    base = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(near_dup_docs).collect()
    }
    loose = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(near_dup_docs, max_bucket_size=10_000).collect()
    }
    assert base == loose


def test_canonical_docs_transitive_chain(spark):
    """a~b and b~c near-dup (but a~c not a candidate pair on its own) must
    land in ONE cluster with min doc_id canonical; unrelated docs and
    too-short docs stay singletons."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    toks = base.split()
    b = list(toks); b[2] = "xray"
    c = list(b); c[8] = "yankee"
    texts = [
        base,                      # 0: cluster head
        " ".join(b),               # 1: near-dup of 0
        " ".join(c),               # 2: near-dup of 1 (transitively of 0)
        "totally different words about warehouses and parquet row groups",  # 3
        base,                      # 4: exact dup of 0
        "abc",                     # 5: shorter than shingle_q -> singleton
    ]
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dedup.canonical_docs(
            _docs(spark, texts), verify_threshold=0.5
        ).collect()
    }
    assert len(out) == 6  # one row per input doc, short one included
    assert out[0] == (0, 4, 1)
    assert out[1] == (0, 4, 0)
    assert out[2] == (0, 4, 0)
    assert out[4] == (0, 4, 0)
    assert out[3] == (3, 1, 1)
    assert out[5] == (5, 1, 1)


def test_canonical_docs_verify_blocks_low_jaccard_edges(spark):
    """Without the verify step LSH banding may link weakly-similar docs;
    with a high threshold those edges must be dropped."""
    texts = [
        "one two three four five six seven eight nine ten eleven twelve",
        "one two three four five xxxx yyyy zzzz wwww vvvv uuuu tttt",
    ]
    strict = dedup.canonical_docs(_docs(spark, texts), verify_threshold=0.9)
    assert {r["cluster_id"] for r in strict.collect()} == {0, 1}


def test_minhash_lsh_recall_vs_brute_force(spark):
    """Empirical recall of the driver's banding (32 hashes / 8 bands, r=4)
    against brute-force distinct-5-gram Jaccard at the 0.8 verify
    threshold: expected per-pair candidate probability 1-(1-s^4)^8 >= 0.98
    at s=0.8, so over a 60-pair truth set recall must clear 0.9."""
    import itertools

    base = ("web scale corpora hold countless boilerplate pages that reuse "
            "the same navigation header footer and legal text across hosts")
    texts = []
    for i in range(60):
        toks = base.split()
        # one token swapped -> very high Jaccard near-dup of the base
        toks[i % len(toks)] = f"mut{i}"
        texts.append(" ".join(toks))
    docs = _docs(spark, texts)

    def gram_set(t, q=5):
        return {t[i:i + q] for i in range(len(t) - q + 1)}

    gs = {i: gram_set(t) for i, t in enumerate(texts)}
    truth = {
        (a, b)
        for a, b in itertools.combinations(range(len(texts)), 2)
        if len(gs[a] & gs[b]) / len(gs[a] | gs[b]) >= 0.8
    }
    assert len(truth) >= 60  # fixture actually stresses the claim
    got = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=32, num_bands=8, shingle_q=5
        ).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(truth)} true pairs"


def test_line_dedup_removes_shared_lines_keeps_order_and_blanks(spark):
    """A trimmed non-blank line in >= min_docs distinct docs is removed
    everywhere; blanks and rare lines survive; original line order and
    raw (untrimmed) text are preserved; an all-boilerplate doc empties."""
    rows = [
        (1, "NAV\nalpha content\n\nNAV\nfooter one"),
        (2, "NAV\nbeta content\nNAV"),
        (3, "NAV\ngamma content\n  NAV  \nfooter one"),
        (4, "delta only\n\n"),
        (5, "NAV"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.line_dedup(df, min_docs=3).collect()
    }
    # NAV appears (trimmed) in docs 1,2,3,5 -> removed; "footer one" in
    # only 2 docs -> kept; doc-internal duplicates count once per doc
    assert out[1]["clean_text"] == "alpha content\n\nfooter one"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (5, 2)
    assert out[2]["clean_text"] == "beta content"
    assert out[3]["clean_text"] == "gamma content\nfooter one"
    # trailing blank lines are kept verbatim (never counted as shared)
    assert out[4]["clean_text"] == "delta only\n\n"
    assert out[4]["n_removed"] == 0
    # all-boilerplate doc -> empty text, full removal accounted
    assert out[5]["clean_text"] == ""
    assert (out[5]["n_lines"], out[5]["n_removed"]) == (1, 1)


def test_line_dedup_min_docs_boundary_and_partition_invariance(spark):
    """min_docs is a >= threshold on DISTINCT docs; results are identical
    under different input partitionings (order-fixed reconstruction)."""
    rows = [(i, f"shared two\nunique {i}") for i in range(2)] + [
        (10 + i, f"shared three\nunique {10 + i}") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.line_dedup(df, min_docs=3).collect()}
    assert out[0]["clean_text"] == "shared two\nunique 0"  # 2 docs < 3 -> kept
    assert out[10]["clean_text"] == "unique 10"  # 3 docs -> removed
    a = sorted(map(tuple, dedup.line_dedup(df.repartition(1), min_docs=3).collect()))
    b = sorted(map(tuple, dedup.line_dedup(df.repartition(7), min_docs=3).collect()))
    assert a == b


def test_line_dedup_identity_when_nothing_shared(spark):
    """With no cross-document line sharing the pass is a byte-identical
    identity (clean_text == text, n_removed == 0) — reconstruction must
    preserve every line, blank or not, in order."""
    texts = [
        "one alpha\n\n  indented beta  \ngamma one",
        "two delta\nepsilon two",
        "\n\nthree zeta\n",
        "four eta",
    ]
    df = _docs(spark, texts)
    out = {r["doc_id"]: r for r in dedup.line_dedup(df, min_docs=2).collect()}
    for i, t in enumerate(texts):
        assert out[i]["clean_text"] == t
        assert out[i]["n_removed"] == 0
        assert out[i]["n_lines"] == len(t.split("\n"))


def test_line_dedup_min_docs_one_removes_every_nonblank_line(spark):
    """min_docs=1 is the degenerate bound: every non-blank line is its
    own boilerplate, so only blanks survive."""
    df = _docs(spark, ["a\n\nb", "c"])
    out = {r["doc_id"]: r for r in dedup.line_dedup(df, min_docs=1).collect()}
    assert out[0]["clean_text"] == ""  # 'a', 'b' removed; blank kept
    assert out[0]["n_removed"] == 2 and out[0]["n_lines"] == 3
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1


def test_line_dedup_null_text_drops_row(spark):
    """NULL-text docs are dropped (documented contract): the hygiene
    pass emits output rows only for docs with a (possibly empty) page."""
    df = spark.createDataFrame([(1, "a\nb"), (2, None)], "doc_id long, text string")
    got = {r["doc_id"] for r in dedup.line_dedup(df, min_docs=3).collect()}
    assert got == {1}
