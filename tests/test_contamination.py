"""PII scrub + benchmark-decontamination operators."""

from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.functions import (
    text as tx,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.operators import (
    contamination,
)


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(
        [
            ("mail a@b.org and c.d+x@e.co.uk twice",),
            ("call 555-867-5309 or 555 123 4567",),
            ("ping 10.0.0.1 not 1234.5.6.7",),
            ("clean text only",),
        ],
        "t string",
    )
    rows = df.select(
        tx.pii_counts_expr(F.col("t")).alias("c"),
        tx.scrub_pii_expr(F.col("t")).alias("s"),
    ).collect()
    assert [r.c.n_emails for r in rows] == [2, 0, 0, 0]
    assert [r.c.n_phones for r in rows] == [0, 2, 0, 0]
    # 1234.5.6.7 never matches: no word boundary inside the digit run,
    # so an octet cannot start mid-number
    assert [r.c.n_ips for r in rows] == [0, 0, 1, 0]
    assert rows[0].s == "mail <EMAIL> and <EMAIL> twice"
    assert rows[1].s == "call <PHONE> or <PHONE>"
    assert rows[2].s == "ping <IP> not 1234.5.6.7"
    assert rows[3].s == "clean text only"


def test_ngram_contamination_flags_only_leaked(spark):
    canary = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14"
    bench = spark.createDataFrame([(100, "bench doc body " + canary)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"),
            (2, "intro words here " + canary),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.total_grams, r.n_hits, r.contaminated)
        for r in contamination.ngram_contamination(corpus, bench, n=13).collect()
    }
    assert out[1] == (3, 0, 0)       # 15 tokens -> 3 grams, no overlap
    # doc 2: 17 tokens -> 5 grams; pure-canary grams = 14-13+1 = 2
    assert out[2][1] == 2 and out[2][2] == 1
    assert out[3] == (0, 0, 0)       # shorter than one 13-gram
    assert set(out) == {1, 2, 3}     # every corpus doc reported


def test_contamination_min_hits_threshold(spark):
    canary = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13"
    bench = spark.createDataFrame([(9, canary)], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "x1 x2 x3 " + canary)], "doc_id long, text string")
    strict = contamination.ngram_contamination(corpus, bench, n=13, min_hits=2)
    assert strict.collect()[0].contaminated == 0  # only 1 shared gram
