"""Webtext operators: URL canonicalization/dedup and repetition signals."""

from pyspark.sql import functions as F

from scalable_blocking_for_privacy_preserving_record_linkage_spark.functions import (
    text as tx,
)
from scalable_blocking_for_privacy_preserving_record_linkage_spark.sources import (
    extract,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(extract.canonical_url_expr(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_variants_collapse(spark):
    variants = [
        "http://example.org/a",
        "HTTP://WWW.Example.ORG/a",
        "http://example.org:80/a",
        "http://example.org/a/",
        "http://example.org/a#frag",
        "http://example.org/a?utm_source=x&utm_medium=y",
    ]
    assert set(_canon(spark, variants)) == {"http://example.org/a"}


def test_canonical_url_preserves_real_params_and_order(spark):
    got = _canon(
        spark,
        [
            "https://shop.example.com:443/item?b=2&utm_campaign=sale&a=1",
            "https://shop.example.com/item?b=2&a=1#reviews",
            "https://shop.example.com/item?a=1&b=2",
        ],
    )
    assert got[0] == got[1] == "https://shop.example.com/item?b=2&a=1"
    # param ORDER is preserved, not sorted: a=1&b=2 stays distinct
    assert got[2] == "https://shop.example.com/item?a=1&b=2"


def test_canonical_url_no_scheme_passthrough(spark):
    assert _canon(spark, ["not a url", "/relative/path"]) == [
        "not a url",
        "/relative/path",
    ]


def test_dedup_pages_by_url_keeps_first_crawl(spark):
    rows = [
        ("http://a.org/p", "2024-01-02 00:00:00"),
        ("http://www.a.org/p/", "2024-01-01 00:00:00"),
        ("http://a.org/p?utm_source=rss", "2024-01-03 00:00:00"),
        ("http://a.org/q?id=1", "2024-01-01 00:00:00"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts string").withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    )
    out = {
        r.url_canonical: (r.n_raw, str(r.first_ts))
        for r in extract.dedup_pages_by_url(pages).collect()
    }
    assert out == {
        "http://a.org/p": (3, "2024-01-01 00:00:00"),
        "http://a.org/q?id=1": (1, "2024-01-01 00:00:00"),
    }


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),               # all bigrams distinct
            (1, "buy now buy now buy now"),              # 'buy now' dominates
            (2, "x"),                                     # < 2 tokens
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id",
            F.round(tx.top_bigram_fraction_expr(F.col("text")), 4).alias("f"),
        ).collect()
    }
    assert got[0] == 0.2  # 5 bigrams, each once... except 'the' repeats -> max 1/5
    assert got[1] == 0.6  # 'buy now' 3 of 5
    assert got[2] == 0.0 and got[3] == 0.0


def test_dup_line_fraction(spark):
    text = "nav | bar\nreal content here\n\n   \nnav | bar\nfooter"
    df = spark.createDataFrame([(text,), ("",), ("one line",)], "t string")
    got = [
        r.f
        for r in df.select(
            F.round(tx.dup_line_fraction_expr(F.col("t")), 4).alias("f")
        ).collect()
    ]
    # 4 non-blank lines, one duplicated -> 1/4; blanks ignored
    assert got == [0.25, 0.0, 0.0]


def test_canonical_url_idempotent(spark):
    urls = [
        "http://example.org/a",
        "HTTPS://WWW.Shop.Example.COM:443/x/?b=2&utm_s=1#f",
        "http://example.org:80/deep/path/?utm_source=x",
        "not a url",
        "http://h.org/p?a=1&b=2&c=3",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_bpe_token_count(spark):
    cases = {
        0: ("Hello, world! It's 42.", 8),  # Hello , world ! It 's 42 .
        1: ("", 0),
        2: ("   ", 0),
        3: ("don't can't", 4),  # don 't can 't
        4: ("abc123", 2),  # letter run + digit run
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _) in cases.items()], "i long, t string"
    )
    got = {
        r.i: r.n
        for r in df.select(
            "i", tx.bpe_token_count_expr(F.col("t")).alias("n")
        ).collect()
    }
    assert got == {k: v for k, (_, v) in cases.items()}


def test_nfc_normalize_and_control_scrub(spark):
    """NFC composes decomposed sequences (e + U+0301 -> é), is identity
    on ASCII and on already-composed text, and the control scrub drops
    C0/DEL but keeps the tokenizer's whitespace (\\t \\n \\x0B \\f \\r)."""
    rows = [
        (0, "cafe\u0301"),     # decomposed -> composed (explicit escape)
        (1, "caf\u00e9"),      # already composed -> unchanged
        (2, "plain ascii"),
        (3, "a\x00b\x07c\x7fd"),    # controls scrubbed
        (4, "tab\there\nline\x0b\f\r end"),  # whitespace kept
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r.i: r.n
        for r in df.select(
            "i",
            tx.nfc_normalize_udf()(tx.scrub_control_chars_expr(F.col("t"))).alias("n"),
        ).collect()
    }
    assert out[0] == "caf\u00e9" and len(out[0]) == 4
    assert out[1] == "caf\u00e9"
    assert out[2] == "plain ascii"
    assert out[3] == "abcd"
    assert out[4] == "tab\there\nline\x0b\f\r end"


def test_gopher_signals_edges(spark):
    """Gopher signals: exact fractions on a constructed page, zeros on
    empty input, ellipsis/bullet detection tolerant of edge whitespace."""
    page = "- bullet\nplain words here\nmore...\n…\n12345 end"
    rows = [(0, page), (1, ""), (2, "   ")]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r.i: r.g.asDict()
        for r in df.select("i", tx.gopher_signals_expr(F.col("t")).alias("g")).collect()
    }
    g = out[0]
    # 9 words: - bullet plain words here more... … 12345 end
    assert g["frac_alpha_words"] == round(6 / 9, 4)
    assert g["sym_ratio"] == round(2 / 9, 4)  # one '...' + one '…'
    # 5 lines: bullet line 1; ellipsis lines 'more...' and '…'
    assert g["frac_bullet_lines"] == round(1 / 5, 4)
    assert g["frac_ellipsis_lines"] == round(2 / 5, 4)
    for k, v in out[1].items():
        assert v == 0.0, (k, v)
    for k, v in out[2].items():
        # whitespace-only: zero words; the single line is no bullet/ellipsis
        assert v == 0.0, (k, v)
