"""Deterministic fixture generators (FIXTURES.md).

Everything derives from one seed; the reference's unseeded ``SecureRandom``
sampling makes its outputs non-reproducible (SURVEY.md §2.8.2), so golden
tests are only possible against a seeded re-generation. Values are
uppercase ASCII (charset pitfall, SURVEY.md §2.8.5).

The north-star input shape is the Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang) from BASELINE.json ``input_hint``; the two
linkage parties are slices of it. ``html`` embeds ``text`` so the
extractor invariant (byte-identical extracted text per url) is testable.
"""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SYLLABLES = [
    "BA", "BE", "BO", "DA", "DE", "DI", "FA", "KO", "LA", "LE", "MA", "ME",
    "MI", "NA", "NO", "PA", "PE", "RA", "RO", "SA", "SE", "TA", "TO", "VA", "ZO",
]


def make_vocab(n: int, syllables_per_word: int, seed: int) -> list[str]:
    combos = ["".join(c) for c in itertools.product(_SYLLABLES, repeat=syllables_per_word)]
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(combos))[:n]
    return [combos[i] for i in sorted(idx)]


def _perturb(word: str, rng: np.random.Generator) -> str:
    """One seeded character substitution (typo model for the B side)."""
    if len(word) < 2:
        return word
    i = int(rng.integers(0, len(word)))
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    repl = letters[int(rng.integers(0, 26))]
    return word[:i] + repl + word[i + 1 :]


def generate_party_records(
    n_per_party: int,
    overlap: float = 0.25,
    typo_rate: float = 0.05,
    seed: int = 42,
    null_rate: float = 0.0,
) -> pd.DataFrame:
    """Records for both parties: (id, surname, name, city, party).

    The first ``int(n*overlap)`` entities exist on BOTH sides (ground truth =
    equal ids, Simulator.java:62); B-side copies of shared entities get a
    seeded typo in one attribute with probability ``typo_rate``.
    """
    rng = np.random.default_rng(seed)
    surnames = np.array(make_vocab(600, 3, seed + 1))
    names = np.array(make_vocab(400, 2, seed + 2))
    cities = np.array(make_vocab(200, 2, seed + 3))

    n_overlap = int(n_per_party * overlap)
    n_entities = 2 * n_per_party - n_overlap
    ent_surname = surnames[rng.integers(0, len(surnames), n_entities)]
    ent_name = names[rng.integers(0, len(names), n_entities)]
    ent_city = cities[rng.integers(0, len(cities), n_entities)]
    ids = np.array([f"R{i:07d}" for i in range(n_entities)])

    a_idx = np.arange(0, n_per_party)
    b_idx = np.concatenate(
        [np.arange(0, n_overlap), np.arange(n_per_party, n_entities)]
    )

    rows = []
    for party, idxs in (("A", a_idx), ("B", b_idx)):
        sur = ent_surname[idxs].copy()
        nam = ent_name[idxs].copy()
        cit = ent_city[idxs].copy()
        if party == "B" and typo_rate > 0:
            shared = idxs < n_overlap
            hit = shared & (rng.random(len(idxs)) < typo_rate)
            for j in np.flatnonzero(hit):
                attr = int(rng.integers(0, 3))
                if attr == 0:
                    sur[j] = _perturb(sur[j], rng)
                elif attr == 1:
                    nam[j] = _perturb(nam[j], rng)
                else:
                    cit[j] = _perturb(cit[j], rng)
        pdf = pd.DataFrame(
            {
                "id": ids[idxs],
                "surname": sur,
                "name": nam,
                "city": cit,
                "party": party,
            }
        )
        rows.append(pdf)
    out = pd.concat(rows, ignore_index=True)
    if null_rate > 0:
        nulls = rng.random(len(out)) < null_rate
        for j in np.flatnonzero(nulls):
            out.iloc[j, 1 + int(rng.integers(0, 3))] = None
    return out


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def records_to_pages(records: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Wrap party records into the north-star pages shape.

    ``text`` is a pure function of the record (hence of the url) and ``html``
    embeds exactly ``text`` — the extractor must recover it byte-identically.
    """
    rng = np.random.default_rng(seed + 77)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    recs = records.fillna({"surname": "", "name": "", "city": ""})
    text = recs["surname"] + " " + recs["name"] + " " + recs["city"]
    url = (
        "http://"
        + recs["party"].str.lower()
        + ".example.org/page/"
        + recs["id"]
    )
    offsets = rng.integers(0, 365 * 24 * 3600, len(recs))
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": [base + dt.timedelta(seconds=int(o)) for o in offsets],
            "html": [
                ("<html><head></head><body>" + t + "</body></html>").encode("utf-8")
                for t in text
            ],
            "text": text,
            "lang": "en",
        }
    )


def generate_reference_sets(seed: int = 42) -> pd.DataFrame:
    """Public reference table (col1..col3) — the blocking vocabularies
    themselves (SQLData.java:46-51 loads an external public table; ours is
    the seeded vocabulary, which is public by construction)."""
    surnames = make_vocab(600, 3, seed + 1)
    names = make_vocab(400, 2, seed + 2)
    cities = make_vocab(200, 2, seed + 3)
    n = max(len(surnames), len(names), len(cities))

    def pad(v: list[str]) -> list:
        return v + [None] * (n - len(v))

    return pd.DataFrame({"col1": pad(surnames), "col2": pad(names), "col3": pad(cities)})


# 676 two-letter word prefixes: real-surname-like 2-char-prefix diversity.
# The reference's classifier keys records on the first
# NUM_OF_BINARY_SEARCH_CHARS(+1) = 2 characters (Conf.java:29,
# ReferenceSetBlocking.java:161-164), so the number of DISTINCT 2-char
# prefixes in the data bounds its class granularity — and with it the
# block count and the recall at scale. Syllable-only words have 25; voter
# rolls have hundreds; these words have up to 676.
_PREFIXES = [a + b for a in "ABCDEFGHIJKLMNOPQRSTUVWXYZ" for b in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"]


def word_space(n_syllables: int) -> int:
    """Number of distinct words of ``n_syllables`` components (one
    2-letter prefix + base-25 syllables)."""
    return 676 * 25 ** (n_syllables - 1)


def syllable_word(idx: int, n_syllables: int) -> str:
    """Word #idx: 2-letter prefix = idx % 676, then the big-endian
    base-25 digits of idx // 676 select syllables. Python twin of
    ``_word_expr`` — the two MUST stay in lockstep (pinned by a fixture
    test)."""
    parts = [_PREFIXES[idx % 676]]
    rest = idx // 676
    for k in range(n_syllables - 2, -1, -1):
        parts.append(_SYLLABLES[(rest // (25 ** k)) % 25])
    return "".join(parts)


def _word_expr(idx_col, n_syllables: int):
    """Catalyst twin of ``syllable_word`` over a bigint index column."""
    from pyspark.sql import functions as F

    syl = F.array(*[F.lit(s) for s in _SYLLABLES])
    pre = F.array(*[F.lit(p) for p in _PREFIXES])
    rest = F.floor(idx_col / F.lit(676)).cast("long")
    return F.concat(
        F.element_at(pre, F.pmod(idx_col, F.lit(676)).cast("int") + 1),
        *[
            F.element_at(
                syl,
                (
                    F.pmod(
                        F.floor(rest / F.lit(25 ** k)).cast("long"), F.lit(25)
                    ).cast("int")
                    + 1
                ),
            )
            for k in range(n_syllables - 2, -1, -1)
        ]
    )


def spark_party_records_distributed(
    spark: SparkSession,
    n_per_party: int,
    overlap: float = 0.25,
    typo_rate: float = 0.05,
    seed: int = 42,
    syllables: tuple[int, int, int] = (5, 5, 3),
    ref_sizes: tuple[int, int, int] = (100_000, 50_000, 15_000),
) -> tuple[DataFrame, DataFrame]:
    """DISTRIBUTED voter-roll-cardinality fixture for envelope-scale runs.

    ``generate_party_records`` is driver-side and its 600/400/200-word
    vocabularies are fine up to a few thousand records — beyond that
    many records share each name and the sorted-neighborhood window
    cannot cover the tie group (the true pair sits more than W positions
    apart; measured F1 0.03 at 800k/party with 600 surnames, and still
    0.09 with 100k surnames over 1.375M entities — ~14 records/name).
    The reference's own 800k experiments run on voter-roll names, which
    are nearly unique; this generator reproduces that regime with NO
    vocabulary table at all: attribute words are synthesized in pure
    Catalyst from the prefixed base-25 syllable space (surname/name
    default to 5 syllables = 676*25^4 ≈ 264M distinct words, city to
    3 = 676*25^2 = 422,500 — cities are
    genuinely low-cardinality and blocking only needs one diverse
    attribute to cover a pair), so name cardinality exceeds any entity
    count this sandbox can hold.

    Semantics match ``generate_party_records``: the first
    ``int(n*overlap)`` entities exist on both sides (ground truth = equal
    ids), B-side copies get a seeded one-char typo in one attribute with
    probability ``typo_rate``. Returns (records, reference_sets); the
    reference table is a seeded ``ref_sizes`` draw from the same word
    spaces (built with ``syllable_word``, the Python twin of the
    Catalyst synthesis).
    """
    from pyspark.sql import functions as F

    spaces = [word_space(s) for s in syllables]
    n_overlap = int(n_per_party * overlap)
    n_entities = 2 * n_per_party - n_overlap
    ent = spark.range(n_entities).select(
        F.col("id").alias("_eid"),
        *[
            _word_expr(
                F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 10 + i)), F.lit(spaces[i])),
                syllables[i],
            ).alias(attr)
            for i, attr in enumerate(("surname", "name", "city"))
        ],
    ).select(
        F.format_string("R%09d", F.col("_eid")).alias("id"),
        "_eid",
        "surname",
        "name",
        "city",
    )

    a = ent.where(F.col("_eid") < n_per_party).withColumn("party", F.lit("A"))
    b_base = ent.where(
        (F.col("_eid") < n_overlap) | (F.col("_eid") >= n_per_party)
    ).withColumn("party", F.lit("B"))

    # seeded typo on the B side of shared entities: pick the attribute and
    # the character position from id-derived hashes, substitute a letter —
    # pure Catalyst, no UDF, identical on every run/partitioning
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    u = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 20)), F.lit(1_000_000))
    hit = (F.col("_eid") < n_overlap) & (u < int(typo_rate * 1_000_000))
    which = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 21)), F.lit(3))

    def typo(col: str, attr_idx: int):
        s = F.col(col)
        pos = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 22)), F.length(s)) + 1
        ).cast("int")
        repl = F.lit(letters).substr(
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 23)), F.lit(26)) + 1).cast("int"),
            F.lit(1),
        )
        mutated = F.concat(
            s.substr(F.lit(1), pos - 1), repl, s.substr(pos + 1, F.length(s))
        )
        return F.when(hit & (which == attr_idx), mutated).otherwise(s)

    b = (
        b_base.withColumn("surname", typo("surname", 0))
        .withColumn("name", typo("name", 1))
        .withColumn("city", typo("city", 2))
    )
    records = a.unionByName(b).select("id", "surname", "name", "city", "party")

    rng = np.random.default_rng(seed + 99)
    ref_words = [
        sorted(
            syllable_word(int(i), syllables[k])
            for i in rng.choice(spaces[k], size=min(ref_sizes[k], spaces[k]), replace=False)
        )
        for k in range(3)
    ]
    n = max(len(v) for v in ref_words)
    ref = pd.DataFrame(
        {
            f"col{k+1}": ref_words[k] + [None] * (n - len(ref_words[k]))
            for k in range(3)
        }
    )
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in ("col1", "col2", "col3")]
    )
    return records, spark.createDataFrame(ref, schema=schema)


def spark_pages(spark: SparkSession, n_per_party: int, **kw) -> DataFrame:
    recs = generate_party_records(n_per_party, **kw)
    return spark.createDataFrame(records_to_pages(recs, seed=kw.get("seed", 42)), schema=PAGES_SCHEMA)


def spark_records(spark: SparkSession, n_per_party: int, **kw) -> DataFrame:
    return spark.createDataFrame(generate_party_records(n_per_party, **kw))


def spark_reference_sets(spark: SparkSession, seed: int = 42) -> DataFrame:
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in ("col1", "col2", "col3")]
    )
    return spark.createDataFrame(generate_reference_sets(seed), schema=schema)
