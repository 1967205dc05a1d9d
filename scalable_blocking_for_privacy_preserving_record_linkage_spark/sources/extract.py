"""Pages -> party records extraction (pure Catalyst, no UDFs).

The north-star input is the pages table (url, warc_ts, html, text, lang);
the reference's equivalent is the positional CSV projection + null-filter
(/root/reference/src/main/java/com/database/SQLData.java:23-29,53-62). The
extractor here is the deterministic per-url text derivation the input hint
demands: ``extract_text(html)`` must equal the stored ``text`` column
byte-for-byte (asserted in tests).

Normalization uppercases BOTH reference values and record values — the
reference uppercases only its reference set (case asymmetry,
ReferenceSetBlocking.java:35 vs :166-173; SURVEY.md §2.8.4). Fixtures are
generated uppercase so golden parity holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import PPRLConfig

_BODY_RE = r"(?s)<body>(.*?)</body>"


def extract_text(html_col: Column) -> Column:
    """binary html -> extracted text (deterministic per url)."""
    return F.regexp_extract(html_col.cast("string"), _BODY_RE, 1)


def records_from_pages(pages: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """pages -> (id, surname, name, city, party), normalized + null-dropped.

    Party comes from the url host, id from the url path; the three blocking
    attributes are whitespace tokens of the extracted text. The null-filter
    reproduces SQLData.java:59-61 (drop rows with any null/empty blocking
    attribute).
    """
    if cfg.sample_fraction is not None:
        # load-time fractional sample (SQLData.java:21-27, dormant there;
        # live + seeded here). Sampling BEFORE projection/extraction keeps
        # the skipped rows out of every downstream expression.
        pages = pages.sample(fraction=cfg.sample_fraction, seed=cfg.seed)
    txt = extract_text(F.col("html"))
    toks = F.split(F.trim(txt), r"\s+")
    df = pages.select(
        F.regexp_extract("url", r"/page/([^/]+)$", 1).alias(cfg.id_col),
        F.upper(F.regexp_extract("url", r"^https?://([a-zA-Z])\.", 1)).alias("party"),
        *[
            F.upper(F.trim(F.element_at(toks, i + 1))).alias(attr)
            for i, attr in enumerate(cfg.blocking_attrs)
        ],
    )
    cond = None
    for attr in cfg.blocking_attrs:
        c = F.col(attr).isNotNull() & (F.length(attr) > 0)
        cond = c if cond is None else (cond & c)
    return df.where(cond)


def normalize_records(records: DataFrame, cfg: PPRLConfig) -> DataFrame:
    """Records already in party shape: normalize + null-drop (P1/P2)."""
    df = records.select(
        F.col(cfg.id_col).cast("string").alias(cfg.id_col),
        F.col("party").cast("string").alias("party"),
        *[F.upper(F.trim(F.col(a))).alias(a) for a in cfg.blocking_attrs],
    )
    cond = None
    for attr in cfg.blocking_attrs:
        c = F.col(attr).isNotNull() & (F.length(attr) > 0)
        cond = c if cond is None else (cond & c)
    return df.where(cond)
