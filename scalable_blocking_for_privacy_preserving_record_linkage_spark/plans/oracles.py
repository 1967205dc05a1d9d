"""DuckDB twins of the FULL PPRL pipeline — the independent correctness
oracle for every pprl_* driver query (round-1 gap: 7/9 were rows-only).

The whole stage chain is re-derived from the raw ``documents`` parquet in
one ANSI-SQL WITH chain, sharing NOTHING with the Spark implementation
except the published algorithm:

* reference samples  — ``ORDER BY md5('{seed}|{s}|' || v) LIMIT rs`` (the
  md5-keyed seeded draw, classify.build_reference_samples);
* classification     — the reference's prefix binary search
  (/root/reference/src/main/java/com/utils/BinarySearch.java:6-37,
  including its not-found clamps) simulated step-by-step in a RECURSIVE
  CTE, then d1/d2 Levenshtein voting with the strict ``pos-1 > 0`` guard
  (ReferenceSetBlocking.java:161-184);
* block formation    — cyclic adjacent classID pairing via window
  lead + first wrap (ReferenceSetBlocking.java:209-236), both-parties +
  max-size block purge;
* candidates         — the sorted-neighborhood adaptive window in its
  "W-1 nearest preceding opposite-party elements" form
  (MetaBlocking.java:48-76; equivalence proof in operators/window.py);
* CBS/ARCS weights   — distinct co-occurring blocks per pair;
* CLK blooms + Dice  — bigram MD5 positions (4 big-endian words mod m,
  BloomFilter.java:39-62) as DISTINCT (record, attr, pos) rows; Dice over
  shared positions with the NaN guard (MetaBlocking.java:98-118);
* HLSH               — the seeded bit-sampling keys as a literal
  (pass, j, segment, offset) table (operators/hlsh.py draws the identical
  positions from the same numpy seed), bucket purge, cross-party join;
* clusters           — min-label-propagation connected components as a
  RECURSIVE CTE over the symmetric match edges.

All engine-dependent tie-break risks are avoided structurally: the only
row-order-sensitive step (rank within block) uses a total order
(score, party, recordID), and duplicate identical rows are exchangeable.
"""

from __future__ import annotations

import numpy as np

from ..config import PPRLConfig

# ---------------------------------------------------------------------------
# records derivation (shared with plans/testdata.py — kept in one place there)
# ---------------------------------------------------------------------------

RECORDS_CTES = """
toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t
  FROM documents
), recs0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS id,
         upper(t[1] || t[2]) AS surname,
         upper(t[3] || t[4]) AS name,
         upper(source || t[5]) AS city,
         doc_id
  FROM toks WHERE len(t) >= 5
), recs AS (
  SELECT id, surname, name, city, 'A' AS party FROM recs0 WHERE doc_id % 4 <> 3
  UNION ALL
  SELECT id, surname, name, city, 'B' AS party FROM recs0 WHERE doc_id % 4 <> 2
)"""


def _sample_ctes(cfg: PPRLConfig, rs_size: int) -> str:
    """One CTE per (attr, sample) — the md5-keyed seeded draw — plus the
    union table ``srt(s, pos, v)`` (pos 0-based) and sizes ``sn(s, n)``."""
    parts = []
    names = []
    s = 1
    for i, attr in enumerate(cfg.blocking_attrs):
        dv = f"dv{i + 1}"
        parts.append(
            f"{dv} AS (SELECT DISTINCT {attr} AS v FROM recs"
            f" WHERE {attr} IS NOT NULL AND len({attr}) > 1)"
        )
        for _ in range(cfg.num_samples):
            parts.append(
                f"smp{s} AS (\n"
                f"  SELECT {s} AS s, row_number() OVER (ORDER BY v) - 1 AS pos, v\n"
                f"  FROM (SELECT upper(v) AS v FROM\n"
                f"        (SELECT v FROM {dv} ORDER BY md5('{cfg.seed}|{s}|' || v)"
                f" LIMIT {rs_size}))\n"
                f")"
            )
            names.append(f"smp{s}")
            s += 1
    union = "\n  UNION ALL\n  ".join(f"SELECT * FROM {n}" for n in names)
    parts.append(f"srt AS (\n  {union}\n)")
    parts.append("sn AS (SELECT s, count(*) AS n FROM srt GROUP BY s)")
    return ",\n".join(parts)


def _classify_ctes(cfg: PPRLConfig) -> str:
    """Unpivot + binary-search recursion + Levenshtein vote -> ``cls``
    (recordID, party, s, classID, score)."""
    nsc = cfg.num_search_chars
    unpivot = "\n  UNION ALL\n  ".join(
        f"SELECT id AS recordID, party, {i + 1} AS attr_idx, {attr} AS val FROM recs"
        for i, attr in enumerate(cfg.blocking_attrs)
    )
    grid_vals = ", ".join(
        f"({i + 1}, {i * cfg.num_samples + j + 1})"
        for i in range(cfg.num_attrs)
        for j in range(cfg.num_samples)
    )
    return f"""
up AS (
  {unpivot}
),
sgrid(attr_idx, s) AS (VALUES {grid_vals}),
clsq AS (
  SELECT u.recordID, u.party, g.s, u.val,
         CASE WHEN len(u.val) > 1 THEN {nsc + 1} ELSE {nsc} END AS plen, n.n
  FROM up u
  JOIN sgrid g ON g.attr_idx = u.attr_idx
  JOIN sn n ON n.s = g.s
),
bs AS (
  SELECT recordID, party, s, val, plen, n,
         0 AS low, n - 1 AS high, CAST(NULL AS BIGINT) AS pos
  FROM clsq
  UNION ALL
  SELECT b.recordID, b.party, b.s, b.val, b.plen, b.n,
    CASE WHEN b.high < b.low THEN b.low
         WHEN substr(b.val, 1, b.plen) = substr(t.v, 1, b.plen) THEN b.low
         WHEN substr(b.val, 1, b.plen) > substr(t.v, 1, b.plen)
           THEN b.low + (b.high - b.low) // 2 + 1
         ELSE b.low END AS low,
    CASE WHEN b.high < b.low THEN b.high
         WHEN substr(b.val, 1, b.plen) = substr(t.v, 1, b.plen) THEN b.high
         WHEN substr(b.val, 1, b.plen) > substr(t.v, 1, b.plen) THEN b.high
         ELSE b.low + (b.high - b.low) // 2 - 1 END AS high,
    CASE WHEN b.high < b.low THEN
            CASE WHEN b.high < 0 THEN b.high + 1
                 WHEN b.high > b.n - 1 THEN b.high - 1
                 ELSE b.high END
         WHEN substr(b.val, 1, b.plen) = substr(t.v, 1, b.plen)
           THEN b.low + (b.high - b.low) // 2
         ELSE NULL END AS pos
  FROM bs b LEFT JOIN srt t ON t.s = b.s AND t.pos = b.low + (b.high - b.low) // 2
  WHERE b.pos IS NULL
),
bsf AS (SELECT recordID, party, s, val, pos FROM bs WHERE pos IS NOT NULL),
cls AS (
  SELECT recordID, party, s,
         'S' || s || '.' ||
           CAST(CASE WHEN d1 < d2 THEN pos ELSE pos + 1 END AS VARCHAR) AS classID,
         CAST(CASE WHEN d1 < d2 THEN d1 ELSE d2 END AS INTEGER) AS score
  FROM (
    SELECT f.recordID, f.party, f.s, f.pos,
           levenshtein(f.val, s2.v) AS d2,
           CASE WHEN f.pos - 1 > 0 THEN COALESCE(levenshtein(f.val, s1.v), 1000000)
                ELSE 1000000 END AS d1
    FROM bsf f
    JOIN srt s2 ON s2.s = f.s AND s2.pos = f.pos
    LEFT JOIN srt s1 ON s1.s = f.s AND s1.pos = f.pos - 1
  )
)"""


def _blocking_ctes(cfg: PPRLConfig) -> str:
    """Cyclic blockIDs, purge, sorted-neighborhood ranks, candidate pairs,
    CBS/ARCS edges."""
    k = cfg.window_size - 1
    purge = cfg.purge_max_block_size
    size_cond = f"AND (b.na + b.nb) <= {purge}" if purge is not None else ""
    return f"""
cyc AS (
  SELECT recordID, party,
         coalesce(lead(classID) OVER wc, first(classID) OVER wc) AS nc,
         coalesce(lead(score) OVER wc, first(score) OVER wc) AS ns,
         classID, score
  FROM cls WINDOW wc AS (PARTITION BY recordID, party ORDER BY s)
),
elements0 AS (
  SELECT least(classID, nc) || '-' || greatest(classID, nc) AS blockID,
         recordID, party, score + ns AS score
  FROM cyc
),
blkstat AS (
  SELECT blockID,
         sum(CASE WHEN party = 'A' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN party = 'B' THEN 1 ELSE 0 END) AS nb
  FROM elements0 GROUP BY blockID
),
elements AS (
  SELECT e.blockID, e.recordID, e.party, e.score
  FROM elements0 e JOIN blkstat b USING (blockID)
  WHERE b.na > 0 AND b.nb > 0 {size_cond}
),
ranked AS (
  SELECT blockID, recordID, party, score,
         row_number() OVER wr AS pos,
         sum(CASE WHEN party = 'A' THEN 1 ELSE 0 END)
           OVER (wr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnta,
         count(*) OVER (PARTITION BY blockID) AS block_n
  FROM elements
  WINDOW wr AS (PARTITION BY blockID ORDER BY score, party, recordID)
),
rnk AS (
  SELECT blockID, recordID, party, block_n, pos,
         CASE WHEN party = 'A' THEN cnta ELSE pos - cnta END AS p_idx,
         pos - CASE WHEN party = 'A' THEN cnta ELSE pos - cnta END AS opp_before
  FROM ranked
),
cand0 AS (
  SELECT CASE WHEN l.party = 'A' THEN l.recordID ELSE t.recordID END AS record1,
         CASE WHEN l.party = 'A' THEN t.recordID ELSE l.recordID END AS record2,
         l.blockID, l.block_n
  FROM rnk l JOIN rnk t
    ON t.blockID = l.blockID AND t.party <> l.party
   AND t.p_idx >= greatest(1, l.opp_before - {k} + 1)
   AND t.p_idx <= l.opp_before
  WHERE l.opp_before >= 1
),
cands AS (SELECT DISTINCT record1, record2 FROM cand0),
edges AS (
  SELECT record1, record2,
         CAST(count(*) AS BIGINT) AS cbs_weight,
         sum(1.0 / block_n) AS arcs_weight
  FROM (SELECT DISTINCT record1, record2, blockID, block_n FROM cand0)
  GROUP BY record1, record2
)"""


def _bloom_ctes(cfg: PPRLConfig) -> str:
    """CLK bloom bit positions per (record, party, attr) and cardinalities.

    A filter is the DISTINCT set of md5-derived positions; q-grams over
    '#' + trim(value) + '%' with the raw-length>1 emptiness rule
    (functions/bloom.py, BloomAlgorithms.java:20-35).
    """
    q = cfg.ngram_size
    padl = "#" * (q - 1)
    padr = "%" * (q - 1)
    words = ", ".join(str(w) for w in range(cfg.hash_functions))
    return f"""
pad AS (
  SELECT recordID, party, attr_idx, '{padl}' || trim(val) || '{padr}' AS padded
  FROM up WHERE val IS NOT NULL AND len(val) > 1
),
grams AS (
  SELECT recordID, party, attr_idx, substr(padded, i, {q}) AS gram
  FROM (SELECT recordID, party, attr_idx, padded,
               unnest(generate_series(1, len(padded) - {q - 1})) AS i
        FROM pad)
),
bits AS (
  SELECT DISTINCT recordID, party, attr_idx,
         ('0x' || substr(md5(gram), 1 + 8 * w, 8))::BIGINT % {cfg.bloom_m} AS pos
  FROM (SELECT recordID, party, attr_idx, gram, unnest([{words}]) AS w FROM grams)
),
cards AS (
  SELECT recordID, party, attr_idx, CAST(count(*) AS BIGINT) AS card
  FROM bits GROUP BY recordID, party, attr_idx
)"""


def _dice_ctes(cfg: PPRLConfig, pairs_cte: str, prefix: str) -> str:
    """Dice scoring of a (record1, record2) pair table against the bloom
    bits — emits ``{prefix}mtch`` (record1, record2, matched_fields)."""
    t = cfg.matching_threshold
    attr_vals = ", ".join(f"({i + 1})" for i in range(cfg.num_attrs))
    return f"""
{prefix}inter AS (
  SELECT c.record1, c.record2, a.attr_idx, count(*) AS inter
  FROM {pairs_cte} c
  JOIN bits a ON a.party = 'A' AND a.recordID = c.record1
  JOIN bits b2 ON b2.party = 'B' AND b2.recordID = c.record2
             AND b2.attr_idx = a.attr_idx AND b2.pos = a.pos
  GROUP BY c.record1, c.record2, a.attr_idx
),
{prefix}attr AS (
  SELECT c.record1, c.record2, x.attr_idx,
         COALESCE(ca.card, 0) AS carda,
         COALESCE(cb.card, 0) AS cardb,
         COALESCE(pi.inter, 0) AS inter
  FROM {pairs_cte} c
  CROSS JOIN (VALUES {attr_vals}) x(attr_idx)
  LEFT JOIN cards ca ON ca.party = 'A' AND ca.recordID = c.record1
                    AND ca.attr_idx = x.attr_idx
  LEFT JOIN cards cb ON cb.party = 'B' AND cb.recordID = c.record2
                    AND cb.attr_idx = x.attr_idx
  LEFT JOIN {prefix}inter pi ON pi.record1 = c.record1
                    AND pi.record2 = c.record2 AND pi.attr_idx = x.attr_idx
),
{prefix}mtch AS (
  SELECT record1, record2,
         CAST(sum(CASE WHEN (carda + cardb) > 0
                        AND 2.0 * inter >= {t} * (carda + cardb)
                       THEN 1 ELSE 0 END) AS INTEGER) AS matched_fields
  FROM {prefix}attr GROUP BY record1, record2
  HAVING sum(CASE WHEN (carda + cardb) > 0
                   AND 2.0 * inter >= {t} * (carda + cardb)
                  THEN 1 ELSE 0 END) >= {cfg.matches_to_accept}
)"""


def hlsh_positions(
    cfg: PPRLConfig, num_passes: int, bits_per_key: int, seed: int | None = None
) -> list[tuple[int, int, int, int]]:
    """(pass, bit_index_j, attr_segment_1based, offset_within_segment) —
    the EXACT seeded draw of operators/hlsh.py:hlsh_keys (same numpy
    generator, same sort), inlined into the oracle as literals."""
    seed = cfg.seed if seed is None else seed
    m = cfg.bloom_m
    rng = np.random.default_rng(seed * 1_000 + 77)
    rows = []
    for p in range(num_passes):
        positions = rng.choice(cfg.num_attrs * m, size=bits_per_key, replace=False)
        for j, pos in enumerate(sorted(int(x) for x in positions)):
            seg, off = divmod(pos, m)
            rows.append((p, j, seg + 1, off))
    return rows


def _hlsh_ctes(
    cfg: PPRLConfig, num_passes: int, bits_per_key: int, max_bucket_size: int
) -> str:
    vals = ", ".join(
        f"({p}, {j}, {seg}, {off})"
        for p, j, seg, off in hlsh_positions(cfg, num_passes, bits_per_key)
    )
    return f"""
hp(p, j, seg, off) AS (VALUES {vals}),
recparties AS (SELECT id AS recordID, party FROM recs),
hkeys AS (
  SELECT rp.recordID, rp.party, h.p,
         CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1::BIGINT << h.j
                       ELSE 0 END) AS BIGINT) AS key
  FROM recparties rp
  CROSS JOIN hp h
  LEFT JOIN bits b ON b.recordID = rp.recordID AND b.party = rp.party
                  AND b.attr_idx = h.seg AND b.pos = h.off
  GROUP BY rp.recordID, rp.party, h.p
),
hbuck AS (SELECT p, key, count(*) AS n FROM hkeys GROUP BY p, key),
hkeep AS (
  SELECT k.recordID, k.party, k.p, k.key
  FROM hkeys k JOIN hbuck b ON b.p = k.p AND b.key = k.key
  WHERE b.n <= {max_bucket_size}
),
hpairs AS (
  SELECT DISTINCT a.recordID AS record1, b.recordID AS record2
  FROM hkeep a JOIN hkeep b ON a.p = b.p AND a.key = b.key
  WHERE a.party = 'A' AND b.party = 'B'
)"""


def pipeline_prefix(
    cfg: PPRLConfig,
    rs_size: int,
    hlsh_num_passes: int = 8,
    hlsh_bits_per_key: int = 16,
    hlsh_max_bucket_size: int = 1000,
) -> str:
    """The full WITH RECURSIVE chain; append a final SELECT per query.
    DuckDB prunes unreferenced CTEs, so one shared prefix serves all."""
    return (
        "WITH RECURSIVE "
        + RECORDS_CTES.lstrip()
        + ",\n"
        + _sample_ctes(cfg, rs_size)
        + ","
        + _classify_ctes(cfg)
        + ","
        + _blocking_ctes(cfg)
        + ","
        + _bloom_ctes(cfg)
        + ","
        + _dice_ctes(cfg, "cands", "p")
        + ","
        + _hlsh_ctes(cfg, hlsh_num_passes, hlsh_bits_per_key, hlsh_max_bucket_size)
        + ","
        + _dice_ctes(cfg, "hpairs", "h")
        + ",\n"
        + """
med AS (SELECT 'A:' || record1 AS u, 'B:' || record2 AS v FROM pmtch),
-- MATERIALIZED: the recursive reach CTE re-evaluates its join input per
-- iteration; without pinning msym, DuckDB would recompute the whole
-- upstream pipeline (classify + blooms + Dice) every round
msym AS MATERIALIZED (SELECT u, v FROM med UNION SELECT v AS u, u AS v FROM med),
reach AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM msym)
  UNION
  SELECT s.v AS node, r.label FROM reach r JOIN msym s ON s.u = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
"""
    )


def simhash_oracle(max_hamming: int) -> str:
    """BRUTE-FORCE simhash near-pair oracle: recompute every document's
    64-bit simhash (md5-first-8-bytes token fingerprints, sign of the
    per-bit vote — functions/hashing.py:simhash_udf) and join ALL pairs on
    exact hamming distance. Independent of the banding shortcut, so it
    verifies the pigeonhole recall guarantee, not just the verify step."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
  FROM documents WHERE text IS NOT NULL AND len(trim(text)) > 0
),
bitacc AS (
  SELECT doc_id, b,
         sum(CASE WHEN (('0x' || substr(md5(tok), 1, 16))::UBIGINT >> b) & 1 = 1
                  THEN 1 ELSE -1 END) AS acc
  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
  GROUP BY doc_id, b
),
shx AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN
                    CASE WHEN b = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << b) END
                  ELSE 0 END) AS BIGINT) AS sh
  FROM bitacc GROUP BY doc_id
),
allsh AS (
  SELECT d.doc_id, COALESCE(s.sh, 0) AS sh
  FROM documents d LEFT JOIN shx s USING (doc_id)
)
SELECT l.doc_id AS id1, r.doc_id AS id2,
       CAST(bit_count(xor(l.sh, r.sh)) AS INTEGER) AS hamming
FROM allsh l JOIN allsh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.sh, r.sh)) <= {max_hamming}
"""


def _bucket_terms_sql(planes) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(float(x)) for x in planes[p])}]) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(len(planes))
    )


def ann_ivf_recall_oracle(
    dim: int,
    n_lists: int = 8,
    k: int = 5,
    nprobe: int = 2,
    seed: int = 42,
    n_queries: int = 20,
    centroids=None,
    n_assign: int = 1,
) -> str:
    """Oracle for the APPROXIMATE IVF regime (nprobe < n_lists): replays
    the exact engine algorithm — identical centroid literals (seeded unit
    vectors by default, or a TRAINED quantizer passed via ``centroids``,
    e.g. operators/similarity.py:ivf_trained_centroids), argmax list
    assignment with the engine's (score DESC, cid DESC) tie order,
    top-``n_assign`` corpus multi-assignment, top-nprobe query probes,
    pair dedup across probed lists, exact-cosine re-rank — then measures
    per-query recall against the brute-force top-k. Checks the recall
    BEHAVIOR of the approximation, not an idealized ANN answer."""
    from ..operators.similarity import ivf_seeded_centroids

    cents = centroids if centroids is not None else ivf_seeded_centroids(dim, n_lists, seed)
    n_lists = len(cents)
    cent_rows = ", ".join(
        f"({c}, [{', '.join(repr(float(x)) for x in cents[c])}]::DOUBLE[])"
        for c in range(n_lists)
    )
    return f"""
WITH cents(cid, cv) AS (VALUES {cent_rows}),
bv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT vec_id, v FROM bv WHERE vec_id < {n_queries}),
cassign AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
           row_number() OVER (PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cv) DESC, c.cid DESC) AS rn
    FROM bv b CROSS JOIN cents c
  ) WHERE rn <= {n_assign}
),
qprobe AS (
  SELECT vec_id, cid FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.v, c.cv) DESC, c.cid DESC) AS rn
    FROM qv q CROSS JOIN cents c
  ) WHERE rn <= {nprobe}
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(q.v, b.v), 6) DESC,
                      neighbor_id) AS rank,
           q.v AS _qv, b.v AS _bv
    FROM (
      SELECT DISTINCT q0.vec_id AS query_id, a.vec_id AS neighbor_id
      FROM qprobe p
      JOIN qv q0 ON q0.vec_id = p.vec_id
      JOIN cassign a ON a.cid = p.cid AND a.vec_id <> q0.vec_id
    ) pairs
    JOIN qv q ON q.vec_id = pairs.query_id
    JOIN bv b ON b.vec_id = pairs.neighbor_id
  ) WHERE rank <= {k}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.v, b.v), 6) DESC,
                      b.vec_id) AS rank
    FROM qv q JOIN bv b ON b.vec_id <> q.vec_id
  ) WHERE rank <= {k}
),
hits AS (
  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n
  FROM exact e JOIN approx a USING (query_id, neighbor_id)
  GROUP BY e.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
       round(COALESCE(h.n, 0) / {float(k)!r}, 3) AS recall
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN hits h USING (query_id)
"""


def ann_lsh_oracle(
    dim: int, num_planes: int = 8, k: int = 5, seed: int = 42
) -> str:
    """Oracle for single-probe hyperplane LSH top-k: the SAME seeded
    hyperplanes (operators/similarity.py:hyperplane_planes) inlined as
    literal arrays, sign-bucket join, exact cosine re-rank. Checks the
    algorithm including its recall behavior — not an idealized ANN
    answer."""
    from ..operators.similarity import hyperplane_planes

    planes = hyperplane_planes(dim, num_planes, seed)
    bucket_terms = _bucket_terms_sql(planes)
    return f"""
WITH bv AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST({bucket_terms} AS BIGINT) AS bucket
  FROM embeddings
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS cosine
  FROM bv q JOIN bv c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
r AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= {k}
"""


def lsh_near_pairs_oracle(
    dim: int, num_planes: int = 6, threshold: float = 0.3, seed: int = 42
) -> str:
    """Oracle for LSH-bucketed near-pairs: identical seeded hyperplanes,
    sign-bucket self-join, exact cosine + threshold."""
    from ..operators.similarity import hyperplane_planes

    planes = hyperplane_planes(dim, num_planes, seed)
    bucket_terms = _bucket_terms_sql(planes)
    return f"""
WITH bv AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST({bucket_terms} AS BIGINT) AS bucket
  FROM embeddings
)
SELECT l.vec_id AS id1, r.vec_id AS id2,
       round(list_cosine_similarity(l.v, r.v), 6) AS cosine
FROM bv l JOIN bv r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.v, r.v), 6) >= {threshold}
"""


def canonical_embeddings_oracle(
    dim: int, num_planes: int = 6, threshold: float = 0.3, seed: int = 42
) -> str:
    """Oracle for the end-to-end embedding dedup: the lsh_near_pairs
    bucket/verify plan followed by recursive-CTE connected components
    (min-label, the same convention operators/clustering.py converges
    to) and the per-vector cluster assignment."""
    from ..operators.similarity import hyperplane_planes

    planes = hyperplane_planes(dim, num_planes, seed)
    bucket_terms = _bucket_terms_sql(planes)
    return f"""
WITH RECURSIVE bv AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST({bucket_terms} AS BIGINT) AS bucket
  FROM embeddings
),
pairs AS MATERIALIZED (
  SELECT l.vec_id AS id1, r.vec_id AS id2
  FROM bv l JOIN bv r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
  WHERE round(list_cosine_similarity(l.v, r.v), 6) >= {threshold}
),
sym AS MATERIALIZED (
  SELECT id1 AS u, id2 AS v FROM pairs
  UNION SELECT id2 AS u, id1 AS v FROM pairs
),
reach AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT s.v AS node, r.label FROM reach r JOIN sym s ON s.u = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
assign AS (
  SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS cluster_id
  FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id
),
csize AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM assign GROUP BY cluster_id
)
SELECT a.vec_id, a.cluster_id, s.cluster_size,
       CAST(a.vec_id = a.cluster_id AS INT) AS is_canonical
FROM assign a JOIN csize s USING (cluster_id)
"""


def pprl_oracles(cfg: PPRLConfig, rs_size: int) -> dict[str, str]:
    """DuckDB oracle SQL for every pprl_* driver query."""
    pre = pipeline_prefix(cfg, rs_size)
    return {
        "pprl_classified": pre
        + """
SELECT party, s,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(score) AS BIGINT) AS score_sum,
       CAST(count(CASE WHEN score = 0 THEN 1 END) AS BIGINT) AS n_exact
FROM cls GROUP BY party, s
""",
        "pprl_block_elements": pre
        + """
SELECT party,
       CAST(count(*) AS BIGINT) AS n_elements,
       CAST(count(DISTINCT blockID) AS BIGINT) AS n_blocks
FROM elements GROUP BY party
""",
        "pprl_edge_weights": pre
        + """
SELECT cbs_weight,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(sum(arcs_weight), 4) AS arcs_total
FROM edges GROUP BY cbs_weight
""",
        "pprl_candidates": pre + "\nSELECT record1, record2 FROM cands\n",
        "pprl_pruned_candidates": pre
        + "\nSELECT record1, record2 FROM edges WHERE cbs_weight >= 2\n",
        "pprl_matches": pre
        + "\nSELECT record1, record2, matched_fields FROM pmtch\n",
        "pprl_clusters": pre
        + """
SELECT component, CAST(count(*) AS BIGINT) AS size
FROM comp GROUP BY component
""",
        "pprl_metrics": pre
        + """
SELECT s.n_matches, s.tp, e2.expected,
       round(s.tp / s.n_matches, 6) AS precision,
       round(s.tp / e2.expected, 6) AS pairs_completeness,
       round(2.0 * s.tp / (s.n_matches + e2.expected), 6) AS f1
FROM (SELECT CAST(count(*) AS BIGINT) AS n_matches,
             CAST(count(CASE WHEN record1 = record2 THEN 1 END) AS BIGINT) AS tp
      FROM pmtch) s
CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS expected
            FROM (SELECT id FROM recs WHERE party = 'A'
                  INTERSECT
                  SELECT id FROM recs WHERE party = 'B')) e2
""",
        "pprl_bloom_cardinality": pre
        + """
SELECT u.recordID AS id, u.party,
       CAST(u.attr_idx AS BIGINT) AS attr,
       CAST(COALESCE(c.card, 0) AS BIGINT) AS card
FROM up u LEFT JOIN cards c
  ON c.recordID = u.recordID AND c.party = u.party AND c.attr_idx = u.attr_idx
""",
        "pprl_hlsh_matches": pre
        + "\nSELECT record1, record2, matched_fields FROM hmtch\n",
    }
