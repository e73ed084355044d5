"""LLM-data-pipeline surface (SURVEY.md §2B LLM-data ops; BASELINE.json
north star): dedup family, similarity search, text analytics,
multimodal plumbing — exercised on documents/embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from rabbithole_spark.catalog import register
from rabbithole_spark.functions.xxh64_sql import xxh64_long_sql
from rabbithole_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    spread,
    word_shingles,
)
from rabbithole_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    resize_media,
    sample_frames,
)
from rabbithole_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    valid_embeddings,
)
from rabbithole_spark.operators.text_analysis import (
    STOPWORDS,
    winnow_fingerprints,
    bpe_ish_token_count,
    chunk_words,
    fingerprint,
    lang_scores,
    punct_ratio,
    quality_score,
    scrub_pii,
    stopword_ratio,
    token_count,
    tokens,
)
from rabbithole_spark.session import table

# --- dedup -------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT sha256(text) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


@register(
    "dedup_exact_documents",
    oracle=_EXACT_DEDUP_ORACLE,
    doc="Exact content dedup: sha256 digest groupBy, deterministic keeper "
    "(one 32-byte-key shuffle — the 100 TB pre-pass).",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(table(spark, sf_dir, "documents"), "text", "doc_id")


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(trim(lower(regexp_replace(regexp_replace(text, '[\\.,;:!\\?''"]', '', 'g'), '\\s+', ' ', 'g')))) AS fp
FROM documents
"""


@register(
    "dedup_fingerprint",
    oracle=_FINGERPRINT_ORACLE,
    doc="Canonical-form md5 fingerprint (lowercase, collapsed whitespace, "
    "punctuation stripped) — reformat-tolerant dedup key.",
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


_PREFIX_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
             i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')
           )
         ) AS shingles
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.2
"""


@register(
    "dedup_jaccard_prefix_filter",
    oracle=_PREFIX_JACCARD_ORACLE,
    doc="Exact CORPUS-WIDE Jaccard similarity join via prefix filtering "
    "(AllPairs/SSJoin, Bayardo WWW'07): candidates are pairs sharing "
    "a token in their rarest-first prefix of length n - ceil(n/5) + 1, "
    "which provably contains every pair with Jaccard >= 0.2 — the "
    "scale-correct replacement for both metadata blocking (which "
    "misses cross-block pairs; the old verifier-tier quadratic was "
    "retired in round 5) and a full O(n^2) join, with zero recall "
    "loss unlike LSH. The "
    "oracle is the naive unblocked quadratic, so the green row "
    "certifies completeness, not just self-consistency; "
    "tests/test_llm_operators.py additionally asserts the candidate "
    "count is far below n^2/2.",
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.dedup import prefix_filtered_jaccard_pairs

    d = spread(table(spark, sf_dir, "documents"))
    return prefix_filtered_jaccard_pairs(
        d, "doc_id", "text", k=3, t_num=1, t_den=5
    )


_COMPONENTS_ORACLE = """
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
             i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')
           )
         ) AS shingles
  FROM documents
),
-- MATERIALIZED: DuckDB inlines CTEs by default, and the recursive
-- closure below references edges in every iteration — without
-- materialization the quadratic pair computation re-runs per
-- iteration (observed: minutes -> hours at sf0.1)
pairs AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.2
),
edges AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
"""


@register(
    "dedup_components",
    oracle=_COMPONENTS_ORACLE,
    doc="Near-dup pairs -> dedup GROUPS: iterative min-label propagation "
    "(driver loop over join+groupBy rounds, localCheckpoint per round) "
    "oracle-checked against a DuckDB recursive-CTE transitive closure — "
    "the iterative-algorithm shape (GraphX-style) on plain DataFrames. "
    "Pairs come from the prefix-filtered EXACT Jaccard join (round 5; "
    "previously the (lang, len_band)-blocked quadratic), so the whole "
    "pairs -> groups chain is the plan you'd run at 100 TB.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.dedup import (
        connected_components,
        prefix_filtered_jaccard_pairs,
    )

    d = spread(table(spark, sf_dir, "documents"))
    pairs = prefix_filtered_jaccard_pairs(
        d, "doc_id", "text", k=3, t_num=1, t_den=5
    )
    return connected_components(pairs)


#: The oracles' shingle relation — identical semantics to
#: operators.dedup.word_shingles(k=3): RE2 \s == the explicit
#: [ \t\n\r\f]+ class the Spark side tokenizes with. The word list is
#: bound ONCE in a subquery (not re-split per shingle index), and NULL
#: text is excluded to match the Spark side's explicit isNotNull guard
#: (Spark's concat_ws would squash a NULL slice to '' and hash it; the
#: oracle's split would propagate NULL — the divergence class round 5
#: fixed in corpus_snapshot_diff/source_overlap_matrix).
_SHINGLES_CTE = """sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, greatest(len(w) - 2, 1) + 1),
             i -> array_to_string(list_slice(w, i, i + 2), ' ')
           )
         ) AS shingles
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE text IS NOT NULL)
)"""


def _minhash_lsh_oracle(threshold: float) -> str:
    """Full MinHash+LSH replay in the oracle dialect.

    Rounds 1-5 classified this query rows-only ("no oracle can replay
    xxhash64"); functions/xxh64_sql.py retires that excuse with a
    bit-exact pure-SQL XXH64.  The oracle replays the ENTIRE pipeline:
    per-shingle base hash pmod(xxh64, 2^31-1) with Java's truncated-%%
    semantics, the 64 universal-hash min-aggregates with the SAME
    (a, b) coefficient literals the Spark side uses, the 16 band
    hashes xxh64(concat_ws(',', slice)) over the identical decimal
    string rendering, the bucket self-join, and the exact-Jaccard
    candidate verification — so a seed drift, a banding bug, or a
    hash change breaks the driver's hash gate, not just a recall test.
    """
    from rabbithole_spark.functions.xxh64_sql import xxh64_unsigned_sql
    from rabbithole_spark.operators.dedup import _MINHASH_P, _minhash_coeffs

    p = _MINHASH_P
    base = (
        f"list_transform([{xxh64_unsigned_sql('s')}], __u -> "
        f"(((CASE WHEN __u >= {1 << 63}::HUGEINT THEN __u - {1 << 64}::HUGEINT"
        f" ELSE __u END) % {p} + {p}) % {p}))[1]::BIGINT"
    )
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {p})" for a, b in _minhash_coeffs(64)
    )
    band_str = (
        "array_to_string(list_slice(ms, t.range * 4 + 1, t.range * 4 + 4), ',')"
    )
    jac = (
        "CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)"
        " / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)"
    )
    return f"""
WITH {_SHINGLES_CTE},
hx AS (
  SELECT doc_id, {base} AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
sig AS (
  SELECT doc_id, [{mins}] AS ms
  FROM hx GROUP BY doc_id
),
banded AS (
  SELECT doc_id, t.range AS band, {xxh64_unsigned_sql(band_str)} AS bh
  FROM sig CROSS JOIN range(0, 16) t
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b, round({jac}, 6) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.id_a
JOIN sh b ON b.doc_id = c.id_b
WHERE {jac} >= {threshold}
"""


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_lsh_oracle(0.2),
    doc="MinHash+LSH near-dup candidates (64 hashes, 16 bands x 4 rows), "
    "confirmed by exact Jaccard on the candidate set only — the linear-"
    "shuffle approximate dedup for 100 TB corpora. Hash-green since "
    "round 6: the oracle replays xxhash64 itself (functions/"
    "xxh64_sql.py), so the whole signature/banding pipeline is "
    "externally verified, not just its recall contract.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_verified_pairs(
        spread(table(spark, sf_dir, "documents")), threshold=0.2
    )


def _lsh_verified_pairs(d: DataFrame, threshold: float) -> DataFrame:
    """Shared LSH-candidate -> exact-Jaccard-verified pipeline
    (dedup_minhash_lsh at 0.2; dedup_minhash_recall_audit at 0.8).

    NULL-text docs are excluded explicitly: Spark's concat_ws would
    squash a NULL slice to '' and give the doc a real signature, while
    the oracles' split propagates NULL and drops it — the cross-engine
    divergence class round 5 eliminated elsewhere (coalesce-hash
    guards). A NULL document has no content to dedup; both engines now
    agree it does not participate.
    """
    d = d.filter(F.col("text").isNotNull())
    sh = d.select(
        "doc_id",
        word_shingles(F.col("text"), 3).alias("shingles"),
    )
    signed = minhash_signatures(sh, "doc_id", "shingles", 64)
    pairs = lsh_candidate_pairs(signed, "doc_id", bands=16, rows_per_band=4)
    # Materialize the (tiny) candidate-pair set, then recompute shingles
    # ONLY for docs that appear in a pair: exact-Jaccard verification
    # costs O(candidates), not O(corpus). Joining the full-corpus
    # shingle relation back in (the naive shape) shuffles every
    # document's shingle array twice — at 100 TB that's the bottleneck;
    # here the candidate set broadcasts and the corpus is scanned with a
    # broadcast semi-join BEFORE the expensive shingle projection.
    pairs = pairs.localCheckpoint(eager=True)
    cand = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_sh = d.join(F.broadcast(cand), "doc_id").select(
        "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
    )
    a = cand_sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = cand_sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    # filter on the RAW ratio (the oracle's WHERE clause does the
    # same) and round only for output — filtering the rounded value
    # would admit pairs within 5e-7 below the threshold that the
    # oracle rejects
    raw = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    verified = (
        pairs.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("jaccard"))
    )
    return verified


_MINHASH_RECALL_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
             i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' ')
           )
         ) AS shingles
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
"""


@register(
    "dedup_minhash_recall_audit",
    oracle=_MINHASH_RECALL_ORACLE,
    doc="Externally hash-verified recall contract for the MinHash-LSH "
    "path (complementing dedup_minhash_lsh's round-6 full-replay "
    "oracle — this one proves recall==1.0 vs the naive quadratic, "
    "that one proves hash fidelity): the SAME signature/banding pipeline (64 "
    "hashes, 16 bands x 4 rows), exact-verified at Jaccard >= 0.8, "
    "must return exactly the naive quadratic's true pair set. At "
    "J=0.8 a pair evades all 16 bands with probability (1-0.8^4)^16 "
    "~= 2e-4, and the corpus's planted near-dups sit well above the "
    "threshold, so recall is deterministically 1.0 on this data "
    "(measured EQUAL at all three SFs before registration) — a "
    "banding miss, seed drift, or hash change breaks the hash match "
    "at the driver gate. The 0.2-threshold production query keeps "
    "its candidate-set semantics (LSH at 0.2 is intentionally "
    "low-recall for low-similarity pairs; the exact prefix-filter "
    "join covers that regime).",
)
def dedup_minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_verified_pairs(
        spread(table(spark, sf_dir, "documents")), threshold=0.8
    )


_SPAN_K = 20


def _dup_spans_oracle() -> str:
    """Replays the duplicated-span scan: per-position 20-token gram
    hashes (xxh64 of the space-joined gram — the same reduced key the
    Spark side shuffles), corpus-wide multiplicity, per-doc rollup."""
    from rabbithole_spark.functions.xxh64_sql import xxh64_sql

    k = _SPAN_K
    grams = (
        f"list_transform(range(1, greatest(len(w) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice(w, i, i + {k - 1}), ' '))"
    )
    return f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id, {xxh64_sql('gram')} AS h
  FROM (
    SELECT doc_id, unnest({grams}) AS gram
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
          FROM documents WHERE text IS NOT NULL))
),
dup AS (SELECT h FROM ex GROUP BY h HAVING count(*) > 1)
SELECT e.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       round(CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM ex e LEFT JOIN dup d ON e.h = d.h
GROUP BY e.doc_id
"""


@register(
    "dedup_duplicate_ngram_spans",
    oracle=_dup_spans_oracle(),
    doc="Exact duplicated-SPAN detection (the substring-level dedup "
    "pass training pipelines run after document-level dedup — "
    "boilerplate and quoted passages duplicate spans, not whole "
    "docs): every 20-token gram position is hashed (xxhash64 — an "
    "8-byte shuffle key instead of a ~120-byte string), grams "
    "occurring 2+ times corpus-wide are flagged, and each doc "
    "reports its duplicated-gram ratio. All shuffles are linear in "
    "corpus token count; the exploded (doc, hash) relation feeds "
    "both the multiplicity agg and the join-back, so it is "
    "localCheckpoint'd once (NOTES lesson 9). The oracle replays "
    "the gram hashing bit-exactly via functions/xxh64_sql.py.",
)
def dedup_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _SPAN_K
    # NULL-text guard: see _lsh_verified_pairs
    d = spread(
        table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    gram_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, k)))
    )
    ex = d.select(
        "doc_id", F.explode_outer(gram_hashes).alias("h")
    ).localCheckpoint(eager=False)
    dup = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        ex.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.round(
                F.col("n_dup_grams").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )


def _span_coverage_oracle() -> str:
    """Replays the repeated-span COVERAGE pass: the same per-position
    20-token gram hashes as _dup_spans_oracle, corpus-wide multiplicity
    via a window over the hash, then the classic gaps-and-islands merge
    of the overlapping repeated windows [pos, pos+19] per doc and the
    covered-word rollup."""
    from rabbithole_spark.functions.xxh64_sql import xxh64_sql

    k = _SPAN_K
    grams = (
        f"list_transform(range(1, greatest(len(w) - {k - 1}, 1) + 1), "
        f"i -> {{'pos': CAST(i AS BIGINT), "
        f"'gram': array_to_string(list_slice(w, i, i + {k - 1}), ' ')}})"
    )
    return f"""
WITH g AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, unnest({grams}) AS u
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE text IS NOT NULL)
), ex AS MATERIALIZED (
  SELECT doc_id, u.pos AS pos,
         least(u.pos + {k - 1}, n_words) AS fin,
         {xxh64_sql("u.gram")} AS h
  FROM g
), marked AS (
  SELECT doc_id, pos, fin,
         max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_end
  FROM (SELECT doc_id, pos, fin,
               count(*) OVER (PARTITION BY h) AS n_occ FROM ex)
  WHERE n_occ > 1
), islands AS (
  SELECT doc_id, pos, fin,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM marked
), cov AS (
  SELECT doc_id, island, max(fin) - min(pos) + 1 AS covered
  FROM islands GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS repeated_words
  FROM cov GROUP BY doc_id
), docs AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_words
  FROM documents WHERE text IS NOT NULL
)
SELECT d.doc_id, d.n_words,
       coalesce(p.repeated_words, CAST(0 AS BIGINT)) AS repeated_words,
       round(CAST(coalesce(p.repeated_words, 0) AS DOUBLE)
             / CAST(d.n_words AS DOUBLE), 6) AS repeated_frac
FROM docs d LEFT JOIN per_doc p USING (doc_id)
"""


@register(
    "dedup_repeated_span_coverage",
    oracle=_span_coverage_oracle(),
    doc="Repeated-span COVERAGE (the removal-extent companion to "
    "dedup_duplicate_ngram_spans, after Lee et al. 2022, "
    "arXiv:2107.06499 'Deduplicating Training Data Makes Language "
    "Models Better'): overlapping 20-token windows repeated anywhere "
    "in the corpus are MERGED per doc (gaps-and-islands over window "
    "positions), and each doc reports how many of its words an "
    "exact-substring dedup pass would actually excise — overlapping "
    "windows must not double-count, which the per-gram ratio cannot "
    "express. Scale shape: one linear shuffle keys the corpus-wide "
    "multiplicity window on the 8-byte gram hash, one more keys the "
    "island merge on doc_id, and the groupBys reuse the doc_id "
    "partitioning; only rows from REPEATED windows (typically a "
    "small fraction) survive to the merge. The oracle replays gram "
    "hashing (xxh64) and the island arithmetic bit-exactly.",
)
def dedup_repeated_span_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    k = _SPAN_K
    # NULL-text guard: see _lsh_verified_pairs
    d = spread(
        table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    n = F.size(words).cast("long")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (k - 1), F.lit(1)))
    gram_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, k)))
    )
    ex = d.select(
        "doc_id",
        n.alias("n_words"),
        F.posexplode_outer(gram_hashes).alias("p0", "h"),
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        F.least(F.col("p0").cast("long") + k, F.col("n_words")).alias("fin"),
        "h",
    )
    rep = ex.withColumn(
        "n_occ", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).filter(F.col("n_occ") > 1)
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("fin").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = rep.withColumn(
        "is_new",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("is_new").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_doc = (
        islands.groupBy("doc_id", "island")
        .agg((F.max("fin") - F.min("pos") + 1).alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").alias("repeated_words"))
    )
    docs = d.select("doc_id", n.alias("n_words"))
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce("repeated_words", F.lit(0)).cast("long").alias(
            "repeated_words"
        ),
        F.round(
            F.coalesce("repeated_words", F.lit(0)).cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("repeated_frac"),
    )


def _simhash_oracle() -> str:
    """SimHash replay in the oracle dialect: xxh64 (unsigned) per
    distinct shingle, 64 per-bit +1/-1 vote sums, positive votes OR'd
    (summed — powers of two are disjoint) into the signature, then the
    unsigned word reinterpreted as Spark's signed long."""
    from rabbithole_spark.functions.xxh64_sql import xxh64_unsigned_sql

    votes = ",\n         ".join(
        f"sum(CASE WHEN ((u >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
WITH {_SHINGLES_CTE},
hx AS (
  SELECT doc_id, {xxh64_unsigned_sql('s')} AS u
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hx GROUP BY doc_id
)
SELECT doc_id,
       list_transform([{sig}], __s ->
         CASE WHEN __s >= {1 << 63}::HUGEINT THEN __s - {1 << 64}::HUGEINT
              ELSE __s END)[1]::BIGINT AS simhash
FROM votes
"""


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="64-bit SimHash signatures over word shingles, fully JVM-side "
    "(explode + 64 partial-aggregable bit votes); near-dups share "
    "signatures at small Hamming distance. Hash-green since round 6: "
    "the oracle replays xxhash64 (functions/xxh64_sql.py) and the "
    "full bit-vote fold, value-exact per document.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text guard: see _lsh_verified_pairs — the oracle's split
    # drops NULL docs, Spark's concat_ws would signature them
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return simhash(spread(d), "text", "doc_id")


# --- similarity search --------------------------------------------------------

#: Near-dup blocking planes: seeded, generated once at import so the
#: Spark expression and the DuckDB oracle embed the IDENTICAL literals.
_NEAR_DUP_THRESHOLD = 0.35
_NEAR_DUP_N_PLANES = 6


def _near_dup_planes() -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(42)
    return rng.normal(size=(_NEAR_DUP_N_PLANES, 64)).tolist()


def _plane_sig_sql(col: str) -> str:
    """SQL for the 6-bit hyperplane signature of ``col`` — the same
    seeded planes as full-precision literals and the same sequential
    double fold Spark's hyperplane_signature uses."""

    def plane_dot(plane: list[float]) -> str:
        lits = ", ".join(repr(x) for x in plane)
        return (
            "list_aggregate(list_transform(range(1, 65), "
            f"i -> CAST({col}[i] AS DOUBLE) * ([{lits}])[i]), 'sum')"
        )

    return " + ".join(
        f"(CASE WHEN {plane_dot(p)} > 0 THEN 1 ELSE 0 END) * {2 ** i}"
        for i, p in enumerate(_near_dup_planes())
    )



def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    rows = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()
    )
    # clear error over a bare IndexError: an empty/missing query vector
    # means broken upstream data, and the message should say so
    # (round-6 empty-table probe)
    if not rows or rows[0]["embedding"] is None:
        raise ValueError(
            "query vector vec_id=0 not found in embeddings — corpus "
            "empty or malformed"
        )
    return [float(x) for x in rows[0]["embedding"]]


def _valid_embedding_sql(col: str = "embedding", require_norm: bool = True) -> str:
    """DuckDB twin of operators.similarity.valid_embeddings — the
    round-7 malformed-vector exclusion as oracle SQL, in ONE place.
    Change BOTH or neither."""
    base = (
        f"{col} IS NOT NULL"
        f" AND len(list_filter({col}, x -> x IS NULL)) = 0"
    )
    if require_norm:
        base += (
            f" AND list_aggregate(list_transform({col},"
            f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0"
        )
    return base


_TOPK_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         round(
           list_aggregate(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                  i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))),
           6) AS cosine_sim
  FROM embeddings, q
  -- malformed-vector exclusion (round-6 probe pin): list_aggregate
  -- SKIPS NULL elements where Spark's fold propagates NULL, so the
  -- no-NULL-element condition must be explicit; a zero-norm vector's
  -- 0/0 is NULL on both engines and falls to the IS NOT NULL check
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
)
SELECT vec_id, label, cosine_sim
FROM scored
WHERE cosine_sim IS NOT NULL
ORDER BY cosine_sim DESC, vec_id, label
LIMIT 10
"""


@register(
    "similarity_topk_bruteforce",
    oracle=_TOPK_ORACLE,
    doc="Exact top-10 cosine neighbors of vec_id=0 — JVM zip_with/"
    "aggregate dot product, TakeOrderedAndProject top-k; the ANN "
    "correctness baseline.",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _query_vector(spark, sf_dir)
    return cosine_topk(
        table(spark, sf_dir, "embeddings"),
        "embedding",
        qv,
        k=10,
        id_cols=["vec_id", "label"],
    )


def _ann_lsh_oracle() -> str:
    """DuckDB twin of the LSH ANN search: the query vector's bucket and
    every row's bucket from the identical plane literals; exact cosine
    + deterministic top-10 within the query's bucket."""
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {_plane_sig_sql("qe")} AS qbucket FROM q),
b AS (SELECT vec_id, label, embedding,
             {_plane_sig_sql("embedding")} AS bucket
      FROM embeddings
      -- malformed-vector exclusion (round-7 pin): a NULL-element
      -- vector gets a REAL bucket here (list_aggregate skips NULLs)
      -- but a NULL one in Spark; a zero-norm vector's raw cosine is
      -- NaN here (ranks above reals) but NULL there
      WHERE {_valid_embedding_sql()})
SELECT b.vec_id, b.label,
       round(
         list_aggregate(list_transform(range(1, len(b.embedding) + 1),
           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(range(1, len(b.embedding) + 1),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(range(1, len(q.qe) + 1),
                i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum'))),
         6) AS cosine_sim
FROM b, q, qb
WHERE b.bucket = qb.qbucket
ORDER BY cosine_sim DESC, b.vec_id, b.label
LIMIT 10
"""


@register(
    "similarity_ann_lsh",
    oracle=_ann_lsh_oracle(),
    doc="Random-hyperplane LSH ANN: 6-bit signature buckets prune the "
    "scan; exact cosine within the query's bucket. The partition-"
    "pruned search path for 100 TB embedding stores. Fully "
    "deterministic (seeded planes as shared literals), so the "
    "bucket-pruned top-10 is oracle-checked, not just rows-counted.",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:

    qv = _query_vector(spark, sf_dir)
    # same malformed-vector exclusion as the oracle's b CTE
    emb = valid_embeddings(table(spark, sf_dir, "embeddings"))
    return ann_topk(
        emb,
        "embedding",
        qv,
        _near_dup_planes(),
        k=10,
        id_cols=["vec_id", "label"],
    )


_RANGE_TAU = 0.25

_RANGE_SEARCH_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         list_aggregate(list_transform(range(1, len(embedding) + 1),
           i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))) AS raw
  FROM embeddings, q
  -- same malformed-vector exclusion as _TOPK_ORACLE (round-6 pin)
  WHERE vec_id <> 0
    AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
)
SELECT vec_id, label, round(raw, 6) AS cosine_sim
FROM scored WHERE raw >= {_RANGE_TAU}
"""


@register(
    "similarity_range_search",
    oracle=_RANGE_SEARCH_ORACLE,
    doc="Range (radius) similarity search: ALL vectors within cosine "
    ">= tau of the query, not a fixed top-k — the dedup-threshold / "
    "recall-sweep API a retrieval stack needs alongside top-k. Same "
    "codegen fold as the brute-force baseline; the predicate filters "
    "the RAW cosine (rounding only the output, the repo-wide boundary "
    "policy), and the scan is embarrassingly parallel — no shuffle at "
    "all, the filter rides the scan at 100 TB.",
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine

    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    raw = cosine(F.col("embedding"), q)
    return (
        emb.select("vec_id", "label", raw.alias("_raw"))
        .filter(F.col("_raw") >= _RANGE_TAU)
        .select("vec_id", "label", F.round("_raw", 6).alias("cosine_sim"))
    )


#: the Flesch blend's DuckDB transliteration, defined ONCE (the
#: _QUALITY_CASE_SQL pattern) — substituted into the readability oracle
#: AND the round-9 quality-classifier oracle so the coefficients cannot
#: diverge between queries. Rounded to 6dp: the classifier consumes the
#: ROUNDED feature so both engines blend identical doubles.
_FLESCH_SQL = """round(206.835
             - 1.015 * (CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
                        / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
             - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                       / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)),
             6)"""

_READABILITY_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
       CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
         AS n_sentences,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
         AS n_syllables,
       {_FLESCH_SQL} AS flesch
FROM documents
WHERE text IS NOT NULL
"""


@register(
    "text_readability_scores",
    oracle=_READABILITY_ORACLE,
    doc="Flesch-reading-ease quality feature per document: word count "
    "(the repo's explicit whitespace class), sentence count "
    "(punctuation runs, floored at 1 — the synthetic corpus has no "
    "sentence punctuation, so the floor branch is the live one), and "
    "a vowel-group syllable heuristic, blended with the classic "
    "206.835/1.015/84.6 coefficients (identical literals on both "
    "engines). Entirely JVM-side regex counting — row-local, zero "
    "shuffle; the scale shape of every per-doc quality featurizer.",
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no spread(): three regex counts over ~300-char text are too cheap
    # to amortize a text-bytes shuffle (measured 0.14s vs 0.25s warm at
    # sf0.1 — NOTES lesson 8's bm25 case, not the 3-gram case)
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words, sentences, syllables, flesch = _flesch_cols()
    return d.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def _flesch_cols():
    """Shared Flesch feature expressions (oracle twin: _FLESCH_SQL) —
    token_count carries the shared explicit-whitespace-class invariant
    (Java \\s adds \\x0b over RE2's class — operators/text_analysis.py).
    Returns (words, sentences, syllables, rounded-flesch) columns."""
    words = token_count(F.col("text")).cast("long")
    sentences = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syllables = F.regexp_count(
        F.lower(F.col("text")), F.lit("[aeiouy]+")
    ).cast("long")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double")),
        6,
    )
    return words, sentences, syllables, flesch


_MMR_LAMBDA = 0.7
_MMR_POOL = 32
_MMR_K = 10


def _dot_sql(a: str, b: str) -> str:
    """Sequential-fold double dot product — the oracle twin of
    operators.similarity.dot (list order == Spark's zip_with fold)."""
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def _mmr_oracle() -> str:
    """Greedy MMR replayed as {_MMR_K} unrolled CTE steps: the top-pool
    candidates by exact cosine, the pairwise candidate-cosine matrix,
    then step k picks argmax(lambda*rel - (1-lambda)*max-sim-to-
    selected) over the not-yet-selected pool, ties to the lowest
    vec_id. Every float op (sequential dot fold, sqrt, the lambda
    blend) has the identical expression shape on both engines, so the
    scores — and therefore the argmax choices — are bit-equal."""
    lam = _MMR_LAMBDA
    cos_ab = (
        f"{_dot_sql('a.e', 'b.e')} / "
        f"(sqrt({_dot_sql('a.e', 'a.e')}) * sqrt({_dot_sql('b.e', 'b.e')}))"
    )
    # MATERIALIZED: DuckDB inlines CTEs by default, so the k unrolled
    # steps would re-expand pair -> cand -> parquet scans exponentially
    # (the dedup_components oracle hit the same wall in round 5)
    ctes = [
        "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)",
        f"""cand AS MATERIALIZED (
  SELECT vec_id, label, embedding AS e,
         {_dot_sql('embedding', 'q.qe')} /
         (sqrt({_dot_sql('embedding', 'embedding')}) * sqrt({_dot_sql('q.qe', 'q.qe')})) AS rel
  FROM embeddings, q
  WHERE vec_id <> 0
    -- malformed-vector exclusion (round-7 pin): a NULL-element vector
    -- gets a REAL rel here (list_aggregate skips NULLs) but a NULL one
    -- in Spark, and an underfull LIMIT would admit NULL-rel rows
    AND {_valid_embedding_sql()}
  ORDER BY rel DESC, vec_id
  LIMIT {_MMR_POOL})""",
        f"""pair AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cos_ab} AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id)""",
        f"""s1 AS (
  SELECT vec_id, {lam} * rel AS mmr, 1 AS rank
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1)""",
        "a1 AS MATERIALIZED (SELECT * FROM s1)",
    ]
    for k in range(2, _MMR_K + 1):
        ctes.append(f"""s{k} AS (
  SELECT c.vec_id,
         {lam} * c.rel - {1 - lam} * (
           SELECT max(p.s) FROM pair p
           WHERE p.ia = c.vec_id
             AND p.ib IN (SELECT vec_id FROM a{k - 1})) AS mmr,
         {k} AS rank
  FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM a{k - 1})
  ORDER BY mmr DESC, c.vec_id
  LIMIT 1)""")
        ctes.append(
            f"a{k} AS MATERIALIZED "
            f"(SELECT * FROM a{k - 1} UNION ALL SELECT * FROM s{k})"
        )
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT a.rank, a.vec_id, c.label, round(a.mmr, 6) AS mmr_score
FROM a{_MMR_K} a JOIN cand c ON c.vec_id = a.vec_id
"""


def _mmr_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed half of MMR: exact-cosine top-pool candidates.

    Kept as a separate DataFrame builder so its plan is auditable —
    the registered query collects it, so the SHUFFLE_BUDGETS entry
    only sees the driver-side result relation;
    test_mmr_pool_plan_is_shuffle_free pins THIS plan instead.
    """
    from rabbithole_spark.operators.similarity import cosine

    qv = _query_vector(spark, sf_dir)
    q = F.array(*[F.lit(float(x)) for x in qv])
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return (
        emb.select(
            "vec_id",
            "label",
            "embedding",
            cosine(F.col("embedding"), q).alias("rel"),
        )
        # malformed vectors (NULL / NULL-element / zero-norm) fold to a
        # NULL rel — drop them so an underfull pool never admits a row
        # the driver fold cannot norm (round-7 NULL-probe pin; the
        # oracle's cand CTE excludes the same triple)
        .filter(F.col("rel").isNotNull())
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_POOL)
    )


@register(
    "similarity_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance re-ranking (the diversity pass a "
    "retrieval pipeline runs after ANN): distributed exact-cosine "
    "top-32 candidate pool (codegen fold + TakeOrderedAndProject — "
    "the 100 TB-scan part), then greedy selection of 10 results "
    "maximizing lambda*relevance - (1-lambda)*max-similarity-to-"
    "selected on the driver over the 32 collected vectors — the same "
    "bounded k x dim driver-fold class as the k-means centroid loop. "
    "Greedy is inherently sequential in k; the per-step argmax over a "
    "pool that stays distributed would shuffle 10 times for a 32-row "
    "decision. Oracle unrolls the greedy into 10 CTE steps with "
    "bit-equal float expressions, so selection ORDER (not just the "
    "set) is externally verified.",
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    lam = _MMR_LAMBDA
    pool = _mmr_pool(spark, sf_dir).collect()

    def dot(a, b):  # same left-fold order as the codegen zip_with dot
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        return s

    import math

    norms = {r["vec_id"]: math.sqrt(dot(r["embedding"], r["embedding"])) for r in pool}

    def cos(ra, rb):
        return dot(ra["embedding"], rb["embedding"]) / (
            norms[ra["vec_id"]] * norms[rb["vec_id"]]
        )

    selected: list[tuple[int, int, int, float]] = []  # rank, vec_id, label, mmr
    chosen: list = []
    remaining = list(pool)
    for rank in range(1, _MMR_K + 1):
        if not remaining:  # pool smaller than k: oracle's step CTEs
            break          # come back empty past the pool, same result
        best = None
        best_score = None
        for c in remaining:
            pen = max((cos(c, s) for s in chosen), default=0.0)
            score = lam * c["rel"] - (1 - lam) * pen
            if (
                best is None
                or score > best_score
                or (score == best_score and c["vec_id"] < best["vec_id"])
            ):
                best, best_score = c, score
        selected.append((rank, best["vec_id"], best["label"], round(best_score, 6)))
        chosen.append(best)
        remaining = [c for c in remaining if c["vec_id"] != best["vec_id"]]
    return spark.createDataFrame(
        selected, "rank int, vec_id long, label int, mmr_score double"
    )


#: Deterministic hash-mod fit sample for the IVF coarse quantizer: the
#: same Knuth-multiplicative bucket used by the sampling queries, on
#: vec_id, keeping ~50% of vectors. 31-bit fold before the multiply
#: guards ANSI int64 overflow; the identical expression runs in DuckDB.
_IVF_FIT_BUCKET_SQL = "((vec_id % 2147483648) * 2654435761) % 4294967296 % 100 < 50"

#: malformed-vector exclusion for the IVF corpus (oracle dialect) — a
#: NULL / NULL-element vector can neither seed the quantizer (the
#: replay's first-k-by-id CTE would take it as a centroid where
#: lloyd_init_first_k skips None) nor live in a cell (its assignment
#: diverges: all-NULL distances order NULLS LAST in DuckDB -> cell 0,
#: but fold to a NULL cell in Spark) — the kmeans-family instance of
#: the round-7 SemDeDup advice pin. Spark twin: _ivf_corpus below.
_IVF_VALID_SQL = _valid_embedding_sql(require_norm=False)
_IVF_FIT_WHERE = f"{_IVF_FIT_BUCKET_SQL} AND {_IVF_VALID_SQL}"


def _ivf_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings corpus with the _IVF_VALID_SQL exclusion applied
    Spark-side — every IVF build/probe input goes through this."""

    return valid_embeddings(
        table(spark, sf_dir, "embeddings"), require_norm=False
    )
_IVF_N_CENTROIDS = 16
_IVF_NPROBE = 4
_IVF_ITERS = 2


def _sq_l2_sql(vec: str, cent: str) -> str:
    """Squared L2 between a (float) vector column and a double-list
    centroid column — same element fold as Spark's zip_with."""
    return (
        f"list_aggregate(list_transform(range(1, len({vec}) + 1), "
        f"i -> (CAST({vec}[i] AS DOUBLE) - {cent}[i]) "
        f"* (CAST({vec}[i] AS DOUBLE) - {cent}[i])), 'sum')"
    )


def _lloyd_replay_ctes(k: int, iters: int, fit_where: str | None) -> tuple[list[str], str]:
    """CTEs replaying the repo's deterministic Lloyd quantizer in
    DuckDB (similarity.py lloyd_init_first_k/lloyd_iterate):
    first-k-by-id seeding over ``fit`` (optionally a hash-mod sample),
    then ``iters`` unrolled updates — assign to the nearest centroid
    with ties to the lowest cell, per-position means, empty cells keep
    their previous centroid. Returns (ctes, final_centroid_cte)."""
    where = f" WHERE {fit_where}" if fit_where else ""
    ctes = [
        "fit AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e\n"
        f"  FROM embeddings{where})",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster, e AS c\n"
        f"  FROM (SELECT vec_id, e FROM fit ORDER BY vec_id LIMIT {k}))",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"a{it} AS (SELECT vec_id, e, cluster FROM (\n"
            f"  SELECT f.vec_id, f.e, c.cluster,\n"
            f"         row_number() OVER (PARTITION BY f.vec_id ORDER BY\n"
            f"           {_sq_l2_sql('f.e', 'c.c')}, c.cluster) AS rn\n"
            f"  FROM fit f CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        ctes.append(
            # sorted sequential fold, mirroring lloyd_iterate's
            # array_sort+aggregate — plain avg() is merge-order-
            # dependent for doubles on both engines
            f"m{it} AS (SELECT cluster, pos,\n"
            f"  list_aggregate(list_sort(list(e[pos])), 'sum') / count(*) AS v FROM (\n"
            f"  SELECT cluster, e, unnest(generate_series(1, len(e))) AS pos FROM a{it})\n"
            f"  GROUP BY cluster, pos)"
        )
        ctes.append(
            f"c{it} AS (SELECT {prev}.cluster, coalesce(u.c, {prev}.c) AS c\n"
            f"  FROM {prev} LEFT JOIN (SELECT cluster, list(v ORDER BY pos) AS c\n"
            f"                         FROM m{it} GROUP BY cluster) u USING (cluster))"
        )
        prev = f"c{it}"
    return ctes, prev


def _ivf_cache_path_and_fingerprint(sf_dir: str) -> tuple[str, str]:
    """Shared by the single-query and batch IVF queries — they MUST
    agree byte-for-byte on both values or they stop sharing one index
    and thrash each other's cache on every alternation.

    Per-user private cache, keyed by a hash of the FULL dataset path
    (no cross-user predictable /tmp dir, no basename collisions); the
    fingerprint stamps the source parquet (path+size+mtime) plus the
    fit predicate, so editing the sample rule rebuilds the index
    instead of serving a stale layout the oracle no longer replays.
    """
    import hashlib
    import os

    base = os.path.join(os.path.expanduser("~"), ".cache", "rabbithole_spark")
    os.makedirs(base, mode=0o700, exist_ok=True)
    os.chmod(base, 0o700)
    cache_root = os.path.join(base, "ivf")
    os.makedirs(cache_root, exist_ok=True)
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    index_path = os.path.join(cache_root, key)
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fingerprint = (
        f"{src}:{st.st_size}:{st.st_mtime_ns}:{_IVF_FIT_WHERE}"
    )
    return index_path, fingerprint


def _ann_ivf_oracle() -> str:
    """DuckDB twin of the persisted-IVF search: replays the
    deterministic quantizer exactly (see _lloyd_replay_ctes), then the
    nprobe nearest cells and the exact cosine top-10 within them.
    Assignments/probes are integers with distance gaps vastly above
    cross-engine float noise, so the replay is stable."""
    k, iters, nprobe = _IVF_N_CENTROIDS, _IVF_ITERS, _IVF_NPROBE
    lloyd, prev = _lloyd_replay_ctes(k, iters, _IVF_FIT_WHERE)
    ctes = [
        "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)",
        *lloyd,
    ]
    ctes.append(
        f"probes AS (SELECT cluster FROM (\n"
        f"  SELECT c.cluster, row_number() OVER (ORDER BY\n"
        f"    {_sq_l2_sql('q.qe', 'c.c')}, c.cluster) AS rn\n"
        f"  FROM {prev} c, q) WHERE rn <= {nprobe})"
    )
    ctes.append(
        f"cells AS (SELECT vec_id, label, embedding, cluster FROM (\n"
        f"  SELECT v.vec_id, v.label, v.embedding, c.cluster,\n"
        f"         row_number() OVER (PARTITION BY v.vec_id ORDER BY\n"
        f"           {_sq_l2_sql('v.embedding', 'c.c')}, c.cluster) AS rn\n"
        f"  FROM (SELECT * FROM embeddings WHERE {_IVF_VALID_SQL}) v\n"
        f"  CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    with_sql = "WITH " + ",\n".join(ctes)
    return f"""{with_sql}
SELECT vec_id, label, cosine_sim FROM (
  SELECT b.vec_id, b.label,
         round(
           list_aggregate(list_transform(range(1, len(b.embedding) + 1),
             i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(b.embedding) + 1),
                i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(q.qe) + 1),
                  i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum'))),
           6) AS cosine_sim
  FROM cells b, q
  WHERE b.cluster IN (SELECT cluster FROM probes))
-- a zero-norm vector lives in a cell (L2 geometry is defined for it)
-- but has no direction to RANK: its 0/0 cosine is NULL on both
-- engines, and Spark's cosine_topk drops NULL similarities (round-7
-- NULL-probe pin)
WHERE cosine_sim IS NOT NULL
ORDER BY cosine_sim DESC, vec_id, label
LIMIT 10
"""


@register(
    "similarity_ann_ivf",
    oracle=_ann_ivf_oracle(),
    doc="IVF ANN against a PREBUILT cell-partitioned layout: the coarse "
    "quantizer is the repo's own deterministic Lloyd loop "
    "(first-k-by-id seeding over a hash-mod fit sample, fixed "
    "iterations — similarity.py lloyd_iterate), the corpus persists "
    "partitioned by cell id under a per-user private hash-keyed cache "
    "published by atomic rename, and the search probes the 4 nearest "
    "of 16 cells as a partition-pruned scan (PartitionFilters on "
    "cell), reading nprobe/n_centroids of the corpus — the 100 TB "
    "shape. Deterministic end to end, so the probe replay is "
    "oracle-checked rather than rows-counted.",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import ivf_topk_persisted

    qv = _query_vector(spark, sf_dir)
    index_path, fingerprint = _ivf_cache_path_and_fingerprint(sf_dir)
    return ivf_topk_persisted(
        spark,
        _ivf_corpus(spark, sf_dir),
        "embedding",
        qv,
        index_path,
        n_centroids=_IVF_N_CENTROIDS,
        nprobe=_IVF_NPROBE,
        k=10,
        id_cols=["vec_id", "label"],
        iters=_IVF_ITERS,
        fit_filter=F.expr(_IVF_FIT_BUCKET_SQL),
        fingerprint=fingerprint,
    )


#: query vec_ids for the batch IVF probe — deterministic, spread across
#: the id space so the probe sets (and hence the pruned cells) differ
_IVF_BATCH_QUERY_IDS = (0, 7, 19)


def _ann_ivf_batch_oracle() -> str:
    """DuckDB twin of the BATCH persisted-IVF search: the same Lloyd
    replay as _ann_ivf_oracle, then per-query probes (row_number over
    the query partition) and per-query exact cosine top-10 within the
    probed cells."""
    k, iters, nprobe = _IVF_N_CENTROIDS, _IVF_ITERS, _IVF_NPROBE
    ids = ", ".join(str(i) for i in _IVF_BATCH_QUERY_IDS)
    lloyd, prev = _lloyd_replay_ctes(k, iters, _IVF_FIT_WHERE)
    ctes = [
        f"q AS (SELECT vec_id AS query_id,\n"
        f"  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe\n"
        f"  FROM embeddings WHERE vec_id IN ({ids}))",
        *lloyd,
    ]
    ctes.append(
        f"probes AS (SELECT query_id, cluster FROM (\n"
        f"  SELECT q.query_id, c.cluster,\n"
        f"         row_number() OVER (PARTITION BY q.query_id ORDER BY\n"
        f"           {_sq_l2_sql('q.qe', 'c.c')}, c.cluster) AS rn\n"
        f"  FROM {prev} c, q) WHERE rn <= {nprobe})"
    )
    ctes.append(
        f"cells AS (SELECT vec_id, label, embedding, cluster FROM (\n"
        f"  SELECT v.vec_id, v.label, v.embedding, c.cluster,\n"
        f"         row_number() OVER (PARTITION BY v.vec_id ORDER BY\n"
        f"           {_sq_l2_sql('v.embedding', 'c.c')}, c.cluster) AS rn\n"
        f"  FROM (SELECT * FROM embeddings WHERE {_IVF_VALID_SQL}) v\n"
        f"  CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    ctes.append(
        "scored AS (\n"
        "  SELECT q.query_id, b.vec_id, b.label,\n"
        "         round(\n"
        "           list_aggregate(list_transform(range(1, len(b.embedding) + 1),\n"
        "             i -> CAST(b.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum')\n"
        "           / (sqrt(list_aggregate(list_transform(range(1, len(b.embedding) + 1),\n"
        "                i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))\n"
        "              * sqrt(list_aggregate(list_transform(range(1, len(q.qe) + 1),\n"
        "                  i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum'))),\n"
        "           6) AS cosine_sim\n"
        "  FROM cells b JOIN probes p ON b.cluster = p.cluster\n"
        "  JOIN q ON q.query_id = p.query_id)"
    )
    with_sql = "WITH " + ",\n".join(ctes)
    return f"""{with_sql}
SELECT query_id, vec_id, label, cosine_sim FROM (
  SELECT query_id, vec_id, label, cosine_sim,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cosine_sim DESC, vec_id, label) AS rn
  -- NULL cosines (zero-norm vectors) cannot rank — see the
  -- single-query oracle
  FROM scored WHERE cosine_sim IS NOT NULL) WHERE rn <= 10
"""


@register(
    "similarity_ann_ivf_batch",
    oracle=_ann_ivf_batch_oracle(),
    doc="BATCH IVF ANN — the shape a retrieval pipeline actually runs "
    "at 100 TB: N query vectors resolve their nprobe cells driver-side "
    "(k x dim sidecar math), the persisted cell-partitioned layout is "
    "scanned ONCE with the probe-union as PartitionFilters, each row "
    "joins only the queries probing its cell (broadcast of the tiny "
    "query table, array_contains residual), and per-query top-10 is a "
    "single window over query_id. Plan-tested: one pruned scan for "
    "all N queries (tests/test_scale_plans.py). Same deterministic "
    "quantizer as similarity_ann_ivf, so the whole batch probe is "
    "oracle-replayed.",
)
def similarity_ann_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import ivf_topk_persisted_batch

    rows = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(list(_IVF_BATCH_QUERY_IDS)))
        .select("vec_id", "embedding")
        .collect()
    )
    qvecs = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )
    index_path, fingerprint = _ivf_cache_path_and_fingerprint(sf_dir)
    return ivf_topk_persisted_batch(
        spark,
        _ivf_corpus(spark, sf_dir),
        "embedding",
        qvecs,
        index_path,
        n_centroids=_IVF_N_CENTROIDS,
        nprobe=_IVF_NPROBE,
        k=10,
        id_cols=["vec_id", "label"],
        iters=_IVF_ITERS,
        fit_filter=F.expr(_IVF_FIT_BUCKET_SQL),
        fingerprint=fingerprint,
    )


def _near_dup_oracle() -> str:
    """DuckDB twin of the LSH-bucket-blocked near-dup query: identical
    plane literals, bucket-equality blocking, cosine threshold."""
    sig = _plane_sig_sql("embedding")
    return f"""
WITH v AS (SELECT vec_id, embedding, {sig} AS bucket FROM embeddings
           -- malformed-vector exclusion (round-9 review: this query
           -- missed the round-7 audit): a NULL-element vector gets a
           -- REAL bucket+cosine here via DuckDB's NULL-skipping list
           -- folds but NULL-sinks in Spark; zero-norm raw cosine is
           -- NaN here vs NULL there
           WHERE {_valid_embedding_sql()}),
pairs AS (
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_aggregate(list_transform(range(1, len(a.embedding) + 1),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
         / (sqrt(list_aggregate(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), 'sum'))
            * sqrt(list_aggregate(list_transform(range(1, len(b.embedding) + 1),
                i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum'))),
         6) AS cosine_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= {_NEAR_DUP_THRESHOLD}
"""


@register(
    "similarity_embedding_near_dup",
    oracle=_near_dup_oracle(),
    doc="Embedding-cosine near-dup pairs blocked by random-hyperplane "
    "LSH buckets (the 100 TB shape: bucket equality is one linear "
    "shuffle on a 64-bucket key and the quadratic compare is bounded "
    "per bucket, vs the label-blocked all-pairs join this replaced). "
    "Threshold 0.35 is calibrated to the synthetic embeddings "
    "(near-random vectors, max pairwise cosine ~0.51) so the check "
    "certifies real pairs at sf0.01 instead of an empty result.",
)
def similarity_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine, hyperplane_signature

    e = valid_embeddings(table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", hyperplane_signature(F.col("embedding"), _near_dup_planes())
    )
    a = e.alias("a")
    b = e.alias("b")
    sim = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= _NEAR_DUP_THRESHOLD)
    )


# --- text analysis -------------------------------------------------------------

_TOKENS_ORACLE = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(string_split_regex(trim(text),
            '[\\s\\.,;:!\\?\\(\\)\\[\\]\\{\\}"'']+'), p -> p != '')) AS INTEGER) AS n_pieces,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
"""


@register(
    "text_token_counts",
    oracle=_TOKENS_ORACLE,
    doc="Whitespace + BPE-ish (punctuation-boundary) token counting.",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("int").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("int").alias("n_pieces"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


#: the quality heuristic's DuckDB transliteration (quality_score's SQL
#: twin) — defined ONCE and substituted into every oracle that scores
#: quality, so a threshold tweak cannot diverge between queries
_QUALITY_CASE_SQL = """CAST(CASE WHEN text IS NULL THEN NULL ELSE
           CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0 END
         + CASE WHEN CAST(length(regexp_replace(text, '[^\\.,;:!\\?''"]', '', 'g')) AS DOUBLE)
                     / CAST(greatest(length(text), 1) AS DOUBLE) < 0.1 THEN 0.3 ELSE 0 END
         + CASE WHEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
                     / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) > 0.01
                THEN 0.3 ELSE 0 END END AS DOUBLE)"""
# NULL-text guard (round-6 probe): Spark's quality_score propagates
# NULL (every term is NULL-typed arithmetic) while the bare CASE sums
# evaluated to 0.0 — a rollup's avg(quality) then diverged (avg
# ignores NULL but counts 0.0).

_QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS text_len,
       round(CAST(length(regexp_replace(text, '[^\\.,;:!\\?''"]', '', 'g')) AS DOUBLE)
             / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
       round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
             / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE), 6) AS stopword_ratio,
       round({_QUALITY_CASE_SQL}, 6) AS quality
FROM documents
"""


@register(
    "text_quality_stats",
    oracle=_QUALITY_ORACLE,
    doc="Quality scoring: length band, punctuation ratio, stopword ratio "
    "-> composite score (the cheap 100 TB pre-filter).",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("int").alias("text_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
    )


def _lang_case_sql() -> str:
    scores = {
        lang: (
            "len(list_intersect(list_distinct(string_split_regex(trim(lower(text)), '\\s+')), "
            f"[{', '.join(repr(w) for w in words)}]))"
        )
        for lang, words in STOPWORDS.items()
    }
    mx = "greatest(" + ", ".join(scores.values()) + ")"
    case = "CASE " + " ".join(
        f"WHEN {scores[lang]} = {mx} THEN '{lang}'" for lang in STOPWORDS
    ) + " END"
    cols = ",\n       ".join(
        f"CAST({expr} AS INTEGER) AS score_{lang}" for lang, expr in scores.items()
    )
    return f"""
SELECT doc_id, lang,
       {cols},
       {case} AS predicted_lang
FROM documents
"""


@register(
    "text_lang_id",
    oracle=_lang_case_sql(),
    doc="Stopword-hit language ID heuristic with deterministic argmax "
    "tie-break (first language in registry order).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    scores = lang_scores(F.col("text"))
    mx = F.greatest(*scores.values())
    predicted = F.when(F.lit(False), None)
    for lang in STOPWORDS:
        predicted = predicted.when(scores[lang] == mx, lang)
    return d.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("int").alias(f"score_{lang}") for lang in STOPWORDS],
        predicted.alias("predicted_lang"),
    )


_CHUNK_ORACLE = """
SELECT doc_id, u.chunk_idx, u.chunk_text
FROM (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CASE WHEN len(string_split_regex(trim(text), '\\s+')) <= 64 THEN 1
                 ELSE 1 + CAST(floor((len(string_split_regex(trim(text), '\\s+')) - 64 + 47) / 48.0) AS INTEGER) END),
           i -> {'chunk_idx': CAST(i AS INTEGER),
                 'chunk_text': array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i * 48 + 1, i * 48 + 64), ' ')}
         )) AS u
  FROM documents
)
"""


@register(
    "text_chunk_documents",
    oracle=_CHUNK_ORACLE,
    doc="Context-window chunking: 64-word chunks with 16-word overlap, "
    "one row per chunk (sequence/slice/concat_ws inside codegen + "
    "posexplode) — the fan-out stage ahead of embedding.",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.posexplode(chunk_words(F.col("text"), chunk_size=64, overlap=16)).alias(
            "chunk_idx", "chunk_text"
        ),
    )


_PII_ORACLE = """
SELECT doc_id,
       regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{4,}', '<NUM>', 'g') AS scrubbed,
       CAST(length(text) - length(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '[0-9]{4,}', '<NUM>', 'g')) AS INTEGER) AS chars_removed
FROM documents
"""


@register(
    "text_pii_scrub",
    oracle=_PII_ORACLE,
    doc="Regex-tier PII redaction (emails, long digit runs) at scan "
    "speed; rows this tier flags would feed an NER-model pandas-UDF "
    "tier at 100 TB.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    scrubbed = scrub_pii(F.col("text"))
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (F.length("text") - F.length(scrubbed)).cast("int").alias("chars_removed"),
    )


_CLEAN_ORACLE = """
WITH filtered AS (
  SELECT doc_id, lang, n_chars,
         md5(trim(lower(regexp_replace(regexp_replace(text, '[\\.,;:!\\?''"]', '', 'g'), '\\s+', ' ', 'g')))) AS fp
  FROM documents
  WHERE n_chars BETWEEN 50 AND 10000
    AND CAST(length(regexp_replace(text, '[^\\.,;:!\\?''"]', '', 'g')) AS DOUBLE)
        / CAST(greatest(length(text), 1) AS DOUBLE) < 0.1
)
SELECT min(doc_id) AS keep_id, fp,
       count(*) AS n_copies,
       min(lang) AS lang
FROM filtered
GROUP BY fp
"""


@register(
    "pipeline_clean_corpus",
    oracle=_CLEAN_ORACLE,
    doc="Composed curation pipeline: quality pre-filter (length band + "
    "punctuation ratio) -> canonical-fingerprint dedup keeping the "
    "smallest id — filters run at scan speed BEFORE the dedup shuffle "
    "(the ordering that matters at 100 TB).",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    filtered = d.filter(
        F.col("n_chars").between(50, 10000) & (punct_ratio(F.col("text")) < 0.1)
    ).select("doc_id", "lang", fingerprint(F.col("text")).alias("fp"))
    return filtered.groupBy("fp").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("lang").alias("lang"),
    ).select("keep_id", "fp", "n_copies", "lang")


#: Deterministic per-row sampling bucket: Knuth multiplicative hash of
#: the id, folded to [0, 100). Plain 64-bit integer arithmetic, so the
#: EXACT same expression runs in Spark and DuckDB — unlike df.sample(),
#: whose selection depends on partition layout. Reproducible selection
#: is what a training-data pipeline needs anyway (re-running a 100 TB
#: sample must yield the same corpus). The id folds to 31 bits BEFORE
#: the multiply so the product peaks at 2^31 * 2654435761 ~ 5.7e18 <
#: 2^63 — no ANSI overflow for any BIGINT doc_id.
_SAMPLE_BUCKET_SQL = (
    "((doc_id % 2147483648) * 2654435761) % 4294967296 % 100"
)

_UNIFORM_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_SAMPLE_BUCKET_SQL} < 20
"""


@register(
    "sample_uniform_documents",
    oracle=_UNIFORM_SAMPLE_ORACLE,
    doc="Uniform 20% sample via deterministic hash-mod selection "
    "(multiplicative hash of doc_id) — scan-local, no shuffle, and "
    "reproducible across runs/engines, which seeded Bernoulli "
    "sample() is not (it is partition-layout-dependent).",
)
def sample_uniform_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(F.expr(f"{_SAMPLE_BUCKET_SQL} < 20")).select(
        "doc_id", "lang", "n_chars"
    )


_STRATIFIED_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_SAMPLE_BUCKET_SQL} < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
"""


@register(
    "sample_stratified_by_lang",
    oracle=_STRATIFIED_SAMPLE_ORACLE,
    doc="Stratified sampling with per-stratum rates (downsample the "
    "dominant language to 10%, keep 50% elsewhere) via the same "
    "deterministic hash-mod bucket — the mixture-rebalancing stage "
    "of a curation pipeline, still scan-local.",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.filter(
        F.expr(
            f"{_SAMPLE_BUCKET_SQL} < CASE WHEN lang = 'en' THEN 10 ELSE 50 END"
        )
    ).select("doc_id", "lang", "n_chars")


_KSAMPLE_K = 50

#: rank key for the fixed-k sampler: yet another odd multiplier — the
#: actual low 32 bits of the xxhash prime5 constant
#: (2870177450012600261 mod 2^32 = 374761413, odd as a multiplicative
#: hash requires). CAVEAT (round-9 measurement): distinct odd
#: multipliers decorrelate only the odd-modulus components — (d*a)
#: mod 2^k depends on d mod 2^k alone, so all multiplicative buckets
#: in this module remain correlated in their low bits; where full
#: independence is load-bearing (the decontamination split, the
#: training shuffle) a domain-tagged xxhash64 is used instead.
#: 2^31 * 374761413 ~ 8.0e17 < 2^63: overflow-safe.
_KSAMPLE_RANK_SQL = "((doc_id % 2147483648) * 374761413) % 4294967296"

_KSAMPLE_ORACLE = f"""
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source
           ORDER BY {_KSAMPLE_RANK_SQL}, doc_id) AS rn
  FROM documents
) WHERE rn <= {_KSAMPLE_K}
"""


@register(
    "sample_fixed_k_per_source",
    oracle=_KSAMPLE_ORACLE,
    doc="Exactly-k-per-group deterministic sampling (balanced eval-set "
    "construction: k docs from EVERY source regardless of source "
    "size, where the fraction-based stratified sampler cannot bound "
    "group counts): rank docs within each source by a multiplicative "
    "hash of doc_id (ties broken by doc_id) and keep rank <= k. "
    "Replayable byte-for-byte like the other hash-mod samplers, and "
    "uncorrelated with them (distinct odd multiplier). Scale shape: "
    "ONE shuffle keys the window on source; at 100 TB pre-filter with "
    "a conservative hash-bucket threshold (rank is uniform, so "
    "bucket < c*k/n_source keeps all winners with near-certainty) so "
    "the window sorts a sliver, not the corpus.",
)
def sample_fixed_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr(_KSAMPLE_RANK_SQL), "doc_id"
    )
    return (
        d.select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KSAMPLE_K)
        .drop("rn")
    )


#: Train/val/test assignment bucket: same 31-bit-fold hash-mod shape as
#: _SAMPLE_BUCKET_SQL but with a DIFFERENT odd multiplier (xxhash
#: prime2), decorrelating the odd-modulus components of split
#: membership from the sampling bucket (power-of-2 residues stay
#: correlated — the _KSAMPLE_RANK_SQL caveat; the 98/1/1 thresholds
#: read the full mod-100 value, so the residual mod-4 dependence
#: biases membership only mildly). 2^31 * 2246822519 ~ 4.8e18 < 2^63:
#: no overflow for any BIGINT doc_id.
_SPLIT_BUCKET_SQL = "((doc_id % 2147483648) * 2246822519) % 4294967296 % 100"

_SPLIT_CASE_SQL = (
    f"CASE WHEN {_SPLIT_BUCKET_SQL} < 98 THEN 'train' "
    f"WHEN {_SPLIT_BUCKET_SQL} < 99 THEN 'val' ELSE 'test' END"
)

_SPLIT_ORACLE = f"""
SELECT {_SPLIT_CASE_SQL} AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


@register(
    "split_train_val_test",
    oracle=_SPLIT_ORACLE,
    doc="Deterministic 98/1/1 train/val/test split by hash-mod on "
    "doc_id, rolled up per (split, lang). Row-local assignment: no "
    "shuffle beyond the rollup, reproducible across runs and engines "
    "(re-materializing a 100 TB split MUST land every document in the "
    "same file), and leakage-free by construction — membership is a "
    "pure function of the id, so a document can never drift between "
    "splits across incremental ingestion runs. The independent "
    "multiplier keeps split choice uncorrelated with the sampling "
    "queries' hash bucket.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", F.expr(_SPLIT_CASE_SQL))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_CANONICAL_SURVIVORS_ORACLE = f"""
{_COMPONENTS_ORACLE.replace("SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src",
                            ", comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)")}
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
WHERE comp.doc_id IS NULL OR comp.component = comp.doc_id
"""


@register(
    "dedup_canonical_survivors",
    oracle=_CANONICAL_SURVIVORS_ORACLE,
    doc="The dedup family's OUTPUT step: near-dup pairs -> connected "
    "components -> keep exactly one canonical document per duplicate "
    "cluster (the min doc_id, i.e. the component label) plus every "
    "unpaired document. An anti-join of the corpus against the "
    "non-canonical member set — digest-sized rows through the "
    "shuffle, the corpus itself never re-partitions. Pair-source-"
    "agnostic: wired here to the prefix-filtered EXACT Jaccard join "
    "(round 5; previously the blocked n-gram quadratic) so the whole "
    "closure is scale-correct AND oracle-replayable in SQL; at 100 TB "
    "the LSH candidates (dedup_minhash_lsh) slot in identically.",
)
def dedup_canonical_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.dedup import (
        connected_components,
        prefix_filtered_jaccard_pairs,
    )

    d = spread(table(spark, sf_dir, "documents"))
    pairs = prefix_filtered_jaccard_pairs(
        d, "doc_id", "text", k=3, t_num=1, t_den=5
    )
    comps = connected_components(pairs)
    losers = comps.filter(F.col("component") != F.col("doc_id")).select("doc_id")
    return (
        table(spark, sf_dir, "documents")
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )


#: padded sequence-length grain for the padding-efficiency rollup —
#: 16 keeps several buckets populated on the synthetic 10-99-token
#: docs; a production corpus would use 256/512
_PAD_BUCKET = 16

_PAD_EFFICIENCY_ORACLE = f"""
WITH toks AS (
  SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), b AS (
  SELECT n_tokens,
         CAST((greatest(n_tokens, 1) - 1) // {_PAD_BUCKET} AS BIGINT) AS bucket
  FROM toks
)
SELECT bucket,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(*) * (bucket + 1) * {_PAD_BUCKET} AS BIGINT) AS padded_tokens,
       ROUND(CAST(sum(n_tokens) AS DOUBLE)
             / (count(*) * (bucket + 1) * {_PAD_BUCKET}), 6) AS efficiency
FROM b
GROUP BY bucket
"""


@register(
    "pack_padding_efficiency",
    oracle=_PAD_EFFICIENCY_ORACLE,
    doc="Length-bucketed padding-waste audit: group documents by "
    "token-length bucket (grain _PAD_BUCKET) and report, per bucket, "
    "how much of the padded batch (every doc padded to the bucket "
    "ceiling) is real tokens — the standard measurement behind "
    "length-bucketed batching (padding a 10-token doc to 2048 wastes "
    "99.5% of the batch). One scan + one grouped agg on an integer "
    "key: linear at any scale.",
)
def pack_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(token_count(F.col("text")).cast("bigint").alias("n_tokens"))
    # exact multiples belong to the LOWER bucket: a 16-token doc pads
    # to 16 with zero waste, not to 32 — hence (n-1) div grain
    bucket = F.expr(
        f"(greatest(n_tokens, 1) - 1) div {_PAD_BUCKET}"
    ).alias("bucket")
    grouped = toks.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    padded = (
        (F.col("bucket") + 1) * _PAD_BUCKET * F.col("n_docs")
    ).cast("bigint")
    return grouped.select(
        "bucket",
        "n_docs",
        "total_tokens",
        padded.alias("padded_tokens"),
        F.round(
            F.col("total_tokens").cast("double") / padded, 6
        ).alias("efficiency"),
    )


# --- multimodal -----------------------------------------------------------------

def _stringify_features(df: DataFrame) -> DataFrame:
    """Render the ``features array<float>`` column as a rounded CSV
    string: deterministic, hashable cells for the driver's pandas-based
    canonicalizer (same treatment as scalar_map_funcs's map rendering —
    raw array cells crash its sort with 'unhashable type: list').
    %.6f formatting (not double->string casting) keeps the rendering
    engine-neutral: Java would print small ratios as 1.0E-4 while SQL
    engines print 0.000100."""
    return df.select(
        "doc_id",
        "n_bytes",
        F.array_join(
            F.transform(
                "features",
                lambda v: F.format_string(
                    "%.6f", F.round(v.cast("double"), 6)
                ),
            ),
            ",",
        ).alias("features_csv"),
    )


_BINARY_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS content_sha,
       CAST(octet_length(encode(text)) % 512 + 1 AS BIGINT) AS width,
       CAST(octet_length(encode(text)) % 256 + 1 AS BIGINT) AS height
FROM documents
"""


@register(
    "multimodal_binary_stats",
    oracle=_BINARY_ORACLE,
    doc="Binary media column plumbing: payload bytes + digest + typed "
    "metadata (JVM-side; payload never leaves the executor).",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_fake_media(table(spark, sf_dir, "documents"), "text", "doc_id")
    return media.select(
        "doc_id",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


_FEATURE_ORACLE = """
WITH ascii_docs AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
  FROM documents WHERE octet_length(encode(text)) = length(text)
),
hist AS (
  SELECT doc_id, n_bytes,
         list_transform(range(0, 8),
           b -> len(list_filter(range(1, length(text) + 1),
                i -> ord(array_extract(text, i)) >= b * 32
                 AND ord(array_extract(text, i)) < (b + 1) * 32))) AS h
  FROM ascii_docs
)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       array_to_string(list_transform(h,
         c -> printf('%.6f', round(CAST(CAST(
                CAST(c AS DOUBLE)
                / CAST(CASE WHEN n_bytes = 0 THEN 1 ELSE n_bytes END AS DOUBLE)
              AS REAL) AS DOUBLE), 6))), ',') AS features_csv
FROM hist
"""


@register(
    "multimodal_feature_extract",
    oracle=_FEATURE_ORACLE,
    doc="mapInPandas feature extraction over binary payloads (Arrow "
    "batches; deterministic byte-histogram stand-in for an encoder "
    "forward pass; real decoders plug into operators.multimodal."
    "decode_stub). ASCII-scoped registration (all docs here) so the "
    "SQL oracle can reproduce the byte histogram from codepoints, "
    "including the float32 ratio rounding (double divide -> REAL "
    "cast, matching numpy's float64-divide-then-float32-astype).",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text")
    )
    media = attach_fake_media(docs, "text", "doc_id")
    return _stringify_features(extract_features(media, "doc_id"))


_RESIZE_ORACLE = """
WITH ascii_docs AS (
  SELECT doc_id, text, length(text) AS n
  FROM documents
  WHERE octet_length(encode(text)) = length(text) AND length(text) > 0
),
dims AS (
  SELECT doc_id, text, n, n % 512 + 1 AS w, n % 256 + 1 AS h FROM ascii_docs
),
resized AS (
  SELECT doc_id,
         list_transform(range(0, 512),
           i -> ord(array_extract(text,
                CAST((((i // 32) * h // 16) * w + ((i % 32) * w // 32)) % n
                     AS BIGINT) + 1))) AS rb
  FROM dims
),
hist AS (
  SELECT doc_id,
         list_transform(range(0, 8),
           b -> len(list_filter(rb, v -> v >= b * 32 AND v < (b + 1) * 32)))
           AS hh
  FROM resized
)
SELECT doc_id, CAST(512 AS BIGINT) AS n_bytes,
       array_to_string(list_transform(hh,
         c -> printf('%.6f', round(CAST(CAST(
                CAST(c AS DOUBLE) / 512.0
              AS REAL) AS DOUBLE), 6))), ',') AS features_csv
FROM hist
"""


@register(
    "multimodal_resize_pipeline",
    oracle=_RESIZE_ORACLE,
    doc="Composable resize stage (mapInPandas nearest-neighbor to 32x16) "
    "feeding feature extraction — the two-stage encoder-prep pipeline "
    "shape; a real PIL/opencv resizer drops into the same kernel. "
    "ASCII-scoped registration: the oracle replays the kernel's exact "
    "pixel selection (tile payload to metadata dims, pick the "
    "nearest-neighbor grid) and the downstream histogram from "
    "codepoints.",
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents")).filter(
        (F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text"))
        & (F.length("text") > 0)
    )
    media = attach_fake_media(docs, "text", "doc_id")
    return _stringify_features(
        extract_features(resize_media(media, width=32, height=16), "doc_id")
    )


_FRAME_ORACLE = """
WITH ascii_docs AS (
  SELECT doc_id, text,
         CAST(greatest(ceil(octet_length(encode(text)) / 256.0), 1) AS BIGINT)
           AS n_frames
  FROM documents
  WHERE octet_length(encode(text)) = length(text)
)
SELECT d.doc_id,
       gs.frame_idx,
       d.n_frames,
       CAST(octet_length(encode(substring(d.text, gs.frame_idx * 256 + 1, 256)))
            AS BIGINT) AS frame_bytes,
       sha256(substring(d.text, gs.frame_idx * 256 + 1, 256)) AS frame_sha
FROM ascii_docs d,
     LATERAL (SELECT unnest(range(0, d.n_frames, 4)) AS frame_idx) gs
"""


@register(
    "multimodal_frame_sample",
    oracle=_FRAME_ORACLE,
    doc="Video-style frame sampling: every 4th 256-byte frame per "
    "payload fans out to its own row with a per-frame digest "
    "(mapInPandas 1->N row multiplication). The registered scope "
    "filters to payloads whose byte and char lengths agree (all docs "
    "in this corpus) so the SQL oracle can slice frames with VARCHAR "
    "substring — the kernel itself is byte-general; its multibyte "
    "behavior is covered by the pytest stride/digest contract.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.octet_length(F.encode(F.col("text"), "utf-8")) == F.length("text")
    )
    media = attach_fake_media(docs, "text", "doc_id")
    return sample_frames(media, frame_size=256, every_k=4, id_col="doc_id")


#: words per segment for the segment-level dedup rate
_SEG_WORDS = 8

_SEG_DEDUP_ORACLE = f"""
WITH segs AS (
  SELECT doc_id, unnest(
    list_transform(
      range(1, CAST((len(w) + {_SEG_WORDS - 1}) // {_SEG_WORDS} AS BIGINT) + 1),
      i -> array_to_string(list_slice(w, (i - 1) * {_SEG_WORDS} + 1, i * {_SEG_WORDS}), ' ')
    )
  ) AS seg
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
), counted AS (
  SELECT doc_id, seg, count(*) OVER (PARTITION BY seg) AS n_occ FROM segs
)
SELECT doc_id,
       count(*) AS n_segments,
       CAST(count_if(n_occ > 1) AS BIGINT) AS n_dup_segments,
       ROUND(CAST(count_if(n_occ > 1) AS DOUBLE) / count(*), 6) AS dup_rate
FROM counted
GROUP BY doc_id
"""


@register(
    "text_segment_dedup_rate",
    oracle=_SEG_DEDUP_ORACLE,
    doc="Segment-level duplication audit (the C4/RefinedWeb line-dedup "
    "primitive on token windows): each document splits into fixed "
    "8-word segments; a segment occurring more than once corpus-wide "
    "is boilerplate, and each doc reports its duplicated-segment "
    "count and rate. One shuffle partitions segments by content for "
    "the occurrence count (window, no join-back), one more rolls up "
    "per doc — linear at any scale, and the per-segment rows are "
    "what a removal pass would act on.",
)
def text_segment_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # NULL text segments to a single NULL row via explode_outer over a
    # NULL transform; the oracle's unnest-based relation never sees the
    # doc — filter to align (round-6 NULL-text probe pin)
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    nseg = F.expr(f"(size(split(trim(text), '[ \\\\t\\\\n\\\\r\\\\f]+')) + {_SEG_WORDS - 1}) div {_SEG_WORDS}")
    segs = d.select(
        "doc_id",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.concat_ws(
                    " ", F.slice(words, (i - 1) * _SEG_WORDS + 1, _SEG_WORDS)
                ),
            )
        ).alias("seg"),
    )
    counted = segs.withColumn(
        "n_occ", F.count(F.lit(1)).over(Window.partitionBy("seg"))
    )
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias(
            "n_dup_segments"
        ),
        F.round(
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


_SOURCE_OVERLAP_ORACLE = f"""
WITH segs AS (
  SELECT source, unnest(
    list_transform(
      range(1, CAST((len(w) + {_SEG_WORDS - 1}) // {_SEG_WORDS} AS BIGINT) + 1),
      i -> array_to_string(list_slice(w, (i - 1) * {_SEG_WORDS} + 1, i * {_SEG_WORDS}), ' ')
    )
  ) AS seg
  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS w FROM documents)
), ds AS (SELECT DISTINCT seg, source FROM segs)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_segments
FROM ds a JOIN ds b ON a.seg = b.seg AND a.source < b.source
GROUP BY a.source, b.source
"""


@register(
    "source_overlap_matrix",
    oracle=_SOURCE_OVERLAP_ORACLE,
    doc="Cross-source contamination matrix: for every source pair, the "
    "number of distinct 8-word segments both contain verbatim — the "
    "audit that catches one crawl replicating another (or shared "
    "boilerplate) BEFORE mixture weights treat them as independent. "
    "TWO shuffles total: one groupBy(segment) collects each segment's "
    "distinct source set (map-side partial agg; sources-per-segment "
    "is bounded by the source count, so the row stays tiny), the "
    "source pairs expand ROW-LOCALLY from that sorted set (no "
    "self-join — a seg-keyed self-join would re-shuffle both sides), "
    "and one rollup on the ~|sources|^2-bounded pair key. Linear at "
    "any corpus size.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text guard on BOTH sides: Spark's explode_outer would keep a
    # segment row for a NULL-text doc while the oracle's unnest emits
    # none — the same divergence class fixed in corpus_snapshot_diff
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    nseg = F.expr(
        f"(size(split(trim(text), '[ \\\\t\\\\n\\\\r\\\\f]+')) + {_SEG_WORDS - 1}) "
        f"div {_SEG_WORDS}"
    )
    segs = d.select(
        "source",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.concat_ws(
                    " ", F.slice(words, (i - 1) * _SEG_WORDS + 1, _SEG_WORDS)
                ),
            )
        ).alias("seg"),
    )
    per_seg = segs.groupBy("seg").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    srcs = F.col("srcs")
    pairs = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + F.lit(2), F.size(srcs)),
                lambda y: F.struct(
                    x.alias("source_a"), y.alias("source_b")
                ),
            ),
        )
    )
    return (
        per_seg.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_segments"))
    )


#: shard count for the deterministic training-shuffle assignment; a
#: production corpus picks this so each shard is loader-file sized
#: (e.g. ~1 GB), which also bounds the per-shard ordering window at
#: any corpus size — shard count, not corpus size, is the knob
_SHUFFLE_SHARDS = 64

#: Training-shuffle hash: a real avalanche hash (xxhash64 over the
#: domain-tagged id), NOT a multiplicative bucket — round-9
#: measurement showed the old shared-multiplier scheme made
#: shard % 4 EQUAL the quality-sample bucket % 4 for every document
#: (multiplicative hashes can never decorrelate power-of-2 residues;
#: see _WINNOW_SPLIT_BUCKET_SQL). Domain tag 2^45; doc ids below 2^44
#: keep tags disjoint. Spark evaluates F.xxhash64 natively; the
#: oracle replays the signed value via xxh64_long_sql (signedness
#: matters: shard = pmod and the position ORDER BY both read it).
_SHARD_HASH_OFFSET = 1 << 45

_SHARD_HASH_SQL = xxh64_long_sql(f"(doc_id + {_SHARD_HASH_OFFSET})")

_SHARD_SHUFFLE_ORACLE = f"""
WITH hashed AS MATERIALIZED (
  SELECT doc_id, {_SHARD_HASH_SQL} AS h FROM documents
)
SELECT doc_id,
       CAST(((h % {_SHUFFLE_SHARDS}) + {_SHUFFLE_SHARDS})
            % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY ((h % {_SHUFFLE_SHARDS}) + {_SHUFFLE_SHARDS})
                      % {_SHUFFLE_SHARDS}
         ORDER BY h, doc_id) AS BIGINT) AS position
FROM hashed
"""


@register(
    "shard_shuffle_assignment",
    oracle=_SHARD_SHUFFLE_ORACLE,
    doc="Deterministic global training shuffle: every document gets a "
    "(shard, position) from a multiplicative hash of its id — the "
    "reproducible corpus permutation a data loader consumes, "
    "re-materializable byte-identically on any engine (same contract "
    "as split_train_val_test; a domain-tagged xxhash64, genuinely "
    "independent of every split/sample bucket — see _SHARD_HASH_SQL). "
    "Row-local "
    "shard assignment, then ONE "
    "shuffle for the within-shard ordering window; the shard count is "
    "chosen so a shard is loader-file sized, which bounds the window "
    "partition at any corpus scale (same argument as the packing "
    "shard key).",
)
def shard_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    h = F.xxhash64(F.col("doc_id") + F.lit(_SHARD_HASH_OFFSET))
    shard = F.pmod(h, F.lit(_SHUFFLE_SHARDS)).cast("bigint")
    w = Window.partitionBy(shard).orderBy(h, F.col("doc_id"))
    return d.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )


_BOILERPLATE_ORACLE = f"""
WITH segs AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(w, (i - 1) * {_SEG_WORDS} + 1, i * {_SEG_WORDS}), ' ') AS seg
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       unnest(range(1, CAST((len(w) + {_SEG_WORDS - 1}) // {_SEG_WORDS} AS BIGINT) + 1)) AS t(i)
), counted AS (
  SELECT doc_id, pos, seg, count(*) OVER (PARTITION BY seg) AS n_occ FROM segs
)
SELECT doc_id,
       COALESCE(array_to_string(list(seg ORDER BY pos) FILTER (n_occ = 1), ' '), '')
         AS clean_text,
       CAST(count_if(n_occ > 1) AS BIGINT) AS n_removed
FROM counted
GROUP BY doc_id
"""


@register(
    "text_remove_boilerplate",
    oracle=_BOILERPLATE_ORACLE,
    doc="The removal half of the segment-dedup pair: rebuild each "
    "document keeping only its globally-unique 8-word segments in "
    "original order (corpus-wide boilerplate drops out, as C4 drops "
    "repeated lines). Same two-shuffle shape as the audit — a "
    "content-partitioned window for occurrence counts, then an "
    "order-preserving per-doc reassembly via sort-by-position "
    "collect — and the output is the cleaned corpus a training run "
    "would actually consume.",
)
def text_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # same NULL-text pin as text_segment_dedup_rate: a NULL text has no
    # segments to clean and the oracle never emits it
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    nseg = F.expr(
        f"(size(split(trim(text), '[ \\\\t\\\\n\\\\r\\\\f]+')) + {_SEG_WORDS - 1}) div {_SEG_WORDS}"
    )
    segs = d.select(
        "doc_id",
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.concat_ws(
                    " ", F.slice(words, (i - 1) * _SEG_WORDS + 1, _SEG_WORDS)
                ),
            )
        ).alias("pos", "seg"),
    )
    counted = segs.withColumn(
        "n_occ", F.count(F.lit(1)).over(Window.partitionBy("seg"))
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                F.col("n_occ") == 1, F.struct("pos", "seg")
            )
        )
    )
    return counted.groupBy("doc_id").agg(
        F.concat_ws(
            " ", F.transform(kept, lambda s: s.seg)
        ).alias("clean_text"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_removed"),
    )


_EDJOIN_ORACLE = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= 3
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@register(
    "dedup_edit_distance_prefix",
    oracle=_EDJOIN_ORACLE,
    doc="Exact CORPUS-WIDE edit-distance join (d<=3) via q-gram prefix "
    "filtering (Ed-Join, Xiao et al. VLDB'08): one edit disturbs at "
    "most q grams, so matching pairs must share a gram among each "
    "side's d*q+1 rarest grams and differ in length by at most d — "
    "the scale-correct replacement for (brand, size) blocking (the "
    "old verifier-tier quadratic, retired in round 5), finding cross-"
    "block matches that blocking misses with zero recall loss. The "
    "naive quadratic itself, so the green row certifies completeness; "
    "tests/test_llm_operators.py pins candidate pruning.",
)
def dedup_edit_distance_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.dedup import qgram_prefix_edit_pairs

    p = table(spark, sf_dir, "part")
    return qgram_prefix_edit_pairs(
        p, "p_partkey", "p_name", max_dist=3, q=2
    )


_EDJOIN_SPARSE_ORACLE = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       a.s_name AS name_a, b.s_name AS name_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND abs(length(a.s_name) - length(b.s_name)) <= 2
WHERE levenshtein(a.s_name, b.s_name) <= 2
"""


@register(
    "dedup_edit_distance_prefix_sparse",
    oracle=_EDJOIN_SPARSE_ORACLE,
    doc="Ed-Join on a SPARSE key (supplier names, d<=2): the same "
    "q-gram prefix filter as dedup_edit_distance_prefix, but on a key "
    "whose true match set is small relative to n^2 (each name has a "
    "bounded digit-neighborhood), so the naive-quadratic ORACLE is "
    "cheap at every SF and the exact-join family is oracle-green at "
    "sf0.001/0.01/0.1 alike — the part-name variant's oracle is "
    "output-bound at sf0.1 because TPC-H p_name makes the true d<=3 "
    "result quadratic-dense (NOTES.md), which is a property of that "
    "key's distribution, not of the operator.",
)
def dedup_edit_distance_prefix_sparse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from rabbithole_spark.operators.dedup import qgram_prefix_edit_pairs

    s = table(spark, sf_dir, "supplier")
    return qgram_prefix_edit_pairs(
        s, "s_suppkey", "s_name", max_dist=2, q=2
    )


_TOP_NGRAMS_ORACLE = r"""
WITH w AS (SELECT string_split_regex(trim(text), '\s+') AS words FROM documents),
b AS (SELECT unnest(list_transform(range(1, len(words)),
                                   i -> words[i] || ' ' || words[i+1])) AS ngram
      FROM w WHERE len(words) >= 2)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
"""


@register(
    "text_top_ngrams",
    oracle=_TOP_NGRAMS_ORACLE,
    doc="Corpus heavy hitters: top-20 word bigrams by frequency. "
    "Explode-then-count is one partially-aggregated shuffle on the "
    "ngram key; the deterministic (count desc, ngram) tiebreak makes "
    "the top-k boundary stable across engines. The vocabulary-stats "
    "primitive of a training-data pipeline.",
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    words = F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
    )
    return (
        d.filter(F.size(words) >= 2)
        .select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(20)
    )


_CENTROIDS_ORACLE = """
SELECT label, pos, ROUND(AVG(val), 6) AS avg_val,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM (SELECT label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) - 1 AS pos FROM embeddings)
GROUP BY label, pos
"""


@register(
    "embedding_centroids",
    oracle=_CENTROIDS_ORACLE,
    doc="Per-label element-wise centroid of the embedding column "
    "(posexplode -> groupBy(label, pos) -> avg): the k-means update "
    "step IVF index training runs at scale. Partial aggregation "
    "shrinks the shuffle to labels x dims rows regardless of corpus "
    "size; n_vectors is carried for the weighted re-average a "
    "multi-round trainer needs.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("val"), 6).alias("avg_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
    )


_TFIDF_ORACLE = r"""
WITH tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents)
  GROUP BY doc_id, word
), dfreq AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df, n.n_docs,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word, tfidf, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
      FROM scored)
WHERE rank <= 5
"""


@register(
    "text_tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc="TF-IDF: top-5 terms per document. One tokenization pass feeds "
    "both aggregates (document frequency is count-of-rows over the "
    "already-grouped tf relation, not a second corpus scan); the "
    "corpus size joins in as a broadcast scalar, and the vocabulary "
    "join shuffles on the word key. Rounding before the rank ORDER BY "
    "keeps the top-k boundary identical across engines.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("word"),
    )
    # localCheckpoint: dfreq and the scoring join both consume tf; an
    # un-materialized tf would re-run scan+explode+agg per branch
    # (NOTES.md lesson 9). Persisting the (doc, word, tf) relation is
    # the standard TF-IDF trade at any scale.
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "word", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


_BM25_ORACLE = r"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM words GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM words
  WHERE word IN ('spark', 'join', 'vector') GROUP BY doc_id, word
), dfreq AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), scored AS (
  SELECT tf.doc_id,
         sum(ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 10
"""


@register(
    "text_bm25_ranking",
    oracle=_BM25_ORACLE,
    doc="BM25 (k1=1.2, b=0.75, Lucene +1 idf) top-10 documents for the "
    "query {spark, join, vector}. One tokenization pass, one doc-keyed "
    "shuffle: per-term frequencies are conditional counts inside the "
    "doc-length aggregation (the query term set is small and fixed), "
    "unpivoted with stack(); corpus stats (N, avgdl) come from a "
    "row-local size(split()) — no explode, no shuffle. The tiny "
    "per-doc relation is localCheckpoint'd so the dfreq broadcast and "
    "the scoring join share one materialization instead of "
    "re-tokenizing the corpus per branch. Rounding before the final "
    "ORDER BY pins the top-k boundary across engines.",
)
def text_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scores(spark, sf_dir, ["spark", "join", "vector"])
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


def _bm25_scores(
    spark: SparkSession, sf_dir: str, terms: list[str]
) -> DataFrame:
    """(doc_id, bm25) for every document matching >=1 query term —
    the scoring core of text_bm25_ranking, shared with the hybrid
    RRF fusion query. bm25 is rounded to 6 BEFORE any ranking so
    rank boundaries replay identically across engines."""
    k1, b = 1.2, 0.75
    # no spread(): shuffling full text bytes costs ~3x the tokenize
    # (measured sf0.1); the parquet split already parallelizes the scan
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")).alias("word"),
    )
    per_doc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("word") == t).cast("long")).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).localCheckpoint(eager=False)
    stats = d.agg(
        # count(text), not count(*): the oracle's corpus stats derive
        # from the tokenized relation, which a NULL text never reaches
        # (round-6 NULL-text probe pin); avg already skips NULLs
        F.count("text").alias("n_docs"),
        F.avg(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"))
        ).alias("avgdl"),
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.stack(
            F.lit(len(terms)),
            *[
                x
                for i, t in enumerate(terms)
                for x in (F.lit(t), F.col(f"__tf_{i}"))
            ],
        ).alias("word", "tf"),
    ).filter(F.col("tf") > 0)
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")  # dl rides along in tf
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return scored


#: RRF constant (Cormack et al. 2009's k=60) and per-leg pool depth
_RRF_K = 60
_RRF_POOL = 20

_RRF_ORACLE = rf"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
  FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM words GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM words
  WHERE word IN ('spark', 'join', 'vector') GROUP BY doc_id, word
), dfreq AS (
  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
), lex_scored AS (
  SELECT tf.doc_id,
         round(sum(ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))), 6) AS bm25
  FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
), lex_rank AS (
  SELECT doc_id, lex_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
    FROM lex_scored
  ) WHERE lex_rank <= {_RRF_POOL}
), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vec_scored AS (
  SELECT vec_id,
         round(
           list_aggregate(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                  i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))),
           6) AS cosine_sim
  FROM embeddings, q
  -- malformed-vector exclusion: same pin as similarity_topk_bruteforce
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), vec_rank AS (
  SELECT doc_id, vec_rank FROM (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY cosine_sim DESC, vec_id) AS vec_rank
    FROM vec_scored WHERE cosine_sim IS NOT NULL
  ) WHERE vec_rank <= {_RRF_POOL}
)
SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       CAST(l.lex_rank AS BIGINT) AS lex_rank,
       CAST(v.vec_rank AS BIGINT) AS vec_rank,
       ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + l.lex_rank), 0.0)
             + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + v.vec_rank), 0.0),
             6) AS rrf_score
FROM lex_rank l FULL OUTER JOIN vec_rank v ON l.doc_id = v.doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@register(
    "retrieval_hybrid_rrf",
    oracle=_RRF_ORACLE,
    doc="Hybrid retrieval with reciprocal-rank fusion (Cormack et al. "
    "2009, k=60): the BM25 lexical leg (query {spark, join, vector}) "
    "and the cosine vector leg (query vec_id=0; doc_id = vec_id in "
    "this corpus) each produce a deterministic top-20, and the legs "
    "fuse on rank alone — 1/(60+r) per leg, score-scale-free, which "
    "is why RRF is the standard fusion for hybrid search. Scale "
    "shape: each leg ends in TakeOrderedAndProject (per-partition "
    "top-k, never a global sort of the corpus), so the only rows that "
    "reach the rank windows and the full-outer fusion join are the "
    "2x20 pooled rows — both windows and the join are bounded by the "
    "pool constant, not the corpus. Ranks round their leg scores to "
    "6dp first so the rank boundary replays identically in the "
    "oracle.",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lex_top = (
        _bm25_scores(spark, sf_dir, ["spark", "join", "vector"])
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    # rank windows run AFTER the limit: ordering a <=20-row relation
    # on one task is the bounded-pool pattern (same as the MMR pool)
    lex_rank = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .cast("bigint")
        .alias("lex_rank"),
    )
    qv = _query_vector(spark, sf_dir)
    vec_top = cosine_topk(
        table(spark, sf_dir, "embeddings"),
        "embedding",
        qv,
        k=_RRF_POOL,
        id_cols=["vec_id"],
    )
    vec_rank = vec_top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cosine_sim").desc(), "vec_id"))
        .cast("bigint")
        .alias("vec_rank"),
    )
    fused = lex_rank.join(vec_rank, "doc_id", "full_outer")
    leg = lambda rank_col: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(rank_col)), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            F.round(leg("lex_rank") + leg("vec_rank"), 6).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(10)
    )


# --- random projection (Johnson-Lindenstrauss dim reduction) -------------------

_PROJ_IN_DIM = 64
_PROJ_OUT_DIM = 16


def _proj_sign(i: int, j: int) -> float:
    """Deterministic ±1 for input dim i / output dim j: parity of a
    mid bit of a mixed multiplicative hash (Knuth × xxhash-prime2
    multipliers). Computed ONCE in Python and embedded as literals in
    BOTH the Spark plan and the oracle SQL — the engines never hash."""
    h = (i * 2654435761 + j * 2246822519) % 4294967296
    return 1.0 if (h >> 16) & 1 == 0 else -1.0


_PROJ_SIGNS = [
    [_proj_sign(i, j) for i in range(_PROJ_IN_DIM)]
    for j in range(_PROJ_OUT_DIM)
]


def _proj_oracle() -> str:
    dims = []
    for j, signs in enumerate(_PROJ_SIGNS):
        lits = ", ".join(str(s) for s in signs)
        # + 0.0 folds IEEE signed zeros: a tiny negative fold sum
        # rounds to -0.0 here where Spark's BigDecimal round yields
        # +0.0 (caught by the NULL-fixture probe on a planted vector)
        dims.append(
            f"round(list_aggregate(list_transform("
            f"range(1, {_PROJ_IN_DIM} + 1),"
            f" i -> CAST(embedding[i] AS DOUBLE) * ([{lits}])[i]),"
            f" 'sum') / {float(_PROJ_OUT_DIM) ** 0.5}, 6) + 0.0"
            f" AS p{j:02d}"
        )
    cols = ",\n       ".join(dims)
    return f"""
SELECT vec_id, label,
       {cols}
FROM embeddings
-- same malformed-vector pin as the other embedding oracles, plus the
-- dimensionality guard the sign matrix is sized for
WHERE {_valid_embedding_sql(require_norm=False)}
  AND len(embedding) = {_PROJ_IN_DIM}
"""


@register(
    "embedding_random_projection",
    oracle=_proj_oracle(),
    doc="Johnson-Lindenstrauss random projection 64d -> 16d with a "
    "deterministic ±1 sign matrix (Achlioptas 2003: sign matrices "
    "match Gaussian JL guarantees), scaled by 1/sqrt(16) so expected "
    "norms are preserved — the dim-reduction front end for LSH/IVF "
    "indexing at 100 TB. The sign matrix is generated once in Python; "
    "the oracle replays it term-for-term as literals. Scale shape: "
    "the matrix ships as a ONE-row broadcast array<array<double>> "
    "(BroadcastNestedLoopJoin of a single local row) and all 16 "
    "projections compute inside ONE transform lambda over it — O(1) "
    "plan size in the output dimension and a single codegen unit, "
    "where the earlier literal formulation inlined 16 independent "
    "fold expressions that each compiled (the same plan-size/codegen "
    "class the round-9 bcast screen twins measured 3-4x faster; the "
    "projection array is materialized in its own projection so the 16 "
    "column extracts reference it once — CollapseProject keeps "
    "non-cheap multi-referenced aliases in place, pinned by "
    "tests/test_scale_plans.py). Corpus side: a pure scan-side map, "
    "zero shuffles, one ordered fold per output dim over "
    "zip_with(embedding, signs); malformed vectors (NULL / NULL "
    "element) and off-dimension vectors are excluded by the shared "
    "valid_embeddings contract + an explicit length guard on both "
    "engines.",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = valid_embeddings(
        table(spark, sf_dir, "embeddings"), require_norm=False
    ).filter(F.size("embedding") == _PROJ_IN_DIM)
    scale = float(_PROJ_OUT_DIM) ** 0.5
    signs = spark.createDataFrame(
        [(list(_PROJ_SIGNS),)], "signs array<array<double>>"
    )
    # One lambda computes every output dim; arithmetic is identical to
    # the oracle's per-dim fold (zip_with product, sequential sum fold,
    # round 6, + 0.0 signed-zero fold — see _proj_oracle).
    proj = F.transform(
        F.col("signs"),
        lambda srow: F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    srow,
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / scale,
            6,
        )
        + F.lit(0.0),
    )
    return (
        e.join(F.broadcast(signs))
        .select("vec_id", "label", proj.alias("proj"))
        .select(
            "vec_id",
            "label",
            *[
                F.col("proj")[j].alias(f"p{j:02d}")
                for j in range(_PROJ_OUT_DIM)
            ],
        )
    )


# --- semantic contamination screening ------------------------------------------

_SEMCON_N_BENCH = 16
_SEMCON_TOPK = 20

_SEMCON_ORACLE = f"""
WITH b AS (
  SELECT vec_id AS bench_id, embedding AS be
  FROM embeddings
  WHERE vec_id < {_SEMCON_N_BENCH} AND {_valid_embedding_sql()}
), scored AS (
  SELECT e.vec_id, e.label, b.bench_id,
         round(
           list_aggregate(list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(b.be[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(b.be) + 1),
                  i -> CAST(b.be[i] AS DOUBLE) * CAST(b.be[i] AS DOUBLE)), 'sum'))),
           6) AS sim
  FROM embeddings e, b
  WHERE e.vec_id >= {_SEMCON_N_BENCH} AND {_valid_embedding_sql("e.embedding")}
), nearest AS (
  SELECT vec_id, label, sim AS max_sim, bench_id AS nearest_bench
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, bench_id DESC
    ) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT vec_id, label, max_sim, nearest_bench
FROM nearest
ORDER BY max_sim DESC, vec_id
LIMIT {_SEMCON_TOPK}
"""


@register(
    "contamination_semantic_screen",
    oracle=_SEMCON_ORACLE,
    doc="Embedding-tier decontamination screening — the semantic tier "
    "above the n-gram (contamination_ngram_overlap) and fingerprint "
    "(contamination_winnow_overlap) tiers: against a held-out "
    f"benchmark set ({_SEMCON_N_BENCH} vectors), every corpus vector "
    "gets its max benchmark cosine and nearest benchmark id, and the "
    f"top-{_SEMCON_TOPK} closest matches surface for review (the "
    "triage list a decontamination pass acts on; paraphrased benchmark "
    "leakage has no n-gram overlap, which is why this tier exists). "
    "Scale shape: the benchmark set is a bounded driver collect "
    "embedded as plan literals (a broadcast join at real benchmark "
    "sizes); the per-vector argmax is a row-local array_max over "
    "(sim, bench_id) structs — lexicographic struct ordering IS the "
    "tie-break, replayed in the oracle as ORDER BY sim DESC, bench_id "
    "DESC — and the report is TakeOrderedAndProject: ZERO shuffles at "
    "any corpus size.",
)
def contamination_semantic_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine

    e = valid_embeddings(table(spark, sf_dir, "embeddings"))
    bench = (
        e.filter(F.col("vec_id") < _SEMCON_N_BENCH)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    if not bench:
        raise ValueError(
            f"no valid benchmark vectors (vec_id < {_SEMCON_N_BENCH}) "
            "in embeddings — corpus empty or malformed"
        )
    candidates = F.array(
        *[
            F.struct(
                F.round(
                    cosine(
                        F.col("embedding"),
                        F.array(*[F.lit(float(x)) for x in b.embedding]),
                    ),
                    6,
                ).alias("s"),
                F.lit(b.vec_id).cast("bigint").alias("b"),
            )
            for b in bench
        ]
    )
    best = F.array_max(candidates)
    return (
        e.filter(F.col("vec_id") >= _SEMCON_N_BENCH)
        .select(
            "vec_id",
            "label",
            best["s"].alias("max_sim"),
            best["b"].alias("nearest_bench"),
        )
        .orderBy(F.col("max_sim").desc(), "vec_id")
        .limit(_SEMCON_TOPK)
    )


def _bcast_sorted_struct_array(
    df: DataFrame, struct_col, alias: str, err_msg: str
) -> DataFrame:
    """ONE-row relation holding the sorted array-of-structs to be
    broadcast into a corpus scan — the shared scaffold of the round-9
    broadcast twins. collect_list over an empty relation is an empty
    array, which would silently yield NULL scores for every corpus
    row — raise at execution instead, matching the literal twins'
    empty-corpus contract (the broadcast build side always
    materializes, so the raise fires even when the probe side is also
    empty). sort_array makes the nondeterministic collect_list order
    deterministic (struct field 0 is a unique id on both callers)."""
    return df.agg(
        F.sort_array(F.collect_list(struct_col)).alias(alias)
    ).select(
        F.when(F.size(alias) > 0, F.col(alias))
        .otherwise(F.raise_error(F.lit(err_msg)))
        .alias(alias)
    )


@register(
    "contamination_semantic_screen_bcast",
    oracle=_SEMCON_ORACLE,
    doc="Broadcast-join twin of contamination_semantic_screen (VERDICT "
    "r8): identical semantics and oracle, but the benchmark set stays "
    "a DataFrame — collapsed to ONE row holding a sorted "
    "array<struct(bench_id, embedding)> and broadcast into the corpus "
    "scan (BroadcastNestedLoopJoin of a single row), so plan size is "
    "O(1) regardless of benchmark-set size where the literal variant "
    "grows the plan linearly (its plan-size bomb at real benchmark "
    "sizes). The per-vector argmax is the same row-local array_max "
    "over (sim, bench_id) structs, now via transform over the "
    "broadcast array; report is TakeOrderedAndProject. The corpus "
    "side still never shuffles; the only exchange is the 16-row "
    "benchmark aggregate's. Twin equality is pinned by "
    "tests/test_llm_operators.py::test_semantic_screen_bcast_twin. "
    "An empty/malformed benchmark set raises at execution "
    "(distributed raise_error branch — same contract as the literal "
    "variant's driver-side ValueError). MEASURED FASTER than the "
    "literal twin at sf0.1 (cold 2.3 s vs 10.2, warm 1.8 vs 3.1): one "
    "transform lambda codegens once where the 16 inlined cosine "
    "expressions each compile — prefer this formulation at any scale.",
)
def contamination_semantic_screen_bcast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine

    e = valid_embeddings(table(spark, sf_dir, "embeddings"))
    bench = _bcast_sorted_struct_array(
        e.filter(F.col("vec_id") < _SEMCON_N_BENCH),
        F.struct(
            F.col("vec_id").cast("bigint").alias("b"),
            F.col("embedding").alias("be"),
        ),
        "bench",
        f"no valid benchmark vectors (vec_id < {_SEMCON_N_BENCH}) in "
        "embeddings — corpus empty or malformed",
    )
    cand = F.transform(
        F.col("bench"),
        lambda b: F.struct(
            F.round(cosine(F.col("embedding"), b["be"]), 6).alias("s"),
            b["b"].alias("b"),
        ),
    )
    best = F.array_max(cand)
    return (
        e.filter(F.col("vec_id") >= _SEMCON_N_BENCH)
        .join(F.broadcast(bench))
        .select(
            "vec_id",
            "label",
            best["s"].alias("max_sim"),
            best["b"].alias("nearest_bench"),
        )
        .orderBy(F.col("max_sim").desc(), "vec_id")
        .limit(_SEMCON_TOPK)
    )


# --- hard-negative mining (contrastive training data) --------------------------

_HARDNEG_N_ANCHORS = 8
_HARDNEG_K = 5
_HARDNEG_SHARDS = 64

_HARDNEG_ORACLE = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS ae
  FROM embeddings
  WHERE vec_id < {_HARDNEG_N_ANCHORS} AND {_valid_embedding_sql()}
), scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
         round(
           list_aggregate(list_transform(range(1, len(e.embedding) + 1),
             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.ae[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(a.ae) + 1),
                  i -> CAST(a.ae[i] AS DOUBLE) * CAST(a.ae[i] AS DOUBLE)), 'sum'))),
           6) AS cosine_sim
  FROM embeddings e, a
  -- malformed-vector pin, as in the other cosine oracles; the anchor
  -- row itself carries the anchor's label and is excluded by <>
  WHERE {_valid_embedding_sql("e.embedding")}
    AND e.label <> a.anchor_label
), ranked AS (
  SELECT anchor_id, anchor_label, vec_id, label, cosine_sim,
         row_number() OVER (
           PARTITION BY anchor_id ORDER BY cosine_sim DESC, vec_id
         ) AS rank
  FROM scored WHERE cosine_sim IS NOT NULL
)
SELECT CAST(anchor_id AS BIGINT) AS anchor_id, anchor_label,
       vec_id, label, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_HARDNEG_K}
"""


@register(
    "similarity_hard_negatives",
    oracle=_HARDNEG_ORACLE,
    doc="Hard-negative mining for contrastive training: for each of "
    f"{_HARDNEG_N_ANCHORS} anchor vectors, the top-{_HARDNEG_K} most "
    "cosine-similar corpus vectors with a DIFFERENT label — similar "
    "enough to be hard, labeled differently so they are negatives "
    "(the batch construction behind dense retrievers / SimCLR-style "
    "objectives). Scale shape: anchors are a bounded driver collect "
    "(N×dim floats) embedded as plan literals; the corpus scan emits "
    "N rows per vector via stack (a scan-side map, bounded ×N "
    "multiplier, no join); then EXACT distributed top-k in two "
    "phases — shard-local top-k per (anchor, pmod(vec_id, "
    f"{_HARDNEG_SHARDS})) bounds every sort partition, and the "
    "global re-rank per anchor sees only N×shards×k pre-filtered "
    "rows. Two-phase equals single-phase exactly (any global top-k "
    "row is in its shard's top-k), which is what the single-window "
    "oracle replays.",
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine

    e = valid_embeddings(table(spark, sf_dir, "embeddings"))
    anchors = (
        e.filter(F.col("vec_id") < _HARDNEG_N_ANCHORS)
        .select("vec_id", "label", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    if not anchors:
        raise ValueError(
            "no valid anchor vectors (vec_id < "
            f"{_HARDNEG_N_ANCHORS}) in embeddings — corpus empty or "
            "malformed"
        )
    stacked_args = []
    for a in anchors:
        q = F.array(*[F.lit(float(x)) for x in a.embedding])
        stacked_args.extend(
            [
                F.lit(a.vec_id).cast("bigint"),
                F.lit(a.label),
                F.round(cosine(F.col("embedding"), q), 6),
            ]
        )
    scored = e.select(
        "vec_id",
        "label",
        F.stack(F.lit(len(anchors)), *stacked_args).alias(
            "anchor_id", "anchor_label", "cosine_sim"
        ),
    ).filter(
        F.col("cosine_sim").isNotNull()
        & (F.col("label") != F.col("anchor_label"))
    )
    return _hardneg_two_phase_topk(scored)


def _hardneg_two_phase_topk(scored: DataFrame) -> DataFrame:
    """The shared exact two-phase distributed top-k tail: shard-local
    top-k per (anchor, pmod(vec_id, shards)) bounds every sort
    partition, then a bounded global re-rank per anchor (see
    similarity_hard_negatives' docstring for the equality argument).
    ``scored`` carries (vec_id, label, anchor_id, anchor_label,
    cosine_sim) with NULL sims and same-label rows already dropped."""
    from pyspark.sql import Window

    w_local = Window.partitionBy("anchor_id", "shard").orderBy(
        F.col("cosine_sim").desc(), "vec_id"
    )
    w_global = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine_sim").desc(), "vec_id"
    )
    return (
        scored.withColumn(
            "shard", F.pmod(F.col("vec_id"), F.lit(_HARDNEG_SHARDS))
        )
        .withColumn("r_local", F.row_number().over(w_local))
        .filter(F.col("r_local") <= _HARDNEG_K)
        .withColumn("rank", F.row_number().over(w_global).cast("bigint"))
        .filter(F.col("rank") <= _HARDNEG_K)
        .select(
            "anchor_id",
            "anchor_label",
            "vec_id",
            "label",
            "cosine_sim",
            "rank",
        )
    )


@register(
    "similarity_hard_negatives_bcast",
    oracle=_HARDNEG_ORACLE,
    doc="Broadcast-join twin of similarity_hard_negatives (VERDICT "
    "r8): identical semantics and oracle, but the anchor set stays a "
    "DataFrame — collapsed to ONE row holding a sorted "
    "array<struct(anchor_id, anchor_label, embedding)> and broadcast "
    "into the corpus scan, so plan size is O(1) in the anchor count "
    "where the literal variant's stack() grows the plan linearly. "
    "Per-corpus-row anchor scoring is transform + explode_outer over "
    "the broadcast array (explode_outer so the optimizer cannot "
    "re-run the generator input below the exchange — NOTES lesson 2); "
    "the exact two-phase distributed top-k tail is shared code with "
    "the literal variant. Twin equality is pinned by tests/"
    "test_llm_operators.py::test_hard_negatives_bcast_twin. An empty "
    "anchor set raises at execution (distributed raise_error branch). "
    "MEASURED FASTER than the literal stack() twin at sf0.1 (cold "
    "1.4 s vs 3.1, warm 1.3 vs 2.2) — the transform lambda compiles "
    "once vs 8 inlined cosine expressions.",
)
def similarity_hard_negatives_bcast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from rabbithole_spark.operators.similarity import cosine

    e = valid_embeddings(table(spark, sf_dir, "embeddings"))
    anchors = _bcast_sorted_struct_array(
        e.filter(F.col("vec_id") < _HARDNEG_N_ANCHORS),
        F.struct(
            F.col("vec_id").cast("bigint").alias("aid"),
            F.col("label").alias("alabel"),
            F.col("embedding").alias("ae"),
        ),
        "anchors",
        f"no valid anchor vectors (vec_id < {_HARDNEG_N_ANCHORS}) in "
        "embeddings — corpus empty or malformed",
    )
    per_anchor = F.transform(
        F.col("anchors"),
        lambda a: F.struct(
            a["aid"].alias("anchor_id"),
            a["alabel"].alias("anchor_label"),
            F.round(cosine(F.col("embedding"), a["ae"]), 6).alias(
                "cosine_sim"
            ),
        ),
    )
    scored = (
        e.join(F.broadcast(anchors))
        .select(
            "vec_id",
            "label",
            F.explode_outer(per_anchor).alias("p"),
        )
        .select(
            "vec_id", "label", "p.anchor_id", "p.anchor_label", "p.cosine_sim"
        )
        .filter(
            F.col("cosine_sim").isNotNull()
            & (F.col("label") != F.col("anchor_label"))
        )
    )
    return _hardneg_two_phase_topk(scored)


_VALID_EMB_SQL = _valid_embedding_sql()

_QUANTIZED_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qq AS (
  SELECT qe,
         CASE WHEN sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum')) = 0
              THEN 1.0
              ELSE sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))
         END AS qnrm
  FROM q
),
b AS (
  SELECT vec_id, label, embedding,
         sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
           AS nrm
  FROM embeddings
  -- malformed-vector exclusion (round-7 pin): a NULL-element vector
  -- would rank here via NULL-skipping list_aggregate but sink to a
  -- NULL dot in Spark; a zero-norm vector has no direction to rank
  WHERE {_VALID_EMB_SQL}
),
scored AS (
  SELECT b.vec_id, b.label,
         CAST(list_aggregate(list_transform(range(1, len(b.embedding) + 1),
           i -> CAST(CASE WHEN b.nrm = 0 THEN 0
                          ELSE round(CAST(b.embedding[i] AS DOUBLE) / b.nrm * 127)
                     END AS BIGINT)
                * CAST(round(127 * CAST(qq.qe[i] AS DOUBLE) / qq.qnrm) AS BIGINT)),
           'sum') AS BIGINT) AS q_dot
  FROM b, qq
)
SELECT vec_id, label, q_dot,
       round(CAST(q_dot AS DOUBLE) / 16129.0, 6) AS approx_cosine
FROM scored
ORDER BY q_dot DESC, vec_id, label
LIMIT 10
"""


@register(
    "similarity_ann_quantized",
    oracle=_QUANTIZED_ORACLE,
    doc="int8-quantized top-10 cosine neighbors of vec_id=0: unit-"
    "normalize, quantize to tinyint (4x smaller than float32), rank "
    "by exact integer dot product. The memory-bandwidth lever for "
    "billion-vector stores. Quantization is deterministic arithmetic, "
    "so the SQL oracle replicates it term-for-term (same float op "
    "order per side); recall vs the float baseline is asserted in "
    "tests/test_llm_operators.py.",
)
def similarity_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import (
        quantized_topk,
        valid_embeddings,
    )

    qv = _query_vector(spark, sf_dir)
    # same malformed-vector exclusion as the oracle's b CTE
    emb = valid_embeddings(table(spark, sf_dir, "embeddings"))
    return quantized_topk(
        emb,
        "embedding",
        qv,
        k=10,
        id_cols=["vec_id", "label"],
    )


_PII_REDACTION_ORACLE = """
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text_pii
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text_pii,
            '[a-z0-9._]+@[a-z0-9-]+\\.[a-z]+')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text_pii,
            '\\+1-555-[0-9]+')) AS INTEGER) AS n_phones,
       CAST(length(regexp_replace(regexp_replace(text_pii,
            '[a-z0-9._]+@[a-z0-9-]+\\.[a-z]+', '[EMAIL]', 'g'),
            '\\+1-555-[0-9]+', '[PHONE]', 'g')) AS INTEGER) AS redacted_len,
       NOT regexp_matches(regexp_replace(regexp_replace(text_pii,
            '[a-z0-9._]+@[a-z0-9-]+\\.[a-z]+', '[EMAIL]', 'g'),
            '\\+1-555-[0-9]+', '[PHONE]', 'g'), '@|\\+1-555') AS clean
FROM pii
"""


@register(
    "pii_redaction",
    oracle=_PII_REDACTION_ORACLE,
    doc="PII scrubbing (curation-pipeline parity): regexp redaction of "
    "email/phone patterns with match counts and a post-hoc 'clean' "
    "audit flag. The synthetic corpus carries no PII, so each doc is "
    "first suffixed with a deterministic fake email+phone derived "
    "from doc_id — the redaction path (regexp_count + chained "
    "regexp_replace, all JVM-side codegen, no UDF) is what scales to "
    "100 TB; patterns are row-local so the op is embarrassingly "
    "parallel with zero shuffle.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    email = r"[a-z0-9._]+@[a-z0-9-]+\.[a-z]+"
    phone = r"\+1-555-[0-9]+"
    d = spread(table(spark, sf_dir, "documents"))
    text_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(text_pii, email, "[EMAIL]"), phone, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.regexp_count(text_pii, F.lit(email)).cast("int").alias("n_emails"),
        F.regexp_count(text_pii, F.lit(phone)).cast("int").alias("n_phones"),
        F.length(redacted).cast("int").alias("redacted_len"),
        (~redacted.rlike(r"@|\+1-555")).alias("clean"),
    )


_CONTAMINATION_ORACLE = """
WITH words AS (
  SELECT doc_id, source,
         string_split_regex(trim(text), '\\s+') AS w
  FROM documents
), sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 1) + 1),
           i -> array_to_string(list_slice(w, i, i + 2), ' ')
         ))) AS sh
  FROM words
), bench AS (
  SELECT DISTINCT sh FROM sh WHERE source = 'src0'
), corpus AS (
  SELECT doc_id, sh FROM sh WHERE source <> 'src0'
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
  FROM corpus GROUP BY doc_id
), hit AS (
  SELECT corpus.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM corpus JOIN bench USING (sh) GROUP BY corpus.doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       ROUND(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS contamination
FROM tot JOIN hit USING (doc_id)
"""


@register(
    "contamination_ngram_overlap",
    oracle=_CONTAMINATION_ORACLE,
    doc="Benchmark-contamination detection: 3-gram shingle overlap of "
    "every corpus document against the held-out set (source=src0), "
    "reported as an overlap rate. The benchmark shingle set is tiny "
    "relative to the corpus, so it BROADCASTS — the corpus-side scan "
    "never shuffles on content, only the per-doc count aggregation "
    "moves data. This is the decontamination step every training "
    "pipeline runs against eval suites.",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread() pays here (unlike text_bm25_ranking): the 3-gram window
    # concat is CPU-heavy enough that full-width parallelism beats the
    # one-time text-bytes shuffle (measured 3.1s -> 1.3s warm at sf0.1)
    d = spread(table(spark, sf_dir, "documents"))
    # benchmark side: the held-out source is selected AT THE SCAN
    # (predicate pushdown) before any shingling, and its distinct
    # shingle set is small -> broadcast
    bench = (
        d.filter((F.col("source") == "src0") & F.col("text").isNotNull())
        .select(F.explode_outer(word_shingles(F.col("text"), 3)).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # corpus side: ONE shingling pass; overlap is a broadcast left-join
    # marker folded into the same per-doc aggregation as the total, so
    # the corpus is never scanned or exploded twice
    corpus = d.filter(
        (F.col("source") != "src0") & F.col("text").isNotNull()
    ).select(
        "doc_id", F.explode_outer(word_shingles(F.col("text"), 3)).alias("sh")
    )
    return (
        corpus.join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
        )
        .filter(F.col("n_overlap") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
    )


_REPETITION_ORACLE = """
WITH wc AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents)
  GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(count(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio,
       ROUND(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share,
       (CAST(count(*) AS DOUBLE) / sum(c)) < 0.25 AS repetitive
FROM wc
GROUP BY doc_id
"""


@register(
    "text_repetition_filter",
    oracle=_REPETITION_ORACLE,
    doc="Repetition-based quality scoring: per-document distinct-word "
    "ratio and top-word share (the cheap proxies for boilerplate / "
    "degenerate text that curation pipelines threshold on). One "
    "tokenize pass, two stacked aggregations with map-side combine; "
    "per-doc cardinality is bounded by vocabulary, so the shuffle "
    "carries (doc, word) counts, never raw tokens.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    wc = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_share"),
        ((F.count(F.lit(1)) / F.sum("c")) < 0.25).alias("repetitive"),
    )


_MIXTURE_ORACLE = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents
), rates AS (
  SELECT lang, n_lang,
         least(1.0, 0.2 * n_total / n_lang) AS rate
  FROM counts CROSS JOIN total
)
SELECT d.lang,
       CAST(max(r.n_lang) AS BIGINT) AS n_lang,
       ROUND(max(r.rate), 6) AS rate,
       CAST(count(*) FILTER (WHERE d.doc_id % 10000
            < CAST(floor(r.rate * 10000) AS BIGINT)) AS BIGINT) AS n_kept
FROM documents d JOIN rates r USING (lang)
GROUP BY d.lang
"""


@register(
    "mixture_resample_by_lang",
    oracle=_MIXTURE_ORACLE,
    doc="Deterministic mixture rebalancing: compute per-language "
    "acceptance rates toward a uniform 20% target share, then select "
    "rows by a doc_id modulus (hash-free, replayable, no RNG state) "
    "— how a pipeline downsamples over-represented languages to hit "
    "a target training mixture. Rates derive from two tiny broadcast "
    "aggregates; the selection predicate is row-local.",
)
def mixture_resample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_lang",
        F.least(F.lit(1.0), 0.2 * F.col("n_total") / F.col("n_lang")).alias(
            "rate"
        ),
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.max("n_lang").alias("n_lang"),
            F.round(F.max("rate"), 6).alias("rate"),
            F.sum(
                F.when(
                    F.col("doc_id") % 10000
                    < F.floor(F.col("rate") * 10000).cast("bigint"),
                    1,
                ).otherwise(0)
            ).alias("n_kept"),
        )
    )


_KMEANS_K = 10
_KMEANS_ITERS = 4


#: NULL-vector exclusion for the k-means fit/assign input. Without it
#: the oracle's first-k-by-id seeding takes NULL-embedding rows as
#: centroids (Spark's lloyd_init_first_k skips None), and a NULL row's
#: assignment diverges (all-NULL distances order NULLS LAST in DuckDB
#: -> cluster 0, but fold to a NULL cluster in Spark) — the same
#: latent-divergence class the round-7 advice pinned for SemDeDup.
#: Zero-norm vectors stay: squared-L2 geometry is well-defined for
#: them (unlike cosine, so this is deliberately weaker than
#: _SEMDEDUP_FIT_WHERE).
_KMEANS_FIT_WHERE = _valid_embedding_sql(require_norm=False)


def _kmeans_oracle() -> str:
    """DuckDB twin of the k-means rollup: replays the deterministic
    Lloyd loop over the NULL-excluded corpus (same first-k-by-id
    seeding and unrolled updates the IVF quantizer oracle uses),
    assigns every vector to its nearest final centroid, and aggregates
    cluster size + mean within-cluster squared distance. Cluster
    memberships are integers separated by distance gaps far above
    cross-engine float noise; dist2 is rounded per row and again after
    the mean on both sides, so the hash-compare is stable."""
    k, iters = _KMEANS_K, _KMEANS_ITERS
    ctes, prev = _lloyd_replay_ctes(k, iters, _KMEANS_FIT_WHERE)
    d2 = _sq_l2_sql("f.e", "c.c")
    ctes.append(
        f"af AS (SELECT vec_id, cluster, d2 FROM (\n"
        f"  SELECT f.vec_id, c.cluster, {d2} AS d2,\n"
        f"         row_number() OVER (PARTITION BY f.vec_id ORDER BY\n"
        f"           {d2}, c.cluster) AS rn\n"
        f"  FROM fit f CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    with_sql = "WITH " + ",\n".join(ctes)
    return f"""{with_sql}
SELECT cluster,
       count(*) AS n_vectors,
       ROUND(AVG(ROUND(d2, 6)), 6) AS avg_dist2
FROM af
GROUP BY cluster
"""


@register(
    "similarity_kmeans_clusters",
    oracle=_kmeans_oracle(),
    doc="Semantic clustering of the embedding corpus: deterministic "
    "Lloyd's k-means (k=10, 4 iterations), per-iteration cost = one "
    "assignment scan against literal (broadcast-pattern) centroids + "
    "one (cluster, pos) update aggregation; cluster sizes and mean "
    "within-cluster squared distance reported per cluster. The "
    "training loop of an IVF index and the grouping step of "
    "semantic dedup. Deterministic by construction (first-k-by-id "
    "init, fixed iterations), so the whole iterative loop is "
    "oracle-replayed in SQL rather than rows-counted; label purity "
    "is additionally asserted in tests/test_llm_operators.py.",
)
def similarity_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import (
        kmeans_fit_assign,
        valid_embeddings,
    )

    # same NULL-vector exclusion as _KMEANS_FIT_WHERE (a NULL or
    # NULL-element vector has no position, so it can neither seed a
    # centroid nor be assigned a cell)
    emb = valid_embeddings(
        table(spark, sf_dir, "embeddings"), require_norm=False
    )
    assigned = kmeans_fit_assign(
        emb,
        "embedding",
        ["vec_id"],
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("dist2"), 6).alias("avg_dist2"),
    )


_SEMDEDUP_TAU = 0.35

#: malformed-vector exclusion for the SemDeDup fit/assign input — the
#: same triple the top-k oracles pin (NULL vector, NULL element,
#: zero norm). Without it the oracle's raw dot/(sqrt*sqrt) yields NaN
#: on zero-norm vectors (and DuckDB max() ranks NaN above reals) while
#: the Spark side's cosine() guard returns NULL, which F.max ignores —
#: a latent divergence on malformed corpora (round-7 advice pin).
_SEMDEDUP_FIT_WHERE = _valid_embedding_sql()


def _semdedup_oracle() -> str:
    """DuckDB twin of the SemDeDup query: replay the deterministic
    Lloyd assignment (same CTEs as the k-means oracle) over the
    malformed-vector-excluded corpus, then the within-cluster
    pairwise max-cosine-to-a-lower-id and the threshold flag. Cosine
    uses the identical sequential-fold / sqrt-product expression
    shape as the Spark side, rounded to 6 AFTER the max on both
    engines."""
    k, iters = _KMEANS_K, _KMEANS_ITERS
    ctes, prev = _lloyd_replay_ctes(k, iters, _SEMDEDUP_FIT_WHERE)
    d2 = _sq_l2_sql("f.e", "c.c")
    ctes.append(
        f"af AS (SELECT vec_id, e, cluster FROM (\n"
        f"  SELECT f.vec_id, f.e, c.cluster,\n"
        f"         row_number() OVER (PARTITION BY f.vec_id ORDER BY\n"
        f"           {d2}, c.cluster) AS rn\n"
        f"  FROM fit f CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    cos = (
        f"{_dot_sql('a.e', 'b.e')} / "
        f"(sqrt({_dot_sql('a.e', 'a.e')}) * sqrt({_dot_sql('b.e', 'b.e')}))"
    )
    ctes.append(
        f"pairs AS (SELECT a.vec_id, round(max({cos}), 6) AS max_lower_sim\n"
        f"  FROM af a JOIN af b\n"
        f"    ON a.cluster = b.cluster AND b.vec_id < a.vec_id\n"
        f"  GROUP BY a.vec_id)"
    )
    with_sql = "WITH " + ",\n".join(ctes)
    return f"""{with_sql}
SELECT af.vec_id, af.cluster, p.max_lower_sim,
       coalesce(p.max_lower_sim >= {_SEMDEDUP_TAU}, FALSE) AS is_dup
FROM af LEFT JOIN pairs p ON p.vec_id = af.vec_id
"""


@register(
    "dedup_semantic_semdedup",
    oracle=_semdedup_oracle(),
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023, "
    "arXiv:2303.09540): cluster the embedding corpus with the "
    "deterministic Lloyd k-means, then compare pairs ONLY within a "
    "cluster — a vector is a semantic duplicate when its cosine to "
    "a lower-id cluster-mate reaches tau (keep-lowest-id policy). "
    "This is the 100 TB shape for embedding-level dedup: the "
    "quadratic compare is bounded per cluster (N^2/k) instead of "
    "corpus-wide, the cluster key is one linear shuffle, and the "
    "assignment itself is row-local against broadcast-literal "
    "centroids. Output: every vector with its cluster, its max "
    "similarity to a lower-id mate (NULL for cluster minima / "
    "singletons), and the dedup flag. The full iterative pipeline — "
    "Lloyd fit, assignment, pairwise max, flag — is replayed in the "
    "oracle, so the check is hash-exact end-to-end.",
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.similarity import (
        cosine,
        kmeans_fit_assign,
        valid_embeddings,
    )

    # same malformed-vector exclusion as _SEMDEDUP_FIT_WHERE: a NULL
    # vector / NULL element / zero-norm vector has no direction, so it
    # can neither seed a centroid nor pair in the cosine stage
    emb = valid_embeddings(table(spark, sf_dir, "embeddings"))
    assigned = kmeans_fit_assign(
        emb,
        "embedding",
        ["vec_id", "embedding"],
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
    ).select("vec_id", "embedding", "cluster")
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(
            F.round(
                F.max(cosine(F.col("a.embedding"), F.col("b.embedding"))), 6
            ).alias("max_lower_sim")
        )
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(pairs, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "max_lower_sim",
            F.coalesce(
                F.col("max_lower_sim") >= _SEMDEDUP_TAU, F.lit(False)
            ).alias("is_dup"),
        )
    )


#: quality-weighted sampling bucket: a third odd multiplier (xxhash
#: prime3) decorrelating the odd-modulus components of acceptance from
#: both the uniform
#: sample bucket and the split bucket. 2^31 * 3266489917 ~ 7.0e18 < 2^63.
_QSAMPLE_BUCKET_SQL = "((doc_id % 2147483648) * 3266489917) % 4294967296 % 100"

_QUALITY_SAMPLE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, {_QUALITY_CASE_SQL} AS quality
  FROM documents
)
SELECT doc_id, lang, ROUND(quality, 6) AS quality
FROM scored
WHERE {_QSAMPLE_BUCKET_SQL} < CAST(floor(quality * 100) AS BIGINT)
"""


@register(
    "sample_quality_weighted",
    oracle=_QUALITY_SAMPLE_ORACLE,
    doc="Importance sampling by quality: each document keeps with "
    "probability equal to its quality score (P(keep) = quality, via "
    "deterministic hash-bucket < floor(quality*100)) — high-quality "
    "docs are retained, low-quality docs thinned proportionally, and "
    "the whole selection is replayable byte-for-byte like the other "
    "hash-mod samplers. Both engines evaluate the identical score "
    "expression left-to-right, so the acceptance threshold is the "
    "same double on both sides. Scan-local: no shuffle at all.",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    q = quality_score(F.col("text"))
    return (
        d.withColumn("quality", q)
        .filter(
            F.expr(_QSAMPLE_BUCKET_SQL)
            < F.floor(F.col("quality") * 100).cast("bigint")
        )
        .select("doc_id", "lang", F.round("quality", 6).alias("quality"))
    )


_SOURCE_QUALITY_ORACLE = f"""
WITH scored AS (
  SELECT source,
         {_QUALITY_CASE_SQL} AS quality
  FROM documents
), rolled AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         ROUND(AVG(quality), 6) AS avg_quality
  FROM scored GROUP BY source
)
SELECT source, n_docs, avg_quality,
       CAST(ntile(4) OVER (ORDER BY avg_quality DESC, source) AS INTEGER)
           AS quality_quartile,
       ntile(4) OVER (ORDER BY avg_quality DESC, source) = 4 AS drop_source
FROM rolled
"""


@register(
    "source_quality_rollup",
    oracle=_SOURCE_QUALITY_ORACLE,
    doc="Source-level quality gate: per-source document count + mean "
    "quality score, quartiled; the bottom quartile is flagged for "
    "drop — curation pipelines prune whole sources/domains before "
    "per-document filtering because source reputation is the cheaper "
    "signal. Per-doc scoring is row-local; the rollup shuffles one "
    "row per source; the quartile window runs on the (tiny) source "
    "relation only.",
)
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    rolled = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(quality_score(F.col("text"))), 6).alias("avg_quality"),
    )
    w = Window.orderBy(F.col("avg_quality").desc(), "source")
    return rolled.select(
        "source",
        "n_docs",
        "avg_quality",
        F.ntile(4).over(w).cast("int").alias("quality_quartile"),
        (F.ntile(4).over(w) == 4).alias("drop_source"),
    )


_CURATION_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, lang, text,
         {_QUALITY_CASE_SQL} AS quality
  FROM documents
), rolled AS (
  SELECT source, ROUND(AVG(quality), 6) AS avg_quality
  FROM scored GROUP BY source
), kept_sources AS (
  SELECT source FROM (
    SELECT source, ntile(4) OVER (ORDER BY avg_quality DESC, source) AS qt
    FROM rolled) WHERE qt < 4
), wc AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents)
  GROUP BY doc_id, word
), nonrep AS (
  SELECT doc_id FROM wc GROUP BY doc_id
  HAVING (CAST(count(*) AS DOUBLE) / sum(c)) >= 0.25
), filtered AS (
  SELECT s.doc_id, s.lang,
         md5(trim(lower(regexp_replace(regexp_replace(s.text,
             '[\\.,;:!\\?''"]', '', 'g'), '\\s+', ' ', 'g')))) AS fp
  FROM scored s
  JOIN kept_sources USING (source)
  JOIN nonrep USING (doc_id)
  WHERE s.quality >= 0.7
), survivors AS (
  SELECT min_by(lang, doc_id) AS lang FROM filtered GROUP BY fp
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
FROM survivors GROUP BY lang
"""


@register(
    "pipeline_curation_full",
    oracle=_CURATION_ORACLE,
    doc="Full curation DAG composed from the catalog's primitives: "
    "source-level quality gate (drop bottom quartile) -> per-document "
    "quality >= 0.7 -> repetition filter (distinct-word ratio >= 0.25) "
    "-> canonical-fingerprint dedup (min-doc_id keeper) -> per-lang "
    "survivor counts. One text scan feeds the scoring and fingerprint "
    "paths; the source gate and keeper joins broadcast; the word-count "
    "repetition pass is the only token-level shuffle. The shape every "
    "training-data pipeline runs end-to-end, oracle-checked as one "
    "plan.",
)
def pipeline_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    # one scoring pass emits quality AND the dedup digest, then
    # localCheckpoints the compact (no-text) per-doc rows: the quality
    # rollup branch and the filtered join both read the materialized
    # result instead of re-scanning + re-scoring the corpus (broadcast
    # subquery branches re-execute their upstream plan — NOTES.md
    # lesson 9). Digesting dropped docs too is the price, far below a
    # second full text scan.
    scored = d.select(
        "doc_id", "source", "lang",
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    ).localCheckpoint(eager=False)
    rolled = scored.groupBy("source").agg(
        F.round(F.avg("quality"), 6).alias("avg_quality")
    )
    w = Window.orderBy(F.col("avg_quality").desc(), "source")
    kept_sources = (
        rolled.select("source", F.ntile(4).over(w).alias("qt"))
        .filter(F.col("qt") < 4)
        .select("source")
    )
    wc = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+")
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nonrep = (
        wc.groupBy("doc_id")
        .agg(
            (F.count(F.lit(1)) / F.sum("c")).alias("ratio")
        )
        .filter(F.col("ratio") >= 0.25)
        .select("doc_id")
    )
    filtered = (
        scored.join(F.broadcast(kept_sources), "source")
        .join(nonrep, "doc_id")
        .filter(F.col("quality") >= 0.7)
        .select("doc_id", "lang", "fp")
    )
    survivors = filtered.groupBy("fp").agg(
        F.min_by("lang", "doc_id").alias("lang")
    )
    return survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


# --- sequence packing + mixture planning ---------------------------------------

#: target training-sequence length (tokens) for the packing query
_SEQ_LEN = 2048

#: docs per packing shard: the cumulative-sum window partitions on
#: (source, shard) instead of bare source, so no single task ever owns
#: one source's entire token stream. 128 keeps several shards per
#: source even at sf0.001; at 100 TB the same constant (or a date
#: bucket) bounds every window partition to a fixed document count.
_PACK_SHARD_DOCS = 128

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(doc_id // {_PACK_SHARD_DOCS} AS BIGINT) AS shard,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), placed AS (
  SELECT doc_id, source, shard, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, shard, n_tokens,
       CAST((cum_tokens - n_tokens) // {_SEQ_LEN} AS BIGINT) AS first_seq,
       CAST((cum_tokens - 1) // {_SEQ_LEN} AS BIGINT) AS last_seq,
       CAST((cum_tokens - n_tokens) % {_SEQ_LEN} AS BIGINT) AS start_offset
FROM placed
"""


@register(
    "pack_sequences_by_source",
    oracle=_PACK_ORACLE,
    doc="Concat-and-chunk sequence packing: documents concatenate in "
    "deterministic doc_id order within each (source, shard) and the "
    "token stream is cut every 2048 tokens — each doc's span of "
    "training sequences (first_seq..last_seq, start_offset) falls "
    "out of one windowed cumulative sum. The window partitions on "
    "the BOUNDED shard key (source, doc_id div 128), never bare "
    "source: at 100 TB a popular source would otherwise serialize "
    "its whole token stream through one task, while the shard key "
    "caps every window partition at a fixed document count and each "
    "shard packs (and would write) its sequences independently, "
    "addressed by (source, shard, seq).",
)
def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.expr(f"doc_id div {_PACK_SHARD_DOCS}").alias("shard"),
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    )
    # integer `div`: DuckDB CAST(double AS BIGINT) rounds while Spark
    # truncates, so both sides must divide in integer space
    return placed.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {_SEQ_LEN}").alias("first_seq"),
        F.expr(f"(cum_tokens - 1) div {_SEQ_LEN}").alias("last_seq"),
        ((F.col("cum_tokens") - F.col("n_tokens")) % _SEQ_LEN)
        .cast("bigint")
        .alias("start_offset"),
    )


#: length-bucketed inference batching: bucket width (tokens), bucket
#: cap, docs per batch, docs per shard (same bounded-window-partition
#: rationale as _PACK_SHARD_DOCS, scaled up since rows here are two
#: ints, not text)
_LENBUCKET_WIDTH = 16
_LENBUCKET_CAP = 7
_LENBATCH_DOCS = 32
_LENBUCKET_SHARD_DOCS = 1024

_LENBUCKET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(doc_id // {_LENBUCKET_SHARD_DOCS} AS BIGINT) AS shard,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
  WHERE text IS NOT NULL
), bucketed AS (
  SELECT doc_id, shard, n_tokens,
         CAST(least(n_tokens // {_LENBUCKET_WIDTH}, {_LENBUCKET_CAP})
              AS BIGINT) AS bucket
  FROM toks
), batched AS (
  SELECT bucket, shard, n_tokens,
         CAST((row_number() OVER (
            PARTITION BY bucket, shard ORDER BY doc_id
          ) - 1) // {_LENBATCH_DOCS} AS BIGINT) AS batch
  FROM bucketed
)
SELECT bucket, shard, batch,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(1.0 - CAST(sum(n_tokens) AS DOUBLE)
                   / (count(*) * max(n_tokens)), 6) AS padding_frac
FROM batched
GROUP BY bucket, shard, batch
"""


@register(
    "pack_length_buckets",
    oracle=_LENBUCKET_ORACLE,
    doc="Length-bucketed inference batching (the dynamic-batching "
    "shape serving stacks use): documents bucket by token-count band "
    f"(width {_LENBUCKET_WIDTH}, capped at {_LENBUCKET_CAP}), fill "
    f"deterministic {_LENBATCH_DOCS}-doc batches in doc_id order "
    "within each (bucket, shard), and each batch reports its padded "
    "waste — 1 - sum(tokens)/(n*max) — which is the quantity length "
    "bucketing exists to minimize (the training-side twin is "
    "pack_sequences_by_source; the padding audit over naive packing "
    "is pack_padding_efficiency). Scale shape: the batch-number "
    "window partitions on the BOUNDED (bucket, doc_id div "
    f"{_LENBUCKET_SHARD_DOCS}) key — never bare bucket, which would "
    "serialize a popular length band through one task — and the "
    "rollup groups on a superset of the window key, so the whole "
    "query is ONE shuffle; everything upstream is a scan-side map.",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bucketed = d.select(
        "doc_id",
        F.expr(f"doc_id div {_LENBUCKET_SHARD_DOCS}").alias("shard"),
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(
            F.expr(f"n_tokens div {_LENBUCKET_WIDTH}"),
            F.lit(_LENBUCKET_CAP).cast("bigint"),
        ),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    batched = bucketed.withColumn("__rn", F.row_number().over(w)).withColumn(
        "batch", F.expr(f"(__rn - 1) div {_LENBATCH_DOCS}").cast("bigint")
    )
    return batched.groupBy("bucket", "shard", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.max("n_tokens")),
            6,
        ).alias("padding_frac"),
    )


_TOKEN_BUDGET_ORACLE = """
WITH avail AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS available_tokens
  FROM documents
  GROUP BY lang
), weighted AS (
  SELECT lang, n_docs, available_tokens,
         CASE WHEN lang = 'en' THEN 0.5
              ELSE 0.5 / greatest(
                     CAST((SELECT count(DISTINCT lang) FROM documents)
                          AS DOUBLE) - 1, 1)
         END AS target_weight
  FROM avail
)
SELECT lang, n_docs, available_tokens,
       ROUND(target_weight, 6) AS target_weight,
       CAST(floor(target_weight * 1000000) AS BIGINT) AS target_tokens,
       ROUND(target_weight * 1000000 / available_tokens, 6) AS epochs,
       ROUND(least(1.0, target_weight * 1000000 / available_tokens), 6)
         AS sample_rate
FROM weighted
"""


@register(
    "mixture_token_budget",
    oracle=_TOKEN_BUDGET_ORACLE,
    doc="Token-budget mixture planning: given per-language available "
    "token counts and a target mixture (50% en, rest uniform), derive "
    "each language's token budget, epoch count (repeat factor when "
    "under-resourced) and sampling rate (when over-resourced) for a "
    "1M-token training budget — the planning step that precedes "
    "mixture_resample_by_lang's execution step. One grouped agg over "
    "the corpus; the plan itself is a handful of rows.",
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias(
            "available_tokens"
        ),
    )
    # max(..., 1) guards the single-language corpus: the eager Python
    # division must not raise even when the otherwise() branch is dead.
    # dropna first: SQL count(DISTINCT lang) never counts NULL, while
    # DataFrame distinct().count() does (round-6 NULL-fixture pin)
    n_langs = d.select("lang").na.drop().distinct().count()
    weight = F.when(F.col("lang") == "en", F.lit(0.5)).otherwise(
        F.lit(0.5 / max(n_langs - 1, 1))
    )
    budget = weight * 1_000_000
    return avail.select(
        "lang",
        "n_docs",
        "available_tokens",
        F.round(weight, 6).alias("target_weight"),
        F.floor(budget).cast("bigint").alias("target_tokens"),
        F.round(budget / F.col("available_tokens"), 6).alias("epochs"),
        F.round(
            F.least(F.lit(1.0), budget / F.col("available_tokens")), 6
        ).alias("sample_rate"),
    )


#: temperature for source-share flattening (w_i ~ p_i^alpha): <1 boosts
#: small sources, 1 is proportional sampling
_MIX_ALPHA = 0.7

_TEMPERATURE_MIX_ORACLE = f"""
WITH toks AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents
  GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM toks
), sh AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / total_tokens AS share,
         pow(CAST(n_tokens AS DOUBLE) / total_tokens, {_MIX_ALPHA}) AS w_raw
  FROM toks, tot
), z AS (
  SELECT sum(w_raw) AS z FROM sh
)
SELECT source, n_docs, n_tokens,
       ROUND(share, 6) AS raw_share,
       ROUND(w_raw / z, 6) AS weight,
       ROUND(w_raw / z * 1000000 / n_tokens, 6) AS epochs
FROM sh, z
"""


@register(
    "mixture_temperature_weights",
    oracle=_TEMPERATURE_MIX_ORACLE,
    doc="Temperature-based source mixing: each source's sampling weight "
    "is its token share raised to alpha=0.7 and renormalized — the "
    "standard flattening that up-weights small sources without "
    "letting any source dominate; epochs is the repeat factor at a "
    "1M-token budget. The corpus is scanned ONCE into a source-"
    "cardinality aggregate; the two normalization totals are global "
    "windows over those few rows (not scalar-subquery branches, which "
    "would re-execute the corpus aggregate per branch — NOTES.md "
    "lesson 9), so the single-partition window holds O(sources) rows "
    "at any corpus size.",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    sh = toks.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("share"),
        F.pow(share, F.lit(_MIX_ALPHA)).alias("w_raw"),
    )
    weight = F.col("w_raw") / F.sum("w_raw").over(w)
    return sh.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("share"), 6).alias("raw_share"),
        F.round(weight, 6).alias("weight"),
        F.round(weight * 1000000 / F.col("n_tokens"), 6).alias("epochs"),
    )


_CURRICULUM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         {_QUALITY_CASE_SQL} AS quality
  FROM documents
), phased AS (
  SELECT CASE WHEN quality >= 0.7 THEN 0
              WHEN quality >= 0.4 THEN 1
              ELSE 2 END AS phase,
         quality, n_tokens
  FROM scored
), rolled AS (
  SELECT phase,
         CAST(count(*) AS BIGINT) AS n_docs,
         ROUND(AVG(quality), 6) AS avg_quality,
         CAST(sum(n_tokens) AS BIGINT) AS phase_tokens
  FROM phased GROUP BY phase
)
SELECT phase, n_docs, avg_quality, phase_tokens,
       CAST(sum(phase_tokens) OVER (ORDER BY phase
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens
FROM rolled
"""


@register(
    "curriculum_phase_stats",
    oracle=_CURRICULUM_ORACLE,
    doc="Curriculum phasing: documents bin into training phases by "
    "FIXED quality thresholds (cleanest data first), with per-phase "
    "doc/token counts and the cumulative token schedule. Phase "
    "assignment is row-local (no global ntile sort — a global ranked "
    "window would be the scale-killer here), so the whole query is "
    "one scan + a 3-row aggregate; the cumulative window runs over "
    "phases, not documents.",
)
def curriculum_phase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = spread(table(spark, sf_dir, "documents"))
    scored = d.select(
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )
    phased = scored.withColumn(
        "phase",
        F.when(F.col("quality") >= 0.7, 0)
        .when(F.col("quality") >= 0.4, 1)
        .otherwise(2),
    )
    rolled = phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum("n_tokens").alias("phase_tokens"),
    )
    w = Window.orderBy("phase").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return rolled.select(
        "phase",
        "n_docs",
        "avg_quality",
        "phase_tokens",
        F.sum("phase_tokens").over(w).cast("bigint").alias("cum_tokens"),
    )


_INCREMENTAL_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT DISTINCT sha256(coalesce(text, '')) AS content_hash
  FROM documents WHERE source = 'src0'
), incoming AS (
  SELECT sha256(coalesce(text, '')) AS content_hash,
         CAST(min(doc_id) AS BIGINT) AS keep_id,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM documents WHERE source <> 'src0'
  GROUP BY sha256(coalesce(text, ''))
)
SELECT i.content_hash, i.keep_id, i.n_copies
FROM incoming i
WHERE i.content_hash NOT IN (SELECT content_hash FROM corpus)
"""


#: deterministic version membership for the snapshot-diff query: v1 =
#: hash buckets 0-89, v2 = buckets 10-99, so ~80% of docs overlap and
#: both added and removed sets are non-empty by construction
_DIFF_V1_SQL = "((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 90"
_DIFF_V2_SQL = "((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 >= 10"

_CORPUS_DIFF_ORACLE = f"""
WITH v1 AS (
  SELECT sha256(coalesce(text, '')) AS h
  FROM documents WHERE {_DIFF_V1_SQL}
), v2 AS (
  SELECT sha256(coalesce(text, '')) AS h
  FROM documents WHERE {_DIFF_V2_SQL}
)
SELECT status, n_docs FROM (
  SELECT 'added' AS status,
         CAST((SELECT count(*) FROM v2 WHERE h NOT IN (SELECT h FROM v1))
              AS BIGINT) AS n_docs
  UNION ALL
  SELECT 'removed',
         CAST((SELECT count(*) FROM v1 WHERE h NOT IN (SELECT h FROM v2))
              AS BIGINT)
  UNION ALL
  SELECT 'unchanged',
         CAST((SELECT count(*) FROM v1 WHERE h IN (SELECT h FROM v2))
              AS BIGINT)
)
"""


@register(
    "corpus_snapshot_diff",
    oracle=_CORPUS_DIFF_ORACLE,
    doc="Dataset-version diff by content digest: two corpus snapshots "
    "(deterministic overlapping hash-splits standing in for v1/v2) "
    "compare as added / removed / unchanged document counts via "
    "digest anti- and semi-joins — the audit that gates a training-"
    "data release against its predecessor. Only 32-byte digests move "
    "through the shuffles; the text is scanned once per side.",
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # coalesce BEFORE hashing: a NULL text would yield a NULL digest,
    # which left_anti KEEPS (null keys never match) while the oracle's
    # NOT IN drops — and one NULL in the v1 subquery would make NOT IN
    # reject every v2 row. Hashing '' keeps both engines agreeing for
    # any input, not just the non-null synthetic corpus.
    sha = F.sha2(F.coalesce(F.col("text"), F.lit("")).cast("binary"), 256)
    v1 = d.filter(F.expr(_DIFF_V1_SQL)).select(sha.alias("h"))
    v2 = d.filter(F.expr(_DIFF_V2_SQL)).select(sha.alias("h"))
    added = v2.join(v1, "h", "left_anti").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(F.lit("added").alias("status"), "n_docs")
    removed = v1.join(v2, "h", "left_anti").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(F.lit("removed").alias("status"), "n_docs")
    unchanged = v1.join(v2, "h", "left_semi").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(F.lit("unchanged").alias("status"), "n_docs")
    return added.unionByName(removed).unionByName(unchanged)


@register(
    "dedup_incremental_new_docs",
    oracle=_INCREMENTAL_DEDUP_ORACLE,
    doc="Incremental-ingestion dedup: a new batch (source <> src0) "
    "first dedups within itself (sha256 groupBy, deterministic "
    "keeper), then anti-joins the already-ingested corpus (src0) on "
    "the digest — the daily-crawl-vs-historical-corpus shape. Both "
    "sides move only 32-byte keys; at 100 TB the anti join shuffles "
    "on the digest (AQE may still broadcast a small corpus side) and "
    "a bloom-filter pre-pass slots in front unchanged.",
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # coalesce before hashing — same NULL-digest vs NOT-IN divergence
    # guard as corpus_snapshot_diff
    sha = F.sha2(F.coalesce(F.col("text"), F.lit("")).cast("binary"), 256)
    corpus = d.filter(F.col("source") == "src0").select(
        sha.alias("content_hash")
    ).distinct()
    incoming = (
        d.filter(F.col("source") != "src0")
        .select(sha.alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    return incoming.join(corpus, "content_hash", "left_anti")


_WINNOW_ORACLE = """
WITH canon AS (
  SELECT doc_id,
         trim(regexp_replace(lower(coalesce(text, '')),
                             '[ \\t\\n\\r\\f]+', ' ', 'g')) AS c
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN length(c) >= 8
              THEN list_transform(range(1, length(c) - 8 + 2),
                   i -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                            list_transform(range(0, 8),
                                o -> CAST(ascii(substring(c, i + o, 1)) AS BIGINT))),
                        (acc, ch) -> (acc * 257 + ch) % 1000000007))
              ELSE [] END AS h
  FROM canon
), winnowed AS (
  SELECT doc_id,
         CASE WHEN len(h) >= 1
              THEN list_distinct(list_transform(
                       range(1, greatest(len(h) - 4 + 1, 1) + 1),
                       j -> list_min(h[j:j + 3])))
              ELSE [] END AS fps
  FROM grams
)
SELECT doc_id, unnest(fps) AS fp FROM winnowed
"""


@register(
    "text_winnow_fingerprints",
    oracle=_WINNOW_ORACLE,
    doc="Winnowing document fingerprints (Schleimer et al., SIGMOD'03: "
    "k=8-char grams, polynomial rolling hash mod 1e9+7, min-hash per "
    "window of w=4 grams, distinct). The position-robust near-dup "
    "LOCALIZATION primitive: any shared substring of length >= k+w-1 "
    "guarantees a shared fingerprint, so an equi-join on fp finds "
    "*where* two docs overlap, not just that they do (MinHash's "
    "whole-doc verdict). Vectorized Arrow kernel, row-local, ZERO "
    "shuffle (operators/text_analysis.py:winnow_fingerprints has the "
    "measured HOF-vs-pandas justification); the engine-portable "
    "arithmetic is replayed exactly by the DuckDB oracle — the "
    "hash-verifiable sibling of the xxhash64 MinHash/SimHash kernels.",
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return winnow_fingerprints(d).select(
        "doc_id", F.explode("fps").alias("fp")
    )


# --- round-6 additions: mixture drift + collocation mining ---------------------

#: The corpus language domain is closed (documents.lang takes exactly
#: these five values at every SF); a FIXED per-lang expression keeps
#: the 5-term JS sums in one deterministic left-to-right IEEE order on
#: both engines — a groupBy over (source, lang) would sum the terms in
#: nondeterministic order and flake the hash at the last ulp.
_JS_LANGS = ("de", "en", "es", "fr", "zh")


def _js_sql_terms() -> tuple[str, str]:
    """DuckDB SQL for the two JS sums, mirroring the Spark expression
    structure token for token (same divisions, same ln ratio)."""
    p_terms, q_terms = [], []
    for lang in _JS_LANGS:
        p = f"(n_{lang} / n_docs)"
        q = f"(c_{lang} / n_corpus)"
        m = f"(({p} + {q}) / 2)"
        p_terms.append(
            f"CASE WHEN n_{lang} > 0 THEN {p} * ln({p} / {m}) ELSE 0.0 END"
        )
        q_terms.append(
            f"CASE WHEN c_{lang} > 0 THEN {q} * ln({q} / {m}) ELSE 0.0 END"
        )
    return " + ".join(p_terms), " + ".join(q_terms)


_JS_P, _JS_Q = _js_sql_terms()

_MIXTURE_JS_ORACLE = f"""
WITH per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         {", ".join(
             f"CAST(sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS BIGINT)"
             f" AS n_{lang}"
             for lang in _JS_LANGS
         )}
  FROM documents GROUP BY source
), corpus AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n_corpus,
         {", ".join(
             f"CAST(sum(n_{lang}) AS BIGINT) AS c_{lang}"
             for lang in _JS_LANGS
         )}
  FROM per_source
)
SELECT source, n_docs,
       round((0.5 * ({_JS_P}) + 0.5 * ({_JS_Q})) / ln(2), 6)
         AS js_divergence
FROM per_source, corpus
"""


@register(
    "mixture_js_divergence_by_source",
    oracle=_MIXTURE_JS_ORACLE,
    doc="Language-mixture drift per source: Jensen-Shannon divergence "
    "(bits) between each source's language distribution and the whole "
    "corpus's — the mixture-monitoring primitive that flags a source "
    "whose language makeup shifted between crawls. One grouped pass "
    "over documents (source key) emits per-lang conditional counts; "
    "the corpus marginal is summed from that 20-row result (NO second "
    "scan) and broadcast back as one row. The closed 5-lang domain is "
    "expanded to fixed columns so the JS sums run in one deterministic "
    "operand order — see _JS_LANGS.",
)
def mixture_js_divergence_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            # when/otherwise, not a bare boolean cast: (NULL == 'de')
            # is NULL, and a group whose every lang is NULL would sum
            # to NULL instead of 0 (round-6 NULL-text probe pin)
            F.sum(
                F.when(F.col("lang") == lang, 1).otherwise(0)
            ).alias(f"n_{lang}")
            for lang in _JS_LANGS
        ],
    )
    corpus = per_source.agg(
        F.sum("n_docs").alias("n_corpus"),
        *[F.sum(f"n_{lang}").alias(f"c_{lang}") for lang in _JS_LANGS],
    )
    joined = per_source.crossJoin(F.broadcast(corpus))

    ln2 = F.log(F.lit(2.0))
    p_sum, q_sum = None, None
    for lang in _JS_LANGS:
        p = F.col(f"n_{lang}") / F.col("n_docs")
        q = F.col(f"c_{lang}") / F.col("n_corpus")
        m = (p + q) / 2
        tp = F.when(F.col(f"n_{lang}") > 0, p * F.log(p / m)).otherwise(0.0)
        tq = F.when(F.col(f"c_{lang}") > 0, q * F.log(q / m)).otherwise(0.0)
        p_sum = tp if p_sum is None else (p_sum + tp)
        q_sum = tq if q_sum is None else (q_sum + tq)
    js = (0.5 * p_sum + 0.5 * q_sum) / ln2
    return joined.select(
        "source", "n_docs", F.round(js, 6).alias("js_divergence")
    )


_PMI_ORACLE = r"""
WITH words AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     w -> w <> '') AS wf
  FROM documents
), bg AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c12
  FROM (
    SELECT unnest(CASE WHEN len(wf) >= 2
             THEN list_transform(range(1, len(wf)),
                                 i -> wf[i] || ' ' || wf[i+1])
             ELSE [] END) AS bigram
    FROM words
  ) GROUP BY bigram
), ug AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(wf) AS word FROM words) GROUP BY word
), tot AS (
  SELECT (SELECT CAST(sum(c12) AS BIGINT) FROM bg) AS nb,
         (SELECT CAST(sum(c) AS BIGINT) FROM ug) AS nw
)
SELECT bigram, c12,
       round(ln((c12 / nb) / ((u1.c / nw) * (u2.c / nw))) / ln(2), 6) AS pmi
FROM bg, tot
JOIN ug u1 ON u1.word = string_split(bigram, ' ')[1]
JOIN ug u2 ON u2.word = string_split(bigram, ' ')[2]
WHERE c12 >= 5
ORDER BY pmi DESC, bigram
LIMIT 20
"""


@register(
    "text_collocation_pmi",
    oracle=_PMI_ORACLE,
    doc="Collocation mining: top-20 bigrams by pointwise mutual "
    "information (bits) with a min-count-5 support floor — the "
    "phrase-detection primitive (word2phrase-style) a tokenizer/"
    "vocabulary pipeline runs before training. ONE tokenize pass is "
    "localCheckpointed and feeds both the bigram and unigram counts "
    "(re-scanning the corpus would double the dominant cost); the two "
    "unigram joins shuffle on the word key only over the support-"
    "filtered bigram set; totals come from the count relations (no "
    "extra scan) and broadcast as one row. Ordering on the ROUNDED "
    "pmi keeps the top-k boundary identical across engines.",
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    wf = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
        lambda w: w != "",
    )
    words = d.select(wf.alias("wf")).localCheckpoint(eager=False)
    bigram_arr = F.when(
        F.size("wf") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("wf") - 1),
            lambda i: F.concat(
                F.element_at("wf", i), F.lit(" "), F.element_at("wf", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        words.select(F.explode(bigram_arr).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    ug = (
        words.select(F.explode("wf").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = bg.agg(F.sum("c12").alias("nb")).crossJoin(
        ug.agg(F.sum("c").alias("nw"))
    )
    u1 = ug.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    u2 = ug.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    pmi = F.log(
        (F.col("c12") / F.col("nb"))
        / ((F.col("c1") / F.col("nw")) * (F.col("c2") / F.col("nw")))
    ) / F.log(F.lit(2.0))
    return (
        bg.filter(F.col("c12") >= 5)
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("bigram", "c12", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(20)
    )


#: Hash-mod bucket for the winnow-contamination split. GENUINELY
#: independent of every multiplicative bucket in this module: round-9
#: measurement showed the old shared-multiplier scheme made this
#: bucket IDENTICAL to the quality-sampler's (the benchmark split was
#: fully dependent on sample membership), and swapping multipliers
#: cannot fix the power-of-2 residues — (d*a) mod 4 == (d mod 4 *
#: a mod 4) mod 4 for ANY odd a, so all multiplicative buckets agree
#: on low bits. A decontamination split must not correlate with
#: sampling, so this bucket is a real avalanche hash: xxhash64 over a
#: domain-tagged id (doc_id + 2^44; doc ids must stay below 2^44 —
#: ~1.7e13 documents — for tags to stay disjoint). Spark evaluates
#: F.xxhash64 natively; the oracle replays it via xxh64_long_sql.
_WINNOW_SPLIT_OFFSET = 1 << 44

_WINNOW_SPLIT_BUCKET_SQL = (
    f"((({xxh64_long_sql(f'(doc_id + {_WINNOW_SPLIT_OFFSET})')})"
    " % 100) + 100) % 100"
)


def _winnow_split_bucket() -> Column:
    """Spark twin of :data:`_WINNOW_SPLIT_BUCKET_SQL`."""
    return F.pmod(
        F.xxhash64(F.col("doc_id") + F.lit(_WINNOW_SPLIT_OFFSET)), F.lit(100)
    )

_WINNOW_CONTAMINATION_ORACLE = f"""
{_WINNOW_ORACLE.split("SELECT doc_id, unnest(fps) AS fp FROM winnowed")[0]}, fps AS MATERIALIZED (
  SELECT doc_id, unnest(fps) AS fp FROM winnowed
), val_fps AS (
  SELECT doc_id, fp FROM fps
  WHERE {_WINNOW_SPLIT_BUCKET_SQL} >= 90
), train_fp AS (
  SELECT DISTINCT fp FROM fps
  WHERE {_WINNOW_SPLIT_BUCKET_SQL} < 90
), per_doc AS (
  SELECT v.doc_id,
         CAST(count(*) AS BIGINT) AS n_fps,
         CAST(sum(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared
  FROM val_fps v LEFT JOIN train_fp t ON v.fp = t.fp
  GROUP BY v.doc_id
)
SELECT doc_id, n_fps, n_shared,
       round(n_shared / n_fps, 6) AS overlap_ratio
FROM per_doc
"""


@register(
    "contamination_winnow_overlap",
    oracle=_WINNOW_CONTAMINATION_ORACLE,
    doc="Benchmark decontamination at FINGERPRINT granularity: a 90/10 "
    "train/benchmark split on a domain-tagged xxhash64 bucket "
    "(genuinely independent of the sampling buckets — see "
    "_WINNOW_SPLIT_BUCKET_SQL), "
    "then each benchmark doc's winnow-fingerprint overlap fraction "
    "against the union of train fingerprints. Because winnowing "
    "guarantees a shared fingerprint for any shared substring of "
    "length >= k+w-1 = 11 chars, a high overlap_ratio localizes "
    "verbatim leakage that n-gram-set contamination "
    "(contamination_ngram_overlap) can dilute on long docs. Plan: the "
    "zero-shuffle Arrow winnow kernel feeds ONE localCheckpointed fp "
    "relation consumed by both split sides; the semi-join shuffles on "
    "the fp key only (no text bytes move), and per-doc counts reuse "
    "the val side's partitioning. Row-local split assignment keeps "
    "membership reproducible at any scale.",
)
def contamination_winnow_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fps = (
        winnow_fingerprints(d)
        .select("doc_id", F.explode("fps").alias("fp"))
        .localCheckpoint(eager=False)
    )
    bucket = _winnow_split_bucket()
    val_fps = fps.filter(bucket >= 90)
    train_fp = fps.filter(bucket < 90).select("fp").distinct()
    shared = (
        val_fps.join(train_fp, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    per_doc = val_fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps")
    )
    return (
        per_doc.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_fps",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.round(
                F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_fps"), 6
            ).alias("overlap_ratio"),
        )
    )


#: the Laplace-unigram-LM CTE chain + per-doc rollup, factored so the
#: round-9 quality classifier's oracle reuses the IDENTICAL expression
#: shapes (the DECIMAL log-term discipline must not diverge)
_LM_XENT_CTES = r"""words AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                            w -> w <> '')) AS word
  FROM documents
), tf AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, word
), cnt AS MATERIALIZED (
  SELECT word, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY word
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_corpus,
         CAST(count(*) AS BIGINT) AS vocab
  FROM cnt
), terms AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ln((cnt.c + 1) / CAST(tot.n_corpus + tot.vocab AS DOUBLE))
              AS DECIMAL(15,12)) AS lp
  FROM tf JOIN cnt USING (word), tot
)"""

_LM_XENT_SELECT = """SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(CAST(CAST(-sum(CAST(tf AS DECIMAL(18,0)) * lp) AS VARCHAR)
                  AS DOUBLE) / sum(tf) / ln(2), 6) AS cross_entropy
FROM terms GROUP BY doc_id"""

_LM_XENT_ORACLE = f"""
WITH {_LM_XENT_CTES}
{_LM_XENT_SELECT}
"""


@register(
    "text_lm_cross_entropy",
    oracle=_LM_XENT_ORACLE,
    doc="CCNet-style statistical-LM quality score (Wenzek et al. 2020 "
    "use a KenLM; the deterministic stand-in is a Laplace-smoothed "
    "corpus unigram LM): per-document cross-entropy in bits/token — "
    "low = stereotypical fluent text, high = rare-token noise; "
    "pipelines threshold or bucket on it for quality-based sampling. "
    "Plan: one tokenize pass feeds (doc,word) tf and corpus counts; "
    "the LM 'lookup' is a word-key shuffle join; per-doc totals "
    "reuse nothing larger than the doc key. Numeric discipline: each "
    "word's log-prob is deterministic, cast to DECIMAL(15,12) and "
    "weighted by an exact integer tf, so the per-doc sum is exact "
    "and ORDER-INSENSITIVE (a raw double sum over hundreds of "
    "variable-magnitude log terms is the classic cross-engine hash "
    "flake); one correctly-rounded double conversion per engine "
    "(numeric.py recipe), then bits via /ln(2).",
)
def text_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lm_xent_per_doc(spark, sf_dir)


def _lm_xent_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-doc (doc_id, n_tokens, cross_entropy) relation — the
    registered text_lm_cross_entropy body, also the LM feature leg of
    text_quality_classifier (round 9). Docs with no tokens (NULL or
    whitespace-only text) have no rows in tf and drop out."""
    d = spread(table(spark, sf_dir, "documents"))
    wf = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
        lambda w: w != "",
    )
    words = d.select("doc_id", F.explode(wf).alias("word"))
    # counts and totals all derive from the (doc, word) tf relation, so
    # the corpus is tokenized and exploded exactly ONCE; tf is the
    # checkpoint boundary shared by the LM build and the scoring join
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    cnt = (
        tf.groupBy("word")
        .agg(F.sum("tf").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(
        F.sum("c").alias("n_corpus"), F.count(F.lit(1)).alias("vocab")
    )
    lp = F.log(
        (F.col("c") + 1)
        / (F.col("n_corpus") + F.col("vocab")).cast("double")
    ).cast(DecimalType(15, 12))
    terms = (
        tf.join(cnt, "word")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "tf", lp.alias("lp"))
    )
    xent = (
        (-F.sum(F.col("tf").cast(DecimalType(18, 0)) * F.col("lp"))).cast(
            "double"
        )
        / F.sum("tf")
        / F.log(F.lit(2.0))
    )
    return terms.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.round(xent, 6).alias("cross_entropy"),
    )


# --- document-quality classifier (CCNet-style curation stage) ------------------

#: fixed CCNet-style LM-perplexity bucket thresholds (bits/token).
#: CCNet (Wenzek et al. 2020) computes head/middle/tail cutoffs ONCE
#: offline and applies them row-locally in the pipeline — the same
#: shape here: these constants sit at the driver corpus's measured
#: terciles (~4.905 / ~4.911 at every SF), so all three buckets are
#: live, and bucket assignment is a row-local comparison (no global
#: ntile sort — curriculum_phase_stats' scale rule).
_QCLF_HEAD = 4.905
_QCLF_MID = 4.911
#: linear blend weights + feature normalizers (plan literals, replayed
#: verbatim in the oracle): score = 0.5*quality
#: + 0.3*clamp01(flesch/100) + 0.2*clamp01((5.1 - xent)/0.3)
_QCLF_KEEP = 0.65

_QCLF_SCORE_SQL = """0.5 * quality
         + 0.3 * greatest(0.0, least(1.0, flesch / 100.0))
         + 0.2 * greatest(0.0, least(1.0, (5.1 - cross_entropy) / 0.3))"""

_QCLF_ORACLE = f"""
WITH {_LM_XENT_CTES},
xent AS MATERIALIZED ({_LM_XENT_SELECT}),
feats AS (
  SELECT doc_id,
         round({_QUALITY_CASE_SQL}, 6) AS quality,
         {_FLESCH_SQL} AS flesch
  FROM documents WHERE text IS NOT NULL
), scored AS (
  SELECT f.doc_id, x.n_tokens, f.quality, f.flesch, x.cross_entropy,
         {_QCLF_SCORE_SQL} AS raw_score
  FROM feats f JOIN xent x USING (doc_id)
)
SELECT doc_id, n_tokens, quality, flesch, cross_entropy,
       CASE WHEN cross_entropy < {_QCLF_HEAD} THEN 'head'
            WHEN cross_entropy < {_QCLF_MID} THEN 'middle'
            ELSE 'tail' END AS lm_bucket,
       round(raw_score, 6) AS classifier_score,
       raw_score >= {_QCLF_KEEP} AS keep
FROM scored
"""


@register(
    "text_quality_classifier",
    oracle=_QCLF_ORACLE,
    doc="Document-level quality classifier — the curation stage that "
    "composes the repo's feature operators into one keep/drop + "
    "curriculum signal (the standard pretraining pipeline step between "
    "featurization and mixture/curriculum sampling): a linear scorer "
    "over the composite quality heuristic (text_quality_stats' "
    "quality_score), normalized Flesch readability "
    "(text_readability_scores' blend via the shared _flesch_cols), "
    "and the CCNet-style unigram-LM cross-entropy "
    "(text_lm_cross_entropy via the shared _lm_xent_per_doc), plus "
    "head/middle/tail LM buckets at FIXED thresholds (CCNet computes "
    "its perplexity cutoffs offline and applies them row-locally — no "
    "global ntile sort, per curriculum_phase_stats' scale rule). "
    "keep filters the RAW score (rounding only the output, the "
    "repo-wide boundary policy). All three features enter the blend "
    "ROUNDED to 6dp so both engines blend identical doubles. Plan: "
    "the LM leg's linear shuffles (tf, LM join, per-doc rollup) + one "
    "doc_id join back to the row-local feature scan; docs with no "
    "tokens drop with the LM leg (inner join). Composition is pinned "
    "by tests/test_llm_operators.py::"
    "test_quality_classifier_composes_feature_operators.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    _, _, _, flesch = _flesch_cols()
    feats = d.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        flesch.alias("flesch"),
    )
    xent = _lm_xent_per_doc(spark, sf_dir)
    clamp01 = lambda c: F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))  # noqa: E731
    raw_score = (
        F.lit(0.5) * F.col("quality")
        + F.lit(0.3) * clamp01(F.col("flesch") / F.lit(100.0))
        + F.lit(0.2)
        * clamp01((F.lit(5.1) - F.col("cross_entropy")) / F.lit(0.3))
    )
    return (
        feats.join(xent, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            "flesch",
            "cross_entropy",
            F.when(F.col("cross_entropy") < _QCLF_HEAD, "head")
            .when(F.col("cross_entropy") < _QCLF_MID, "middle")
            .otherwise("tail")
            .alias("lm_bucket"),
            F.round(raw_score, 6).alias("classifier_score"),
            (raw_score >= _QCLF_KEEP).alias("keep"),
        )
    )


_SKEW_DIAG_ORACLE = """
WITH per_key AS (
  SELECT l_suppkey AS join_key, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_suppkey
), tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key
)
SELECT join_key, n_rows,
       round(n_rows / CAST(n_total AS DOUBLE), 6) AS share,
       round(n_rows / (n_total / CAST(n_keys AS DOUBLE)), 6)
         AS skew_factor,
       CAST(row_number() OVER (ORDER BY n_rows DESC, join_key)
            AS INTEGER) AS rank
FROM per_key, tot
ORDER BY n_rows DESC, join_key
LIMIT 10
"""


@register(
    "diagnostic_join_key_skew",
    oracle=_SKEW_DIAG_ORACLE,
    doc="Join-key skew diagnostic: the top-10 heaviest l_suppkey values "
    "with their row share and skew factor (count over the mean per-key "
    "count) — the MEASURE step that decides whether a fact-fact join "
    "needs salting (operators/skew.py) or can rely on AQE's skew-join "
    "split. One partially-aggregated shuffle on the key; totals derive "
    "from the 100-row per-key relation; TakeOrderedAndProject for the "
    "top-10 (no global sort). At 100 TB this is the cheap pre-flight "
    "you run before committing to a shuffle strategy; a skew_factor "
    "near 1.0 everywhere means salting would only add overhead.",
)
def diagnostic_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_key = (
        li.groupBy(F.col("l_suppkey").alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    tot = per_key.agg(
        F.sum("n_rows").alias("n_total"), F.count(F.lit(1)).alias("n_keys")
    )
    from pyspark.sql import Window

    # NULLS LAST explicitly: a NULL join key forms its own group, and
    # Spark's ascending default (NULLS FIRST) disagrees with DuckDB's
    # (NULLS LAST) in the rank tie-break — round-6 NULL-probe pin
    order = [F.col("n_rows").desc(), F.col("join_key").asc_nulls_last()]
    # rank AFTER the limit (the retrieval_hybrid_rrf pattern): the
    # top-10 cut is a TakeOrderedAndProject and the row_number window
    # sees only those 10 rows — ranking BEFORE the cut funneled every
    # per-key row through one single-partition window sort, exactly
    # the bottleneck this diagnostic exists to find (round-9 review);
    # ranks 1..10 over the same total order are identical either way
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "join_key",
            "n_rows",
            F.round(
                F.col("n_rows") / F.col("n_total").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("n_rows")
                / (F.col("n_total") / F.col("n_keys").cast("double")),
                6,
            ).alias("skew_factor"),
        )
        .orderBy(*order)
        .limit(10)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
        )
    )


#: Hour-of-day profile dimension — a closed 24-bucket domain, expanded
#: to fixed columns for the same reason as _JS_LANGS: the cosine's
#: 24-term dot product and norms evaluate in ONE deterministic
#: left-to-right IEEE order on both engines (integer counts make every
#: product exact, so the only rounding is the final sqrt/divide).
_TS_HOURS = tuple(range(24))


def _ts_fixed_sum(expr_fmt: str) -> str:
    return " + ".join(expr_fmt.format(h=h) for h in _TS_HOURS)


_TS_OUTLIER_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         {", ".join(
             f"CAST(sum(CASE WHEN CAST(hour(ts) AS INTEGER) = {h} "
             f"THEN 1 ELSE 0 END) AS BIGINT) AS b{h}"
             for h in _TS_HOURS
         )}
  FROM events GROUP BY user_id
), corpus AS (
  SELECT {", ".join(f"CAST(sum(b{h}) AS BIGINT) AS g{h}" for h in _TS_HOURS)}
  FROM per_user
)
SELECT user_id, n_events,
       round(({_ts_fixed_sum("(b{h} * g{h})")})
             / (sqrt({_ts_fixed_sum("(b{h} * b{h})")})
                * sqrt({_ts_fixed_sum("(g{h} * g{h})")})), 6)
         AS cosine_vs_corpus
FROM per_user, corpus
ORDER BY cosine_vs_corpus ASC, user_id
LIMIT 10
"""


@register(
    "timeseries_user_profile_outliers",
    oracle=_TS_OUTLIER_ORACLE,
    doc="Time-series profile similarity (the streaming-systems "
    "similarity-search pattern, batch form): each user's hour-of-day "
    "activity histogram as a 24-dim vector, cosine against the corpus "
    "profile, bottom-10 = the users whose daily rhythm least resembles "
    "the crowd — behavioral outlier mining over event streams. One "
    "partially-aggregated user-key shuffle emits the 24 conditional "
    "counts; the corpus vector sums from the per-user relation (no "
    "second scan) and broadcasts back as one row; "
    "TakeOrderedAndProject for the bottom-10. Integer counts keep "
    "every dot-product term exact; the fixed 24-column expansion "
    "(see _TS_HOURS) keeps the 24-term sums in one deterministic "
    "operand order on both engines.",
)
def timeseries_user_profile_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hour = F.hour("ts").cast("int")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(F.when(hour == h, 1).otherwise(0)).alias(f"b{h}")
            for h in _TS_HOURS
        ],
    )
    corpus = per_user.agg(
        *[F.sum(f"b{h}").alias(f"g{h}") for h in _TS_HOURS]
    )
    dot = None
    nb = None
    ng = None
    for h in _TS_HOURS:
        td = F.col(f"b{h}") * F.col(f"g{h}")
        tb = F.col(f"b{h}") * F.col(f"b{h}")
        tg = F.col(f"g{h}") * F.col(f"g{h}")
        dot = td if dot is None else (dot + td)
        nb = tb if nb is None else (nb + tb)
        ng = tg if ng is None else (ng + tg)
    cos = dot / (F.sqrt(nb) * F.sqrt(ng))
    return (
        per_user.crossJoin(F.broadcast(corpus))
        .select(
            "user_id",
            "n_events",
            F.round(cos, 6).alias("cosine_vs_corpus"),
        )
        .orderBy(F.col("cosine_vs_corpus").asc(), "user_id")
        .limit(10)
    )


_COHORT_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
  FROM events
), tagged AS (
  SELECT user_id, wk,
         min(wk) OVER (PARTITION BY user_id) AS cohort_week
  FROM act
), cells AS (
  SELECT cohort_week,
         CAST(datediff('day', cohort_week, wk) // 7 AS INTEGER)
           AS weeks_since,
         CAST(count(*) AS BIGINT) AS n_active
  FROM tagged GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, n_active AS cohort_size
  FROM cells WHERE weeks_since = 0
)
SELECT c.cohort_week, c.weeks_since, c.n_active, s.cohort_size,
       round(c.n_active / CAST(s.cohort_size AS DOUBLE), 6)
         AS retention_rate
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
"""


@register(
    "cohort_weekly_retention",
    oracle=_COHORT_ORACLE,
    doc="Weekly cohort retention over the events stream: users grouped "
    "by first-activity week, then the fraction still active N weeks "
    "later — the canonical cohort triangle every product-analytics "
    "stack computes. Week buckets are Monday-truncated on both "
    "engines (DuckDB date_trunc returns DATE: cast to TIMESTAMP per "
    "the oracle-dialect pin); weeks_since is an exact integer "
    "day-diff over 7 (`div` vs `//` per the integer-division pin). "
    "Plan: distinct (user, week) activity, a user-partitioned window "
    "tags each row with its cohort (min week), one grouped pass "
    "emits the triangle, and cohort sizes are just the week-0 cells "
    "— derived, not re-aggregated, then broadcast back. Three "
    "compact shuffles total; every relation after the distinct is "
    "users x weeks, not events.",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id")
    tagged = act.withColumn("cohort_week", F.min("wk").over(w))
    cells = (
        tagged.groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7")
            .cast("int")
            .alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .localCheckpoint(eager=False)
    )
    sizes = cells.filter(F.col("weeks_since") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active") / F.col("cohort_size").cast("double"), 6
        ).alias("retention_rate"),
    )


# --- round-6 late additions (second session) -----------------------------------

_FILTERED_LABELS = (2, 5, 7)

_FILTERED_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         round(
           list_aggregate(list_transform(range(1, len(embedding) + 1),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum')
           / (sqrt(list_aggregate(list_transform(range(1, len(embedding) + 1),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 'sum'))
              * sqrt(list_aggregate(list_transform(range(1, len(qe) + 1),
                  i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)), 'sum'))),
           6) AS cosine_sim
  FROM embeddings, q
  WHERE label IN {_FILTERED_LABELS}
    AND embedding IS NOT NULL
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
)
SELECT vec_id, label, cosine_sim
FROM scored
WHERE cosine_sim IS NOT NULL
ORDER BY cosine_sim DESC, vec_id, label
LIMIT 10
"""


@register(
    "similarity_filtered_topk",
    oracle=_FILTERED_TOPK_ORACLE,
    doc="Metadata-filtered vector search (the 'filtered ANN' problem): "
    "exact top-10 cosine neighbors of vec_id=0 restricted to rows "
    "whose label is in a small allow-set. PRE-filtering, not "
    "post-filtering: the label predicate is applied to the scan "
    "before the cosine fold, so it reaches the parquet reader as a "
    "PushedFilters entry and the similarity arithmetic runs only on "
    "survivors — at 100 TB the difference between scoring the whole "
    "corpus and scoring the selected slice. Same zero-shuffle "
    "TakeOrderedAndProject shape as similarity_topk_bruteforce; the "
    "oracle applies the identical predicate inside its scored CTE.",
)
def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:

    qv = _query_vector(spark, sf_dir)
    return cosine_topk(
        table(spark, sf_dir, "embeddings").filter(
            F.col("label").isin(*_FILTERED_LABELS)
        ),
        "embedding",
        qv,
        k=10,
        id_cols=["vec_id", "label"],
    )


_NOVELTY_ORACLE = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 1) + 1),
           i -> array_to_string(list_slice(w, i, i + 2), ' ')
         ))) AS g
  FROM words
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
), novel AS (
  SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
  FROM firsts GROUP BY first_doc
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
  FROM grams GROUP BY doc_id
)
SELECT tot.doc_id, n_grams,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       round(coalesce(n_novel, 0) / CAST(n_grams AS DOUBLE), 6)
         AS novelty_ratio
FROM tot LEFT JOIN novel ON novel.doc_id = tot.doc_id
"""


@register(
    "text_ngram_novelty",
    oracle=_NOVELTY_ORACLE,
    doc="N-gram novelty scoring: for every document, the fraction of "
    "its distinct word-3-grams whose FIRST corpus occurrence (minimum "
    "doc_id) is this document — the memorization/novelty signal a "
    "curation pipeline uses to down-weight documents that only repeat "
    "earlier text. Deliberately NOT a window over the gram key: "
    "min(doc_id) per gram is a partial-aggregable groupBy, so a "
    "mega-hot gram (boilerplate) collapses map-side instead of "
    "funneling every occurrence through one window partition; the "
    "novel-count then rolls up from the small (gram, first_doc) "
    "relation via a second groupBy, never joining back to the "
    "exploded grams. One tokenize/explode pass is localCheckpointed "
    "and shared by the totals and first-seen branches. Per-doc gram "
    "sets are distinct by construction (word_shingles ends in "
    "array_distinct), matching the oracle's list_distinct.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text: word_shingles squashes it to [''] (one phantom gram
    # shared by every NULL/whitespace doc) while the oracle's split
    # propagates NULL and drops the doc — filter identically (round-9
    # review; the round-6 class-11 pin, applied here)
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    grams = d.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("g")
    ).localCheckpoint(eager=False)
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    tot = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return tot.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
            / F.col("n_grams").cast("double"),
            6,
        ).alias("novelty_ratio"),
    )


_VOCAB_K = 1000

_VOCAB_CURVE_TARGETS = (0.5, 0.9, 0.99)

_VOCAB_CURVE_ORACLE = rf"""
WITH wc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE text IS NOT NULL)
  GROUP BY w
), tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM wc),
ranked AS (
  SELECT w, cnt,
         row_number() OVER (ORDER BY cnt DESC, w) AS rnk,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, w
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum
  FROM wc
), targets(coverage_target) AS (
  VALUES {", ".join(f"(CAST({t} AS DOUBLE))" for t in _VOCAB_CURVE_TARGETS)}
)
SELECT t.coverage_target,
       CAST(min(r.rnk) AS BIGINT) AS vocab_size,
       round(min_by(r.cum, r.rnk) / min(tot.total), 6) AS actual_coverage
FROM targets t, ranked r, tot
WHERE r.cum >= t.coverage_target * tot.total
GROUP BY t.coverage_target
"""


@register(
    "text_vocab_coverage_curve",
    oracle=_VOCAB_CURVE_ORACLE,
    doc="Vocabulary coverage curve (the tokenizer-design question: how "
    "many vocabulary entries cover X% of the corpus token mass?): "
    "corpus word counts, words ranked by frequency (ties broken by "
    "word — same binary string order on both engines), running "
    "cumulative token mass, and for each coverage target (50/90/99%) "
    "the smallest vocabulary size reaching it plus the exact coverage "
    "achieved there. Scale shape: the corpus tokens collapse to one "
    "(word, count) relation via a single partial-aggregated shuffle; "
    "only the DISTINCT VOCABULARY (bounded by language, not corpus "
    "size) passes through the global rank/cumsum window, so the "
    "single-partition window is vocab-bounded, never corpus-bounded "
    "— at 100 TB cap it with a frequency floor before the window if "
    "the long tail matters.",
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # consumed by BOTH the rank/cumsum window and the total-mass
        # aggregate — materialize the small vocab relation once instead
        # of re-executing the corpus token scan per branch (NOTES
        # lesson 9)
        .localCheckpoint(eager=False)
    )
    # global order over the (small) vocabulary relation — deliberately
    # unpartitioned, see docstring
    w = Window.orderBy(F.col("cnt").desc(), "w")
    ranked = wc.select(
        F.row_number().over(w).alias("rnk"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("cum"),
    )
    tot = wc.agg(F.sum("cnt").cast("double").alias("total"))
    targets = spark.createDataFrame(
        [(float(t),) for t in _VOCAB_CURVE_TARGETS],
        "coverage_target double",
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(targets),
            F.col("cum") >= F.col("coverage_target") * F.col("total"),
        )
        .groupBy("coverage_target")
        .agg(
            F.min("rnk").cast("long").alias("vocab_size"),
            F.round(
                F.min_by("cum", "rnk") / F.min("total"), 6
            ).alias("actual_coverage"),
        )
    )

_OOV_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
  FROM documents
), counts AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w
), vocab AS (
  SELECT w FROM counts ORDER BY c DESC, w LIMIT {_VOCAB_K}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM toks LEFT JOIN vocab ON toks.w = vocab.w
GROUP BY doc_id
"""


@register(
    "text_vocab_oov_rate",
    oracle=_OOV_ORACLE,
    doc="Vocabulary coverage: build the corpus top-1000 word vocabulary "
    "(frequency desc, word asc — a total order, so the cut is "
    "identical on both engines) and score every document by its "
    "out-of-vocabulary token rate — the coverage check run before "
    "committing to a tokenizer vocab size. One tokenize/explode pass "
    "is localCheckpointed and shared by the count and scoring "
    "branches; the word count is one partial-aggregated shuffle; the "
    "1000-row vocab comes back via TakeOrderedAndProject and joins as "
    "a BROADCAST left join (the corpus-side relation never "
    "re-shuffles on the word key, so a mega-hot token costs nothing "
    "extra); the per-doc rollup is the one remaining doc_id exchange.",
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(_VOCAB_K)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov") / F.col("n_tokens").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


_INGEST_MOD = 10  # doc_id % 10 == 0 -> the "new batch"; else corpus
_INGEST_TAU = 0.2


def _minhash_incremental_oracle() -> str:
    """Full xxhash64 MinHash+LSH replay (same kernel as
    _minhash_lsh_oracle) with the self-join replaced by the
    batch-vs-corpus cross join on the doc_id % mod split."""
    from rabbithole_spark.functions.xxh64_sql import xxh64_unsigned_sql
    from rabbithole_spark.operators.dedup import _MINHASH_P, _minhash_coeffs

    p = _MINHASH_P
    base = (
        f"list_transform([{xxh64_unsigned_sql('s')}], __u -> "
        f"(((CASE WHEN __u >= {1 << 63}::HUGEINT THEN __u - {1 << 64}::HUGEINT"
        f" ELSE __u END) % {p} + {p}) % {p}))[1]::BIGINT"
    )
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {p})" for a, b in _minhash_coeffs(64)
    )
    band_str = (
        "array_to_string(list_slice(ms, t.range * 4 + 1, t.range * 4 + 4), ',')"
    )
    jac = (
        "CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)"
        " / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)"
    )
    return f"""
WITH {_SHINGLES_CTE},
hx AS (
  SELECT doc_id, {base} AS h
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)
),
sig AS (
  SELECT doc_id, [{mins}] AS ms
  FROM hx GROUP BY doc_id
),
banded AS (
  SELECT doc_id, t.range AS band, {xxh64_unsigned_sql(band_str)} AS bh
  FROM sig CROSS JOIN range(0, 16) t
),
cand AS (
  SELECT DISTINCT l.doc_id AS batch_id, r.doc_id AS corpus_id
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bh = r.bh
  WHERE l.doc_id % {_INGEST_MOD} = 0 AND r.doc_id % {_INGEST_MOD} <> 0
)
SELECT c.batch_id, c.corpus_id, round({jac}, 6) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.batch_id
JOIN sh b ON b.doc_id = c.corpus_id
WHERE {jac} >= {_INGEST_TAU}
"""


@register(
    "dedup_minhash_incremental",
    oracle=_minhash_incremental_oracle(),
    doc="Incremental near-dup screening of an ingest batch against the "
    "existing corpus (batch = doc_id % 10 == 0, the stand-in for "
    "'today's crawl'): MinHash signatures on both sides, then the "
    "BATCH band relation — small by construction — broadcasts "
    "against the corpus bands, so the corpus never shuffles on the "
    "bucket key; candidates are verified by exact Jaccard recomputed "
    "only for matched docs via broadcast semi-joins. At 100 TB the "
    "corpus signatures/bands would be a persisted incremental index "
    "(one-time cost, appended per batch) and this query is the "
    "per-batch probe; the digest-exact streaming twin is "
    "stream_ingest_dedup_against_corpus. Oracle: full xxhash64 "
    "replay, same kernel as dedup_minhash_lsh.",
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabbithole_spark.operators.dedup import lsh_banded

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    is_batch = F.col("doc_id") % _INGEST_MOD == 0
    batch, corpus = d.filter(is_batch), d.filter(~is_batch)

    def bands(side: DataFrame) -> DataFrame:
        sh = side.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
        )
        return lsh_banded(
            minhash_signatures(sh, "doc_id", "shingles", 64),
            "doc_id",
            bands=16,
            rows_per_band=4,
        )

    cand = (
        bands(corpus)
        .join(
            F.broadcast(
                bands(batch).select(
                    F.col("doc_id").alias("batch_id"), "band", "band_hash"
                )
            ),
            ["band", "band_hash"],
        )
        .select("batch_id", F.col("doc_id").alias("corpus_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids_a = cand.select(F.col("batch_id").alias("doc_id")).distinct()
    ids_b = cand.select(F.col("corpus_id").alias("doc_id")).distinct()
    sh_a = d.join(F.broadcast(ids_a), "doc_id").select(
        F.col("doc_id").alias("batch_id"),
        word_shingles(F.col("text"), 3).alias("sh_a"),
    )
    sh_b = d.join(F.broadcast(ids_b), "doc_id").select(
        F.col("doc_id").alias("corpus_id"),
        word_shingles(F.col("text"), 3).alias("sh_b"),
    )
    raw = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        cand.join(F.broadcast(sh_a), "batch_id")
        .join(F.broadcast(sh_b), "corpus_id")
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= _INGEST_TAU)
        .select("batch_id", "corpus_id", F.round("_raw", 6).alias("jaccard"))
    )


# --- DSIR importance resampling (targeted data selection) -----------------------

#: DSIR split: which docs act as the TARGET sample (pretend benchmark /
#: domain corpus) vs the RAW pool being scored. Domain-tagged xxhash64
#: bucket, same discipline as _WINNOW_SPLIT_OFFSET / _SHARD_HASH_OFFSET
#: (tags 2^44 / 2^45 / 2^46 stay disjoint for doc ids below 2^44).
_DSIR_SPLIT_OFFSET = 1 << 46

#: hashed n-gram feature space (Xie et al. 2023 use 10k buckets; 256
#: keeps the oracle's per-bucket replay readable while preserving the
#: shape — the bucket count is a CONSTANT, never corpus-sized)
_DSIR_BUCKETS = 256

_DSIR_SPLIT_SQL = (
    f"((({xxh64_long_sql(f'(doc_id + {_DSIR_SPLIT_OFFSET})')})"
    " % 10) + 10) % 10"
)


def _dsir_oracle() -> str:
    from rabbithole_spark.functions.xxh64_sql import xxh64_sql

    b = _DSIR_BUCKETS
    return rf"""
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         {_DSIR_SPLIT_SQL} AS split,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     w -> w <> '') AS w
  FROM documents
  WHERE text IS NOT NULL
), grams AS MATERIALIZED (
  SELECT doc_id, split, gram FROM (
    SELECT doc_id, split, unnest(w) AS gram FROM tok
    UNION ALL
    SELECT t.doc_id, t.split, t.w[u.i] || ' ' || t.w[u.i + 1] AS gram
    FROM tok t, unnest(range(1, len(t.w))) AS u(i)
  )
), gcounts AS MATERIALIZED (
  SELECT doc_id, split, gram, CAST(count(*) AS BIGINT) AS n
  FROM grams GROUP BY doc_id, split, gram
), gdim AS MATERIALIZED (
  SELECT gram, ((({xxh64_sql('gram')}) % {b}) + {b}) % {b} AS bucket
  FROM (SELECT DISTINCT gram FROM gcounts)
), dcounts AS MATERIALIZED (
  SELECT doc_id, split, bucket, CAST(sum(n) AS BIGINT) AS n
  FROM gcounts JOIN gdim USING (gram)
  GROUP BY doc_id, split, bucket
), lm AS MATERIALIZED (
  SELECT s.bucket, coalesce(t.ct, 0) AS ct, coalesce(r.cr, 0) AS cr
  FROM (SELECT unnest(range(0, {b})) AS bucket) s
  LEFT JOIN (SELECT bucket, CAST(sum(n) AS BIGINT) AS ct
             FROM dcounts WHERE split = 0 GROUP BY bucket) t USING (bucket)
  LEFT JOIN (SELECT bucket, CAST(sum(n) AS BIGINT) AS cr
             FROM dcounts WHERE split <> 0 GROUP BY bucket) r USING (bucket)
), tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr FROM lm
), delta AS (
  SELECT bucket,
         CAST(ln((ct + 1) / CAST(nt + {b} AS DOUBLE)) AS DECIMAL(15,12))
       - CAST(ln((cr + 1) / CAST(nr + {b} AS DOUBLE)) AS DECIMAL(15,12)) AS d
  FROM lm, tot
), scored AS (
  SELECT doc_id,
         CAST(sum(n) AS BIGINT) AS n_feats,
         CAST(CAST(sum(CAST(n AS DECIMAL(18,0)) * d) AS VARCHAR)
              AS DOUBLE) AS lr
  FROM dcounts JOIN delta USING (bucket)
  WHERE split <> 0
  GROUP BY doc_id
)
SELECT doc_id, n_feats,
       round(lr, 6) AS dsir_logratio,
       lr > 0.0 AS selected
FROM scored
"""


@register(
    "mixture_dsir_importance",
    oracle=_dsir_oracle(),
    doc="DSIR targeted data selection (Xie et al. 2023, "
    "arXiv:2302.03169): score every raw-pool document by its "
    "importance log-ratio under two Laplace-smoothed bag-of-hashed-"
    "ngram models — one fit on a target sample (here a 10% domain-"
    "tagged xxhash64 split standing in for the benchmark/domain "
    "corpus), one on the raw pool — then select docs whose total "
    "log-ratio favors the target (sum over unigram+bigram feature "
    "instances of log p_target(bucket)/log p_raw(bucket); "
    "selected = lr > 0, a row-local fixed threshold like the CCNet "
    "classifier's, never a global ntile). Features are xxhash64-"
    "bucketed into a CONSTANT 256-bucket space, so both LM tables "
    "are 256 rows at any corpus size. Plan: one tokenize/explode "
    "pass feeds a localCheckpointed (doc, split, bucket) count "
    "relation consumed by the two LM fits and the scoring join "
    "(lesson 9); the LM/delta tables broadcast back; the only "
    "corpus-sized shuffles are the feature-count groupBy and the "
    "per-doc rollup. Numeric discipline: per-bucket log-prob deltas "
    "are DECIMAL(15,12) differences weighted by exact integer "
    "counts, so the per-doc sum is order-insensitive; one "
    "correctly-rounded decimal->double conversion per engine "
    "(numeric.py recipe). The oracle replays the split and the "
    "bucket hashing bit-exactly via xxh64_sql.",
)
def mixture_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _DSIR_BUCKETS
    d = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    w = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f]+"),
        lambda x: x != "",
    )
    # unigrams + bigrams in one generator pass; the bigram zip is over
    # two equal-length slices, so zip_with never NULL-pads
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, x: F.concat(a, F.lit(" "), x),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = d.select(
        "doc_id",
        F.pmod(
            F.xxhash64(F.col("doc_id") + F.lit(_DSIR_SPLIT_OFFSET)),
            F.lit(10),
        ).alias("split"),
        F.explode(F.concat(w, bigrams)).alias("gram"),
    ).select(
        "doc_id",
        "split",
        F.pmod(F.xxhash64("gram"), F.lit(b)).alias("bucket"),
    )
    dcounts = (
        feats.groupBy("doc_id", "split", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    spine = spark.range(b).select(F.col("id").cast("int").alias("bucket"))
    ct = (
        dcounts.filter(F.col("split") == 0)
        .groupBy("bucket")
        .agg(F.sum("n").alias("ct"))
    )
    cr = (
        dcounts.filter(F.col("split") != 0)
        .groupBy("bucket")
        .agg(F.sum("n").alias("cr"))
    )
    lm = (
        spine.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
        .localCheckpoint(eager=False)
    )
    tot = lm.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    delta = (
        F.log((F.col("ct") + 1) / (F.col("nt") + b).cast("double")).cast(
            DecimalType(15, 12)
        )
        - F.log((F.col("cr") + 1) / (F.col("nr") + b).cast("double")).cast(
            DecimalType(15, 12)
        )
    )
    deltas = lm.crossJoin(F.broadcast(tot)).select(
        "bucket", delta.alias("d")
    )
    scored = (
        dcounts.filter(F.col("split") != 0)
        .join(F.broadcast(deltas), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n").cast(DecimalType(18, 0)) * F.col("d"))
            .cast("double")
            .alias("lr"),
        )
    )
    return scored.select(
        "doc_id",
        "n_feats",
        F.round("lr", 6).alias("dsir_logratio"),
        (F.col("lr") > 0.0).alias("selected"),
    )


# --- Gopher quality rules (rule-based document filter) ---------------------------

#: the small high-frequency English word list Gopher's "stop word"
#: rule checks containment against (Rae et al. 2021, App. A1.1) — the
#: DEFAULT parameter; real pipelines configure the list per language/
#: domain (CCNet and Dolma both ship per-language lists)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: the driver corpus's actual function words: its synthetic vocabulary
#: contains exactly two of English's closed-class words, so the
#: registered query runs the rule with the corpus-adapted list — the
#: faithful analogue of configuring a per-language list — keeping BOTH
#: branches of the stop-word rule and the keep conjunction live at
#: every SF (measured ~63% / ~47%); with the paper's English list the
#: rule is vacuously false on this corpus (at most 'the' appears)
_CORPUS_STOPWORDS = ("the", "a")

_GOPHER_ORACLE = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     w -> w <> '') AS w,
         string_split_regex(text, '\r?\n') AS lines,
         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           AS hash_cnt,
         CAST((length(text) - length(replace(text, '...', ''))) // 3
              AS BIGINT) AS ell_cnt
  FROM documents
  WHERE text IS NOT NULL
), m AS (
  SELECT doc_id, hash_cnt, ell_cnt,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT)))
              AS BIGINT) AS sum_len,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS alpha_words,
         CAST(len(list_filter(lines,
                l -> regexp_matches(trim(l), '^[-*•]')))
              AS BIGINT) AS bullet_lines,
         CAST(len(list_filter(lines,
                l -> regexp_matches(trim(l), '(\.\.\.|…)$')))
              AS BIGINT) AS ell_lines,
         ({" + ".join(f"CAST(list_contains(list_transform(w, x -> lower(x)), '{sw}') AS BIGINT)" for sw in _CORPUS_STOPWORDS)})
           AS n_stop
  FROM d
)
SELECT doc_id, n_words, n_lines,
       CASE WHEN n_words > 0
            THEN round(sum_len / CAST(n_words AS DOUBLE), 6) END
         AS mean_word_len,
       (n_words BETWEEN 50 AND 100000) AS r_word_count,
       (n_words > 0 AND 3 * n_words <= sum_len
        AND sum_len <= 10 * n_words) AS r_mean_len,
       (10 * (hash_cnt + ell_cnt) <= n_words) AS r_symbol_ratio,
       (10 * bullet_lines <= 9 * n_lines) AS r_bullet_lines,
       (10 * ell_lines <= 3 * n_lines) AS r_ellipsis_lines,
       (10 * alpha_words >= 8 * n_words) AS r_alpha_words,
       (n_stop >= 2) AS r_stopwords,
       ((n_words BETWEEN 50 AND 100000)
        AND (n_words > 0 AND 3 * n_words <= sum_len
             AND sum_len <= 10 * n_words)
        AND (10 * (hash_cnt + ell_cnt) <= n_words)
        AND (10 * bullet_lines <= 9 * n_lines)
        AND (10 * ell_lines <= 3 * n_lines)
        AND (10 * alpha_words >= 8 * n_words)
        AND (n_stop >= 2)) AS keep
FROM m
"""


# Registered round 10 (built + 3-SF oracle-verified round 9, NOTES r9
# part 5; registration was deferred one round purely for verification-
# window arithmetic — see the catalog.py window comment).
_GOPHER_DOC = (
    "Gopher rule-based quality filter (Rae et al. 2021, App. A — "
    "the rule set FineWeb/Dolma reimplement): word count in [50, "
    "100k], mean word length in [3, 10], symbol-to-word ratio "
    "(# + ellipsis) <= 0.1, <= 90% bullet-started lines, <= 30% "
    "ellipsis-ended lines, >= 80% words containing an alphabetic "
    "character, and >= 2 distinct stop words (list-parameterized: "
    "Gopher's 8 English words are the default; the registered query "
    "uses the corpus's two function words so the rule is live on the "
    "synthetic vocabulary — see _CORPUS_STOPWORDS) "
    "— per-rule booleans + the conjunction. Every threshold compare "
    "is EXACT INTEGER arithmetic (10*symbols <= words, 3n <= "
    "sum_len <= 10n, ...), so no cross-engine float boundary exists "
    "anywhere in the rule evaluation; the only double is the "
    "display-rounded mean word length. Scale shape: pure row-local "
    "scalar expressions over one scan — zero shuffles, zero joins, "
    "the cheapest possible 100 TB filter pass. Tokenization uses the "
    "shared explicit whitespace class (equals RE2 whitespace, "
    "test_whitespace_class.py); the stop-word count "
    "is a fixed-order sum of array_contains flags (distinct "
    "containment, not occurrences, per the Gopher wording)."
)


@register("text_gopher_rules", oracle=_GOPHER_ORACLE, doc=_GOPHER_DOC)
def text_gopher_rules(
    spark: SparkSession,
    sf_dir: str,
    stopwords: tuple[str, ...] = _CORPUS_STOPWORDS,
) -> DataFrame:
    """Rule filter over ``documents``; ``stopwords`` parameterizes the
    containment rule (Gopher's English list ``_GOPHER_STOPWORDS`` for
    natural-language corpora; the registered default is the driver
    corpus's function words so both rule branches stay live — the
    oracle replays the default)."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+"), lambda x: x != ""
    )
    # \r?\n delimiter: CRLF text must not leave a trailing \r on the
    # line (Java's $ matches BEFORE a final line terminator where
    # RE2's does not — round-9 review, empirically confirmed)
    lines = F.split(F.col("text"), "\r?\n")
    hash_cnt = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    ).cast("long")
    ell_cnt = (
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("...")))
        )
        / F.lit(3)
    ).cast("long")
    m = d.select(
        "doc_id",
        w.alias("w"),
        lines.alias("lines"),
        hash_cnt.alias("hash_cnt"),
        ell_cnt.alias("ell_cnt"),
    ).select(
        "doc_id",
        "hash_cnt",
        "ell_cnt",
        F.size("w").cast("long").alias("n_words"),
        F.size("lines").cast("long").alias("n_lines"),
        F.aggregate(
            "w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.size(
            F.filter(F.col("w"), lambda x: x.rlike("[a-zA-Z]"))
        ).cast("long").alias("alpha_words"),
        F.size(
            F.filter(
                F.col("lines"),
                lambda x: F.trim(x).rlike(r"^[-*•]"),
            )
        ).cast("long").alias("bullet_lines"),
        F.size(
            F.filter(
                F.col("lines"),
                # \z = absolute end (Java $ also matches before a
                # final \r/\n/\u2028..., RE2 $ does not)
                lambda x: F.trim(x).rlike("(\\.\\.\\.|…)\\z"),
            )
        ).cast("long").alias("ell_lines"),
        sum(
            [
                F.array_contains(
                    F.transform(F.col("w"), F.lower), F.lit(sw)
                ).cast("long")
                for sw in stopwords
            ],
            F.lit(0).cast("long"),
        ).alias("n_stop"),
    )
    r_word_count = (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
    r_mean_len = (
        (F.col("n_words") > 0)
        & (3 * F.col("n_words") <= F.col("sum_len"))
        & (F.col("sum_len") <= 10 * F.col("n_words"))
    )
    r_symbol = 10 * (F.col("hash_cnt") + F.col("ell_cnt")) <= F.col("n_words")
    r_bullet = 10 * F.col("bullet_lines") <= 9 * F.col("n_lines")
    r_ell = 10 * F.col("ell_lines") <= 3 * F.col("n_lines")
    r_alpha = 10 * F.col("alpha_words") >= 8 * F.col("n_words")
    r_stop = F.col("n_stop") >= 2
    return m.select(
        "doc_id",
        "n_words",
        "n_lines",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("sum_len") / F.col("n_words").cast("double"), 6),
        ).alias("mean_word_len"),
        r_word_count.alias("r_word_count"),
        r_mean_len.alias("r_mean_len"),
        r_symbol.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet_lines"),
        r_ell.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (
            r_word_count
            & r_mean_len
            & r_symbol
            & r_bullet
            & r_ell
            & r_alpha
            & r_stop
        ).alias("keep"),
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) -----------------

#: E-S sampler split tag: 2^47 stays disjoint from the winnow (2^44),
#: shard (2^45) and DSIR (2^46) domains for doc ids below 2^44
_ES_TAG = 1 << 47

#: fixed sample size (k < corpus size at every SF)
_ES_K = 100

#: Laplace-style weight floor: quality_score is a discrete {0, .3, .4,
#: .7, 1} heuristic and CAN be exactly 0; the floor keeps zero-score
#: docs sampleable (w > 0 is E-S's precondition) and avoids the
#: ln(u)/0 = -inf key edge entirely
_ES_W_FLOOR = 0.1

_ES_M = 1 << 53  # u = (h mod 2^53 + 1) / 2^53: exact double, in (0, 1]

_ES_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {{q}} AS quality,
         (((({{h}}) % {_ES_M}) + {_ES_M}) % {_ES_M} + 1)
           / CAST({_ES_M} AS DOUBLE) AS u
  FROM documents
  WHERE text IS NOT NULL
), keyed AS (
  SELECT doc_id, lang, quality,
         ln(u) / (quality + {_ES_W_FLOOR}) AS es_key
  FROM scored
), topk AS (
  -- ORDER BY/LIMIT on the UNROUNDED key, in a subquery: in the final
  -- SELECT DuckDB resolves `ORDER BY es_key` to the round(...) output
  -- alias, so a 6-dp rounded tie straddling the k boundary would pick
  -- different rows than Spark's unrounded ranking (round-9 advice)
  SELECT doc_id, lang, quality, es_key
  FROM keyed
  ORDER BY es_key DESC, doc_id
  LIMIT {_ES_K}
)
SELECT doc_id, lang, round(quality, 6) AS quality,
       round(es_key, 6) AS es_key
FROM topk
"""


def _es_oracle() -> str:
    return _ES_ORACLE.format(
        q=_QUALITY_CASE_SQL,
        h=xxh64_long_sql(f"(doc_id + {_ES_TAG})"),
    )


# Registered round 10 (built + 3-SF oracle-verified round 9; same
# one-round window-arithmetic deferral as text_gopher_rules).
_ES_DOC = (
    "Weighted sampling WITHOUT replacement, exactly k docs "
    "(Efraimidis & Spirakis 2006): each doc draws a deterministic "
    "uniform u from a domain-tagged xxhash64 (u = (h mod 2^53 + 1) / "
    "2^53, exact in double) and is ranked by ln(u)/w — the top-k by "
    "that key IS a weighted sample without replacement, where w = "
    "quality_score + 0.1 (floored: the discrete heuristic can be "
    "exactly 0 and E-S requires w > 0). Unlike "
    "sample_quality_weighted (independent Bernoulli keeps, "
    "variable-size output), this yields a FIXED-SIZE sample — the "
    "eval-set construction primitive. Deterministic end-to-end: no "
    "RNG state, replayable byte-for-byte, ties broken by doc_id. "
    "Scale shape: key assignment is scan-local; the only 'sort' is "
    "TakeOrderedAndProject bounded by k, never a global sort — at "
    "100 TB this is one map pass + a k-row reduction."
)


@register("sample_weighted_no_replacement", oracle=_es_oracle(), doc=_ES_DOC)
def sample_weighted_no_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    q = quality_score(F.col("text"))
    u = (
        F.pmod(F.xxhash64(F.col("doc_id") + F.lit(_ES_TAG)), F.lit(_ES_M))
        + 1
    ) / F.lit(float(_ES_M))
    key = F.log(u) / (q + F.lit(_ES_W_FLOOR))
    return (
        d.select("doc_id", "lang", q.alias("quality"), key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(_ES_K)
        .select(
            "doc_id",
            "lang",
            F.round("quality", 6).alias("quality"),
            F.round("es_key", 6).alias("es_key"),
        )
    )
