"""Corpus-curation operators a training-data pipeline runs before export:
benchmark decontamination and PII redaction.

Like the rest of the training-data suite these go beyond the reference's
own inventory (the reference curates per-document via an LLM call,
reference core/extractor.py:249-255 — one HTTP request per doc); here the
same curation intent is expressed as set-at-a-time DataFrame ops that cost
one scan plus bounded shuffles at any corpus size.

Decontamination follows the n-gram-overlap procedure used for LLM training
sets (Brown et al. 2020 appendix C: mark a training document contaminated
when it shares an n-gram with any benchmark document): explode documents
into word n-grams, hash each gram, and join against the benchmark's gram
set. The benchmark side is always tiny relative to the corpus (an eval
suite is ~10^5-10^6 grams vs 10^12 documents), so the join is a BROADCAST
hash join — the corpus side never shuffles for the probe; the only shuffle
is the per-doc hit-count aggregation, keyed by doc id with map-side
partial aggregation.

PII redaction is the standard pre-release scrub (emails / phone numbers /
IP addresses → typed placeholder tokens): pure `regexp_count` /
`regexp_replace` column expressions inside whole-stage codegen — zero
shuffle, zero UDFs, linear in corpus bytes. Patterns are written in the
common subset of Java regex (Spark) and RE2 (DuckDB) so the oracle runs
the byte-identical rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extractor_spark.operators.registry import load, register

# --- benchmark decontamination --------------------------------------------

_DECON_N = 8  # words per contamination gram (GPT-3 used 13; the synthetic
# docs are ~100 words, so 8 keeps several grams per doc at sf0.001 too)
_BENCH_MOD = 10  # doc_id % 10 == 0 → the held-out "benchmark" slice


def decontaminate(docs, bench, n: int = _DECON_N):
    """Flag training docs sharing any word n-gram with a benchmark corpus.

    `docs` / `bench`: frames of (doc_id, ws) where ws is the whitespace
    token array. Returns (doc_id, n_grams, hit_grams, contaminated) for
    every training doc. Grams are md5-hashed before the join so the probe
    key is a fixed 32-byte value instead of an unbounded string — at scale
    that is what keeps the broadcast table and the exchange rows small.
    """
    gram_arr = F.expr(
        f"transform(sequence(0, greatest(size(ws)-{n}, -1)), "
        f"i -> array_join(slice(ws, i+1, {n}), ' '))"
    )

    def grams(df):
        return df.select(
            "doc_id", F.explode(gram_arr).alias("g")
        ).withColumn("h", F.md5("g"))

    bench_h = grams(bench).select("h").distinct()
    hits = (
        grams(docs)
        .join(F.broadcast(bench_h), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("hit_grams"))
    )
    base = docs.select(
        "doc_id",
        F.greatest(F.size("ws") - F.lit(n - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("hit_grams", F.lit(0)).cast("long").alias("hit_grams"),
        (F.coalesce("hit_grams", F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "decontam_ngrams",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f\\x0B]+') AS ws
      FROM documents
    ), grams AS (
      SELECT doc_id, md5(list_aggregate(ws[i+1:i+{_DECON_N}], 'string_agg', ' ')) AS h
      FROM (SELECT doc_id, ws,
                   unnest(range(greatest(len(ws)-{_DECON_N}+1, 0))) AS i
            FROM docs)
    ), bench AS (
      SELECT DISTINCT h FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    ), hits AS (
      SELECT doc_id, count(DISTINCT grams.h) AS hit_grams
      FROM grams JOIN bench USING (h)
      WHERE doc_id % {_BENCH_MOD} <> 0 GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(greatest(len(ws) - {_DECON_N - 1}, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(h.hit_grams, 0) AS BIGINT) AS hit_grams,
           coalesce(h.hit_grams, 0) > 0 AS contaminated
    FROM docs d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    ORDER BY d.doc_id
    """,
    doc="Benchmark decontamination (Brown et al. 2020 n-gram overlap): "
    f"every doc_id % {_BENCH_MOD} == 0 document stands in for the eval "
    "suite; the remaining 90% are the training corpus. A training doc is "
    "contaminated when it shares any 8-word gram with the benchmark. "
    "Bench gram-hash set → broadcast hash join (corpus side never "
    "shuffles to probe); per-doc hit counts are the only shuffle. "
    "Plan-pinned in tests/test_plans.py.",
)
def decontam_ngrams(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+").alias("ws")
    )
    bench = d.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = d.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return decontaminate(train, bench).orderBy("doc_id")


# --- PII detection + redaction --------------------------------------------

# Java-regex ∩ RE2 subset: no lookaround, no backrefs; \b is ASCII word
# boundary in both engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b555-[0-9]{4}\b",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df, text_col: str = "t"):
    """Append n_email / n_phone / n_ip counts and a `redacted` column.

    Counts use the pre-redaction text; redaction applies email → phone →
    ip in that fixed order (the placeholders contain no digits or '@', so
    later patterns cannot match inside an earlier replacement). All six
    expressions are regexp primitives inside one codegen stage.
    """
    red = F.col(text_col)
    for kind in ("email", "phone", "ip"):
        red = F.regexp_replace(red, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return df.select(
        "*",
        F.regexp_count(text_col, F.lit(PII_PATTERNS["email"])).cast("long").alias("n_email"),
        F.regexp_count(text_col, F.lit(PII_PATTERNS["phone"])).cast("long").alias("n_phone"),
        F.regexp_count(text_col, F.lit(PII_PATTERNS["ip"])).cast("long").alias("n_ip"),
        red.alias("redacted"),
    )


@register(
    "pii_redact",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             concat_ws(' ',
               substr(text, 1, 80),
               'contact user' || doc_id || '@' || source || '.org',
               CASE WHEN doc_id % 3 = 0
                    THEN 'call 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') END,
               CASE WHEN doc_id % 4 = 0
                    THEN 'host 10.' || (doc_id % 256) || '.' || ((doc_id * 3) % 256)
                         || '.' || ((doc_id * 7) % 256) END
             ) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
    FROM aug ORDER BY doc_id
    """,
    doc="PII scrub over the documents table. The synthetic corpus carries "
    "no PII, so the query first DERIVES it deterministically from existing "
    "columns (email per doc, phone for doc_id%3==0, IPv4 for doc_id%4==0 — "
    "same derivation in the oracle), then counts and redacts with shared "
    "Java∩RE2 patterns. Redacted text itself is part of the hash-verified "
    "output, so placeholder positions are value-checked too. Zero shuffle: "
    "one codegen stage over the scan.",
)
def pii_redact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.substring("text", 1, 80),
            F.concat(
                F.lit("contact user"), F.col("doc_id").cast("string"),
                F.lit("@"), F.col("source"), F.lit(".org"),
            ),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("call 555-"),
                    F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
                ),
            ),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit("host 10."), (F.col("doc_id") % 256).cast("string"),
                    F.lit("."), ((F.col("doc_id") * 3) % 256).cast("string"),
                    F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ),
        ).alias("t"),
    )
    return (
        redact_pii(aug)
        .select("doc_id", "n_email", "n_phone", "n_ip", "redacted")
        .orderBy("doc_id")
    )
