"""TEXT_MATCH analog (SURVEY §2.B B13): inverted-index term search.

Pinot's ``TEXT_MATCH(col, 'lucene query')`` consults a per-segment Lucene
index **[P1.2]** (no text index is configured in the reference deployment —
kinesisTableConfigFile.json:12-27 — so this is surface parity, not config
parity).  The Spark-native equivalent of an inverted index is a *postings
relation* ``(token, doc_id)``: materialized once (at 100 TB: bucketed by
token, so every term lookup is a bucket-pruned scan), then term queries are
semi-joins instead of full-corpus regex scans.

Supported query grammar (the common TEXT_MATCH forms):
- ``term``                      — single term
- ``t1 AND t2 [AND ...]``       — all terms present
- ``t1 OR t2 [OR ...]``         — any term present
- ``"exact phrase"``            — all words present + substring verification

Terms are analyzed like the corpus: lowercased, split on non-alphanumerics
(Lucene StandardAnalyzer approximation, same tokenizer as operators/dedup).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_tokens


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, id) postings relation — the inverted index.

    One narrow shuffle-free pass (tokenize + explode); ``distinct`` per doc
    happens via ``array_distinct`` BEFORE the explode so the fan-out carries
    no duplicate (token, doc) pairs.  Persist with
    ``catalog.write_bucketed(postings, name, ["token"])`` to make every term
    lookup bucket-pruned at scale.
    """
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(normalized_tokens(F.col(text_col)))).alias("token"),
    ).select("token", "id")


def _analyze(term: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", term.lower()) if t]


def persist_text_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_table: str,
    num_buckets: int = 32,
) -> None:
    """Materialize the inverted index as a TOKEN-BUCKETED catalog table.

    This is the Lucene-index-analog persistence the per-query path only
    documents: pay the tokenize+explode+shuffle ONCE at build time; every
    subsequent term lookup reads only hash(token)-selected buckets and any
    postings-side aggregate/join on ``token`` runs exchange-free (the bucket
    layout already satisfies the distribution).  Rebuild per ingest batch or
    compaction cycle, exactly like Pinot refreshes per-segment indexes.
    """
    from .. import catalog as _catalog

    postings = build_postings(df, id_col, text_col)
    _catalog.write_bucketed(
        postings, index_table, ["token"], num_buckets=num_buckets, sort_cols=["token"]
    )


def text_match_indexed(
    df: DataFrame, id_col: str, text_col: str, index_table: str, query: str
) -> DataFrame:
    """TEXT_MATCH served from a :func:`persist_text_index` table.

    Same postings algebra as :func:`matching_ids`, but the postings scan is
    bucket-pruned on the query's terms and the AND-membership aggregate
    rides the bucket layout with no exchange on the postings side.  Phrase
    adjacency still verifies against the (semi-join-surviving) source rows.
    """
    spark = df.sparkSession
    ids = matching_ids(spark.table(index_table), query)
    out = df.join(ids.withColumnRenamed("id", id_col), id_col, "left_semi")
    return _verify_phrase(out, text_col, query)


def _verify_phrase(out: DataFrame, text_col: str, query: str) -> DataFrame:
    """Adjacency verification for phrase queries: analyzed words joined by
    single spaces must appear in the analyzed text; both sides space-padded
    so containment respects token boundaries ("cat dog" must not match
    tokens [cat, bobcat, dog]).  Non-phrase queries pass through."""
    q = query.strip()
    if not (q.startswith('"') and q.endswith('"')):
        return out
    phrase = " ".join(_analyze(q.strip('"')))
    analyzed = F.array_join(normalized_tokens(F.col(text_col)), " ")
    padded = F.concat(F.lit(" "), analyzed, F.lit(" "))
    return out.filter(F.contains(padded, F.lit(" " + phrase + " ")))


def matching_ids(postings: DataFrame, query: str) -> DataFrame:
    """ids matching the TEXT_MATCH query — pure postings algebra.

    AND = |terms|-way membership count (one aggregate, no self-joins);
    OR = filter + distinct.  Phrases handle the membership part here and the
    adjacency part in :func:`text_match` (needs the原text).
    """
    q = query.strip()
    phrase = q.startswith('"') and q.endswith('"')
    if phrase:
        terms, conj = _analyze(q.strip('"')), "AND"
    elif re.search(r"\bOR\b", q):
        terms, conj = [t for p in re.split(r"\bOR\b", q) for t in _analyze(p)], "OR"
    else:
        terms, conj = [t for p in re.split(r"\bAND\b", q) for t in _analyze(p)], "AND"
    if not terms:
        raise ValueError(f"empty TEXT_MATCH query: {query!r}")
    hits = postings.filter(F.col("token").isin(terms))
    if conj == "OR" or len(terms) == 1:
        return hits.select("id").distinct()
    return (
        hits.groupBy("id")
        .agg(F.count_distinct("token").alias("_nt"))
        .filter(F.col("_nt") == len(terms))
        .select("id")
    )


def text_match(df: DataFrame, id_col: str, text_col: str, query: str) -> DataFrame:
    """Rows of ``df`` whose ``text_col`` matches the TEXT_MATCH ``query``.

    Builds postings inline (callers with a persisted index use
    :func:`matching_ids` + their own semi-join).  The semi-join broadcasts
    the (small) id set when Catalyst sizes it under the threshold.
    """
    ids = matching_ids(build_postings(df, id_col, text_col), query)
    out = df.join(ids.withColumnRenamed("id", id_col), id_col, "left_semi")
    return _verify_phrase(out, text_col, query)


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching doc for a bag-of-terms query.

    The ranking layer Lucene puts on top of its inverted index (Pinot's
    TEXT_MATCH exposes matching, not scores — this is the natural extension).
    Everything is postings algebra: term frequencies from one explode pass,
    document frequencies from a tiny per-term aggregate (broadcast), doc
    lengths from the same tokenize pass; one final per-doc aggregate sums the
    per-term BM25 contributions.  Returns (id, score) for docs matching at
    least one term; deterministic double math (fixed per-term sum order via
    the aggregate over sorted terms).

    Fully lazy: corpus stats (N, avgdl) are a 1-row aggregate broadcast into
    the plan — building this DataFrame submits NO job (the round-1 version
    collect()ed avgdl eagerly, putting a driver round-trip in the pipeline).
    """
    terms = _analyze(query)
    if not terms:
        raise ValueError(f"empty BM25 query: {query!r}")
    toks = normalized_tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks")).select(
        "id", "_toks", F.size("_toks").alias("dl")
    )
    # corpus stats as a broadcastable 1-row relation (sum/count are exact
    # integer math, so the double division is deterministic)
    stats = base.agg(
        F.count("*").cast("double").alias("_n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("_avgdl"),
    )

    tf = (
        base.select("id", "dl", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("id", "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count_distinct("id").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            (F.col("_n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            "token",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl")))
            ).alias("c"),
        )
    )
    # fixed summation order (by token) keeps double addition deterministic
    return (
        contrib.groupBy("id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("token", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s.getField("c"),
            ).alias("score")
        )
    )
