"""Information-retrieval index structures over the document corpus:
inverted index and bounded token co-occurrence.

The retrieval side of a training-data pipeline: once a corpus is
cleaned and deduped, consumers need "which documents contain token t"
(inverted index — the join-back structure for decontamination and
targeted filtering) and "which tokens travel together" (co-occurrence
— the raw counts under PMI/embedding-style association measures;
association SCORES involve logs whose libm rounding is not
engine-portable, so the operator emits exact counts and leaves the
score arithmetic to the consumer).

Scale notes:
- The inverted index is explode → distinct → groupBy token: shuffle
  keys are tokens, and posting lists are per-token — the classic
  skew hazard is stopword tokens whose postings approach |corpus|.
  The posting ARRAY is therefore capped (deterministically, smallest
  doc_ids) while df_count stays exact; the uncapped list lives in
  storage partitioned by token prefix, not in one array cell.
- Co-occurrence explodes the leading token window per document
  (k tokens → k·(k-1)/2 pairs, k=12 capped ⇒ ≤66 pairs/doc — the
  blow-up is bounded by the cap², independent of document length or
  corpus size), then one count aggregation on the pair key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load

_POSTINGS_CAP = 32


@query(
    "text_inverted_index",
    f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df_count,
           array_to_string(list_sort(list(doc_id))[1:{_POSTINGS_CAP}], ',')
               AS postings
    FROM tok
    GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token → (document frequency, capped sorted posting list).

    df_count is exact for every token; the materialized posting array
    keeps the {_POSTINGS_CAP} smallest doc_ids — deterministic under
    any partitioning (sort-then-slice, not first-seen), exactly what
    both engines compute. Hot stopword tokens therefore cost one
    bounded array, never an unbounded collect. Postings are emitted
    ','-joined (array cells crash the driver's pandas sort)."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    return tok.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df_count"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, _POSTINGS_CAP),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


@query(
    "text_cooccurrence",
    """
    WITH head AS (
      SELECT doc_id, string_split(text, ' ')[1:12] AS toks FROM documents
    ), pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b
      FROM (SELECT doc_id, unnest(toks) AS tok FROM head) a
      JOIN (SELECT doc_id, unnest(toks) AS tok FROM head) b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
    )
    SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pairs
    GROUP BY tok_a, tok_b
    HAVING COUNT(*) >= 10
    """,
)
def text_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence counts within each document's leading
    12-token window, thresholded to recurring pairs.

    The pair explosion is bounded by the window cap (≤66 pairs/doc),
    so the pre-aggregation row count is linear in corpus size with a
    small constant; the count aggregation partial-combines map-side on
    the pair key. Count duplicates from repeated tokens inside one
    window are intentional on both sides (the self-join semantics) —
    exact-match territory, no floating point anywhere."""
    head = load(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 12).alias("toks")
    )
    a = head.select("doc_id", F.explode("toks").alias("tok_a"))
    b = head.select("doc_id", F.explode("toks").alias("tok_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 10)
    )


@query(
    "text_pmi",
    """
    WITH head AS (
      SELECT doc_id, string_split(text, ' ')[1:12] AS toks FROM documents
    ), presence AS (
      SELECT DISTINCT doc_id, unnest(toks) AS tok FROM head
    ), tok_df AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok FROM presence GROUP BY tok
    ), pair_df AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM presence a JOIN presence b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2 HAVING COUNT(*) >= 10
    ), total AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM head
    )
    SELECT p.tok_a, p.tok_b, p.n_ab,
           CAST(FLOOR(ln(CAST(p.n_ab AS DOUBLE) * t.n_docs
                         / (CAST(da.n_tok AS DOUBLE) * db.n_tok))
                      * 1000000) AS BIGINT) AS pmi_e6
    FROM pair_df p
    JOIN tok_df da ON da.tok = p.tok_a
    JOIN tok_df db ON db.tok = p.tok_b
    CROSS JOIN total t
    """,
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over windowed co-occurrence
    (round 6): text_cooccurrence counts pairs; PMI normalizes them by
    marginal frequency — ln(P(a,b)/(P(a)P(b))) — which is what turns
    raw counts into COLLOCATIONS ('key'+'order' fire together beyond
    chance) and is the statistic behind phrase mining, word2vec's SGNS
    objective (implicit PMI factorization), and stop-pair pruning.

    Presence semantics (DISTINCT token-per-doc before counting) make
    the probabilities document frequencies — the standard PMI corpus
    estimator.  Marginals, pair counts, and doc total are exact
    bigints; the log enters once per pair in the oracle's literal
    order, floored e6.

    Scale: the pair explosion is bounded by the same ≤66-pairs/doc
    window cap as text_cooccurrence; marginal and total tables are
    vocab/1-row sized (broadcast); thresholded pairs are the only
    wide aggregation."""
    head = load(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split("text", " "), 1, 12).alias("toks")
    )
    presence = head.select(
        "doc_id", F.explode("toks").alias("tok")
    ).distinct()
    tok_df = presence.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("n_tok")
    )
    a = presence.select("doc_id", F.col("tok").alias("tok_a"))
    b = presence.select(F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b"))
    pair_df = (
        a.join(b, (a.doc_id == b.doc_b) & (F.col("tok_a") < F.col("tok_b")))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 10)
    )
    total = head.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    da = tok_df.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("na"))
    db = tok_df.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("nb"))
    joined = (
        pair_df.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(total))
    )
    pmi = F.floor(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("n_docs")
            / (F.col("na").cast("double") * F.col("nb"))
        )
        * 1000000
    ).cast("bigint")
    return joined.select("tok_a", "tok_b", "n_ab", pmi.alias("pmi_e6"))


@query(
    "rank_biased_overlap",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM lineitem GROUP BY l_partkey
    ), qty AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS v
        FROM lineitem GROUP BY l_partkey
    ), ra AS (
        SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY v DESC, l_partkey)
                   AS r
        FROM rev QUALIFY r <= 20
    ), rb AS (
        SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY v DESC, l_partkey)
                   AS r
        FROM qty QUALIFY r <= 20
    ), entries AS (
        SELECT GREATEST(ra.r, rb.r) AS entry
        FROM ra JOIN rb USING (l_partkey)
    ), depths AS (
        SELECT unnest(range(1, 21)) AS d
    ), xd AS (
        SELECT d, CAST(COUNT(e.entry) AS BIGINT) AS x
        FROM depths LEFT JOIN entries e ON e.entry <= d
        GROUP BY d
    ), folded AS (
        SELECT CAST(SUM(CASE WHEN d = 20 THEN x END) AS BIGINT)
                   AS n_common,
               list_reduce(
                   list_transform(
                       [CAST(1.0 AS DOUBLE)]
                       || list(CAST(x AS DOUBLE) / d ORDER BY d),
                       x -> [x, CAST(0.0 AS DOUBLE)]),
                   (a, b) -> [a[1] * CAST(0.9 AS DOUBLE),
                              a[2] + a[1] * b[1]]) AS st
        FROM xd
    )
    SELECT n_common,
           CAST(FLOOR(st[2] * 0.1 * 1000000) AS BIGINT)
               AS rbo_trunc_e6
    FROM folded
    """,
)
def rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap between two top-20 rankings (round 7) —
    parts by REVENUE vs parts by QUANTITY, compared with the
    top-weighted indefinite-ranking similarity of Webber et al.
    (truncated form, p = 0.9): RBO = (1−p)·Σ p^{d−1}·|A₁..d ∩
    B₁..d|/d.  The ranking-STABILITY leg of the eval family —
    embed_retrieval_ndcg scores one ranking against relevance; RBO
    scores two rankings against each other (did the re-rank change
    what users actually see?).

    Determinism: prefix-intersection sizes come from each common
    part's ENTRY DEPTH max(ra, rb) — exact integers; the 20-term
    weighted sum runs as an ORDERED fold (sorted list → list_reduce /
    F.aggregate carrying [pw, acc]) so both engines execute the
    identical IEEE sequence — no SUM() float reassociation, no pow()
    (powers accumulate by repeated multiply, the ts_holt fold
    discipline).

    Scale: rankings are top-k of keyed aggregates (WindowGroupLimit
    class); everything after is ≤20-row arithmetic."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    qty = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )

    def top20(df):
        w = Window.orderBy(F.col("v").desc(), "l_partkey")
        return (
            df.select("l_partkey", F.row_number().over(w).alias("r"))
            .filter(F.col("r") <= 20)
        )

    ra = top20(rev).select("l_partkey", F.col("r").alias("ra"))
    rb = top20(qty).select("l_partkey", F.col("r").alias("rb"))
    entries = ra.join(rb, "l_partkey").select(
        F.greatest("ra", "rb").alias("entry")
    )
    depths = spark.range(1, 21).select(F.col("id").cast("int").alias("d"))
    xd = (
        depths.join(entries, F.col("entry") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("entry").cast("bigint").alias("x"))
    )
    folded = xd.agg(
        F.sum(F.when(F.col("d") == 20, F.col("x")))
        .cast("bigint")
        .alias("n_common"),
        # NOTE: Spark's aggregate() takes an explicit seed, so the
        # ratio array carries NO sentinel; the DuckDB oracle prepends
        # a 1.0 sentinel because list_reduce seeds from element 1.
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("d").cast("int").alias("d"),
                            (
                                F.col("x").cast("double") / F.col("d")
                            ).alias("r"),
                        )
                    )
                ),
                lambda s: s["r"],
            ),
            F.struct(
                F.lit(1.0).alias("pw"), F.lit(0.0).alias("acc")
            ),
            lambda a, x: F.struct(
                (a["pw"] * 0.9).alias("pw"),
                (a["acc"] + a["pw"] * x).alias("acc"),
            ),
        ).alias("st"),
    )
    return folded.select(
        "n_common",
        F.floor(F.col("st")["acc"] * 0.1 * 1000000)
        .cast("bigint")
        .alias("rbo_trunc_e6"),
    )


_BM25_QUERIES = (
    (1, ("table", "scan")),
    (2, ("hash", "value")),
    (3, ("slow", "fast")),
)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5


def _bm25_oracle_sql() -> str:
    qterms = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _BM25_QUERIES for t in ts
    )
    return f"""
    WITH qt AS (
        SELECT * FROM (VALUES {qterms}) v(query_id, term)
    ), doclen AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ), corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS sum_dl
        FROM doclen
    ), tf AS (
        SELECT t.doc_id, t.token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) t
        JOIN (SELECT DISTINCT term FROM qt) q ON t.token = q.term
        GROUP BY t.doc_id, t.token
    ), df AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ), contrib AS (
        SELECT q.query_id, f.doc_id,
               CAST(FLOOR(
                   ln((CAST(c.n_docs AS DOUBLE) - d.df + 0.5)
                      / (d.df + 0.5) + 1.0)
                   * (CAST(f.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
                   / (CAST(f.tf AS DOUBLE)
                      + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * CAST(l.dl AS DOUBLE)
                                        / (CAST(c.sum_dl AS DOUBLE)
                                           / c.n_docs)))
                   * 1000000) AS BIGINT) AS w_e6
        FROM tf f
        JOIN qt q ON f.token = q.term
        JOIN df d ON f.token = d.token
        JOIN doclen l ON f.doc_id = l.doc_id
        CROSS JOIN corpus c
    ), scored AS (
        SELECT query_id, doc_id, CAST(SUM(w_e6) AS BIGINT) AS score_e6
        FROM contrib GROUP BY query_id, doc_id
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_e6, rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    ORDER BY query_id, rnk
    """


@query("text_bm25_topk", _bm25_oracle_sql())
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (round 9) — the lexical ranking function
    behind Lucene/Elasticsearch and the sparse half of every hybrid
    RAG retriever: score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·
    (1−b+b·dl/avgdl)) with the Lucene idf = ln((N−df+0.5)/(df+0.5)
    +1), k1=1.2, b=0.75. On a training-data pipeline this is the
    decontamination/retrieval workhorse the inverted index
    (text_inverted_index) exists to serve; three literal 2-term
    queries exercise it end-to-end.

    Exactness: tf, df, dl, N, Σdl are exact integers; each (query,
    term, doc) contribution floors to e6 through ONE double chain
    (ln parity precedent: agg_kl_divergence), and per-doc scores are
    order-free INTEGER sums of those — no unordered double
    accumulation, so ties in the final ranking are broken on the
    integer score then doc_id, deterministically in both engines.

    Scale: the token explode filters to query terms via a broadcast
    semi-join BEFORE any shuffle (candidate postings only — the
    inverted-index access path, not a corpus scan per query); df and
    corpus stats are tiny broadcast anchors; ranking is a keyed
    window per query_id."""
    docs = load(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in _BM25_QUERIES for t in ts],
        "query_id int, term string",
    )
    doclen = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    corpus = doclen.groupBy().agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    terms = qt.select("term").distinct()
    tf = (
        toks.join(F.broadcast(terms), toks.token == terms.term)
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    contrib = (
        tf.join(F.broadcast(qt), tf.token == qt.term)
        .join(F.broadcast(df), "token")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    tfd = F.col("tf").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    w = (
        idf
        * (tfd * (_BM25_K1 + 1.0))
        / (
            tfd
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl").cast("double") / avgdl)
        )
        * 1000000
    )
    scored = (
        contrib.select(
            "query_id",
            "doc_id",
            F.floor(w).cast("bigint").alias("w_e6"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w_e6").cast("bigint").alias("score_e6"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), "doc_id"
    )
    return (
        scored.withColumn(
            "rnk", F.row_number().over(w_rank).cast("bigint")
        )
        .filter(F.col("rnk") <= _BM25_TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "doc_id",
            "score_e6",
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )
