"""Similarity search over ``embeddings`` under the DuckDB oracle.

The Spark side calls the real engine operators
(``crawlers_spark.operators.similarity``). Numeric portability comes
from integer quantization (round(x*1000) → exact bigint dot products,
order-independent) and a floor-based round6 written identically in
both engines — see ``similarity.py``'s module docstring.

Near-dup corpus (same on both sides): embeddings ∪ doubled copies
(vec_id+10000, 2·embedding) of vec_id%10=0 — same direction, so each
copy is an exact cosine≈1 duplicate of its original.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlers_spark.harness.common import load
from crawlers_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    semdedup_prune,
)

N_DIMS = 64

# Quantized-vector + round6 SQL fragments (the oracle restatement of
# similarity.py's contract).
_Q = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_ROUND6 = "floor({} * 1000000.0 + 0.5) / 1000000.0"

_SQL_DOTS = f"""
  SELECT q.query_id, c.neighbor_id,
         sum(q.qv[CAST(d AS INT)] * c.cv[CAST(d AS INT)]) AS dot,
         sum(q.qv[CAST(d AS INT)] * q.qv[CAST(d AS INT)]) AS nq,
         sum(c.cv[CAST(d AS INT)] * c.cv[CAST(d AS INT)]) AS nc
  FROM (SELECT vec_id AS query_id, {_Q} AS qv FROM embeddings WHERE vec_id < 10) q
  CROSS JOIN (SELECT vec_id AS neighbor_id, {_Q} AS cv FROM embeddings) c
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  WHERE c.neighbor_id <> q.query_id
  GROUP BY q.query_id, c.neighbor_id
"""


# ------------------------------------------------ brute-force top-k
def q_cosine_topk(spark, sf):
    e = load(spark, sf, "embeddings")
    return cosine_topk(e.where(F.col("vec_id") < 10), e, k=5)


SQL_COSINE_TOPK = f"""
WITH scored AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) / sqrt(CAST(nc AS DOUBLE)) AS sim
  FROM ({_SQL_DOTS})),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, {_ROUND6.format('sim')} AS cosine_sim
FROM ranked WHERE rank <= 5
"""


# --------------------------------------------- LSH-bucketed top-k
def q_lsh_topk(spark, sf):
    e = load(spark, sf, "embeddings")
    return lsh_topk(
        e.where(F.col("vec_id") < 10), e, n_dims=N_DIMS, k=5, n_planes=4, use_udf=True
    )


_SQL_BUCKETS = f"""
  SELECT vec_id, v, string_agg(bit, '' ORDER BY p) AS bucket FROM (
    SELECT e.vec_id, e.v, pl.p,
           CASE WHEN sum(pl.w * e.v[CAST(pl.d + 1 AS INT)]) >= 0 THEN '1' ELSE '0' END AS bit
    FROM (SELECT vec_id, {_Q} AS v FROM embeddings) e
    CROSS JOIN (
      SELECT p, d, strpos('0123456789abcdef', substr(md5(p || '_' || d), 1, 1)) - 9 AS w
      FROM range(0, 4) pp(p) CROSS JOIN range(0, {N_DIMS}) dd(d)) pl
    GROUP BY e.vec_id, e.v, pl.p)
  GROUP BY vec_id, v
"""

SQL_LSH_TOPK = f"""
WITH b AS ({_SQL_BUCKETS}),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.v[CAST(d AS INT)] * c.v[CAST(d AS INT)]) AS dot,
         sum(q.v[CAST(d AS INT)] * q.v[CAST(d AS INT)]) AS nq,
         sum(c.v[CAST(d AS INT)] * c.v[CAST(d AS INT)]) AS nc
  FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  WHERE q.vec_id < 10
  GROUP BY q.vec_id, c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) / sqrt(CAST(nc AS DOUBLE)) AS sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(nq AS DOUBLE)) / sqrt(CAST(nc AS DOUBLE)) DESC,
                                          neighbor_id ASC) AS INT) AS rank
  FROM dots)
SELECT query_id, rank, neighbor_id, {_ROUND6.format('sim')} AS cosine_sim
FROM ranked WHERE rank <= 5
"""


# ------------------------------------------------ IVF-bucketed top-k
def q_ivf_topk(spark, sf):
    e = load(spark, sf, "embeddings")
    return ivf_topk(e.where(F.col("vec_id") < 10), e, k=5, n_cells=8, n_probe=2)


SQL_IVF_TOPK = f"""
WITH e AS (SELECT vec_id, {_Q} AS v FROM embeddings),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell, v AS c
  FROM e ORDER BY vec_id ASC LIMIT 8),
dists AS (
  SELECT e.vec_id, cents.cell,
         sum(cents.c[CAST(d AS INT)] * cents.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents.cell),
ranked_cells AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
  FROM dists),
ca AS (SELECT vec_id, cell FROM ranked_cells WHERE crank <= 1),
qa AS (SELECT vec_id, cell FROM ranked_cells WHERE crank <= 2 AND vec_id < 10),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qa q JOIN ca c USING (cell) WHERE c.vec_id <> q.vec_id),
sims AS (
  SELECT p.query_id, p.neighbor_id,
         CAST(sum(a.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)
           / sqrt(CAST(sum(a.v[CAST(d AS INT)] * a.v[CAST(d AS INT)]) AS DOUBLE))
           / sqrt(CAST(sum(b.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)) AS sim
  FROM pairs p JOIN e a ON a.vec_id = p.query_id JOIN e b ON b.vec_id = p.neighbor_id
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY p.query_id, p.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM sims)
SELECT query_id, rank, neighbor_id, {_ROUND6.format('sim')} AS cosine_sim
FROM ranked WHERE rank <= 5
"""


# ------------------------------------ k-means-trained IVF top-k
def q_ivf_kmeans_topk(spark, sf):
    """IVF with a Lloyd-refined coarse quantizer (1 training round):
    the trained upgrade over the first-n-by-id seed centroids. The
    oracle replays the training round bit-identically (integer sums,
    floor(mean+0.5) re-quantization)."""
    e = load(spark, sf, "embeddings")
    cents = kmeans_centroids(e, n_dims=N_DIMS, n_cells=8, n_iter=1)
    return ivf_topk(
        e.where(F.col("vec_id") < 10), e, k=5, n_cells=8, n_probe=2, centroids=cents
    )


SQL_IVF_KMEANS_TOPK = f"""
WITH e AS (SELECT vec_id, {_Q} AS v FROM embeddings),
cents0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell, v AS c
  FROM e ORDER BY vec_id ASC LIMIT 8),
d0 AS (
  SELECT e.vec_id, cents0.cell,
         sum(cents0.c[CAST(d AS INT)] * cents0.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents0.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents0 CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents0.cell),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
    FROM d0) WHERE crank = 1),
upd AS (
  SELECT a.cell, t.d,
         CAST(floor(CAST(sum(e.v[CAST(t.d AS INT)]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
  FROM a0 a JOIN e USING (vec_id) CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY a.cell, t.d),
cents AS (
  SELECT c0.cell, COALESCE(u.c, c0.c) AS c
  FROM cents0 c0
  LEFT JOIN (SELECT cell, list(m ORDER BY d) AS c FROM upd GROUP BY cell) u USING (cell)),
dists AS (
  SELECT e.vec_id, cents.cell,
         sum(cents.c[CAST(d AS INT)] * cents.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents.cell),
ranked_cells AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
  FROM dists),
ca AS (SELECT vec_id, cell FROM ranked_cells WHERE crank <= 1),
qa AS (SELECT vec_id, cell FROM ranked_cells WHERE crank <= 2 AND vec_id < 10),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qa q JOIN ca c USING (cell) WHERE c.vec_id <> q.vec_id),
sims AS (
  SELECT p.query_id, p.neighbor_id,
         CAST(sum(a.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)
           / sqrt(CAST(sum(a.v[CAST(d AS INT)] * a.v[CAST(d AS INT)]) AS DOUBLE))
           / sqrt(CAST(sum(b.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)) AS sim
  FROM pairs p JOIN e a ON a.vec_id = p.query_id JOIN e b ON b.vec_id = p.neighbor_id
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY p.query_id, p.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM sims)
SELECT query_id, rank, neighbor_id, {_ROUND6.format('sim')} AS cosine_sim
FROM ranked WHERE rank <= 5
"""


# -------------------------------------- embedding near-dup pairs
def q_near_dup(spark, sf):
    e = load(spark, sf, "embeddings")
    doubled = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 2).cast("float")).alias("embedding"),
        "label",
    )
    return embedding_near_dup_pairs(
        e.unionByName(doubled), n_dims=N_DIMS, threshold=0.999, n_planes=4
    )


SQL_NEAR_DUP = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
  FROM embeddings WHERE vec_id % 10 = 0),
b AS (
  SELECT vec_id, v, string_agg(bit, '' ORDER BY p) AS bucket FROM (
    SELECT e.vec_id, e.v, pl.p,
           CASE WHEN sum(pl.w * e.v[CAST(pl.d + 1 AS INT)]) >= 0 THEN '1' ELSE '0' END AS bit
    FROM (SELECT vec_id, {_Q} AS v FROM corpus) e
    CROSS JOIN (
      SELECT p, d, strpos('0123456789abcdef', substr(md5(p || '_' || d), 1, 1)) - 9 AS w
      FROM range(0, 4) pp(p) CROSS JOIN range(0, {N_DIMS}) dd(d)) pl
    GROUP BY e.vec_id, e.v, pl.p)
  GROUP BY vec_id, v),
sims AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         CAST(sum(a.v[CAST(d AS INT)] * c.v[CAST(d AS INT)]) AS DOUBLE)
           / sqrt(CAST(sum(a.v[CAST(d AS INT)] * a.v[CAST(d AS INT)]) AS DOUBLE))
           / sqrt(CAST(sum(c.v[CAST(d AS INT)] * c.v[CAST(d AS INT)]) AS DOUBLE)) AS sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY a.vec_id, c.vec_id)
SELECT id_a, id_b, {_ROUND6.format('sim')} AS cosine_sim
FROM sims WHERE sim >= 0.999
"""


# -------------------------------------- SemDedup semantic pruning
def q_semdedup(spark, sf):
    """SemDedup (Abbas et al. 2023): IVF-cell clustering, then within
    each cell drop every vector cosine-≥0.999-similar to ANY lower-id
    cell member ("dominated-by-earlier" — deterministic, order-free).
    Runs on the near-dup corpus (embeddings ∪ doubled copies) so the
    prune has guaranteed positives; the oracle replays assignment with
    the exact integer d2 arithmetic and the domination EXISTS."""
    e = load(spark, sf, "embeddings")
    doubled = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * 2).cast("float")).alias("embedding"),
        "label",
    )
    return semdedup_prune(
        e.unionByName(doubled), n_cells=16, threshold=0.999
    )


SQL_SEMDEDUP = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
  FROM embeddings WHERE vec_id % 10 = 0),
e AS (SELECT vec_id, {_Q} AS v FROM corpus),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell, v AS c
  FROM e ORDER BY vec_id ASC LIMIT 16),
dists AS (
  SELECT e.vec_id, cents.cell,
         sum(cents.c[CAST(d AS INT)] * cents.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents.cell),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
    FROM dists) WHERE crank = 1),
dominated AS (
  SELECT DISTINCT vec_id FROM (
    SELECT b.vec_id
    FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    CROSS JOIN range(1, {N_DIMS + 1}) t(d)
    GROUP BY a.vec_id, b.vec_id
    HAVING CAST(sum(ea.v[CAST(d AS INT)] * eb.v[CAST(d AS INT)]) AS DOUBLE)
         / sqrt(CAST(sum(ea.v[CAST(d AS INT)] * ea.v[CAST(d AS INT)]) AS DOUBLE))
         / sqrt(CAST(sum(eb.v[CAST(d AS INT)] * eb.v[CAST(d AS INT)]) AS DOUBLE)) >= 0.999))
SELECT asg.vec_id, asg.cell, (dom.vec_id IS NULL) AS kept
FROM assigned asg LEFT JOIN dominated dom ON dom.vec_id = asg.vec_id
"""


def q_embed_clusters(spark, sf):
    """Embedding-cosine dedup clusters: the LSH-bucketed near-dup pairs
    (embed_near_dup_pairs) fed through the same pointer-doubling
    connected-components used for text dedup — the full 'embedding
    near-dup → cluster → keep canonical' curation path. The oracle
    reuses the near-dup SQL as a CTE and closes it with the recursive
    reachability fold."""
    from crawlers_spark.operators.textdedup import connected_components

    e = load(spark, sf, "embeddings")
    corpus_ids = e.select("vec_id").unionByName(
        e.where(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 10000).alias("vec_id")
        )
    )
    pairs = q_near_dup(spark, sf).select("id_a", "id_b")
    comp = connected_components(pairs)
    return corpus_ids.join(comp, corpus_ids.vec_id == comp.id, "left").select(
        "vec_id",
        F.coalesce("cluster", "vec_id").alias("cluster"),
        (F.coalesce("cluster", "vec_id") == F.col("vec_id")).alias("is_canonical"),
    )


SQL_EMBED_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({SQL_NEAR_DUP}),
corpus AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 FROM embeddings WHERE vec_id % 10 = 0),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, lbl) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
comp AS (SELECT src AS id, min(lbl) AS cluster FROM reach GROUP BY src)
SELECT c.vec_id,
       COALESCE(comp.cluster, c.vec_id) AS cluster,
       COALESCE(comp.cluster, c.vec_id) = c.vec_id AS is_canonical
FROM corpus c LEFT JOIN comp ON comp.id = c.vec_id
"""


# ------------------------------------ product-quantization ADC top-k
def q_pq_topk(spark, sf):
    """PQ/ADC top-k (similarity.py pq_topk; Jégou et al. TPAMI 2011):
    8 subspaces × 16 codes trained (training-free first-16-by-id, like
    the IVF coarse quantizer), corpus encoded to 8 small ints per
    vector, asymmetric distance = 8 table lookups + an integer sum.
    All quantized-integer exact — the oracle restates encode, distance
    tables, and the ADC scan verbatim, so the match is exact."""
    from crawlers_spark.operators.similarity import pq_topk

    e = load(spark, sf, "embeddings")
    return pq_topk(e.where(F.col("vec_id") < 10), e, n_dims=N_DIMS, m=8, ks=16, k=5)


def _pq_sql(m: int = 8, ks: int = 16, k: int = 5) -> str:
    d0 = N_DIMS // m
    return f"""
WITH qv AS (SELECT vec_id, {_Q} AS v FROM embeddings),
seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
          FROM (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT {ks})),
cent AS (SELECT j.j, s.code, t.t, s.v[CAST(j.j*{d0} + t.t AS INT)] AS cv
         FROM seeds s, range(0,{m}) j(j), range(1,{d0 + 1}) t(t)),
sub AS (SELECT e.vec_id, j.j, t.t, e.v[CAST(j.j*{d0} + t.t AS INT)] AS xv
        FROM qv e, range(0,{m}) j(j), range(1,{d0 + 1}) t(t)),
enc0 AS (SELECT s.vec_id, s.j, c.code,
                SUM(c.cv*c.cv - 2*s.xv*c.cv) AS dpart
         FROM sub s JOIN cent c ON s.j = c.j AND s.t = c.t
         GROUP BY s.vec_id, s.j, c.code),
codes AS (SELECT vec_id, j, code FROM (
          SELECT vec_id, j, code,
                 row_number() OVER (PARTITION BY vec_id, j
                                    ORDER BY dpart ASC, code ASC) AS rn
          FROM enc0) WHERE rn = 1),
dt AS (SELECT q.vec_id AS query_id, c.j, c.code,
              SUM((q.xv - c.cv)*(q.xv - c.cv)) AS d2
       FROM (SELECT * FROM sub WHERE vec_id < 10) q
       JOIN cent c ON q.j = c.j AND q.t = c.t
       GROUP BY q.vec_id, c.j, c.code),
tot AS (SELECT d.query_id, x.vec_id AS neighbor_id, SUM(d.d2) AS d2_pq
        FROM codes x JOIN dt d ON x.j = d.j AND x.code = d.code
        WHERE x.vec_id <> d.query_id
        GROUP BY d.query_id, x.vec_id),
ranked AS (SELECT query_id, neighbor_id, d2_pq,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY d2_pq ASC, neighbor_id ASC) AS INT) AS rank
           FROM tot)
SELECT query_id, rank, neighbor_id, CAST(d2_pq AS BIGINT) AS d2_pq
FROM ranked WHERE rank <= {k}
"""


SQL_PQ_TOPK = _pq_sql()


def q_sq8_topk(spark, sf):
    """Scalar-quantized (SQ8) ANN (similarity.py sq8_topk; faiss
    ScalarQuantizer QT_8bit contract): per-dimension trained min/max
    grid, corpus encoded to one 8-bit code per DIMENSION, asymmetric
    inner-product scoring against exact queries. Every step is
    integer-exact (the encode divide runs on an exact multiple), so
    the oracle restates stats → encode → scan verbatim."""
    from crawlers_spark.operators.similarity import sq8_topk

    e = load(spark, sf, "embeddings")
    return sq8_topk(e.where(F.col("vec_id") < 10), e, n_dims=N_DIMS, k=5)


SQL_SQ8_TOPK = f"""
WITH qv AS (SELECT vec_id, {_Q} AS v FROM embeddings),
dims AS (SELECT t.t, MIN(v[CAST(t.t AS INT)]) AS mn, MAX(v[CAST(t.t AS INT)]) AS mx
         FROM qv, range(1, {N_DIMS + 1}) t(t) GROUP BY t.t),
codes AS (SELECT e.vec_id, d.t, d.mn, d.mx - d.mn AS span,
                 CASE WHEN d.mx = d.mn THEN CAST(0 AS BIGINT)
                      ELSE ((e.v[CAST(d.t AS INT)] - d.mn) * 255) // (d.mx - d.mn)
                 END AS code
          FROM qv e CROSS JOIN dims d),
sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              CAST(SUM(q.v[CAST(c.t AS INT)] * (255 * c.mn + c.code * c.span))
                   AS BIGINT) AS score_sq8
       FROM codes c JOIN (SELECT * FROM qv WHERE vec_id < 10) q
            ON c.vec_id <> q.vec_id
       GROUP BY 1, 2),
ranked AS (SELECT query_id, neighbor_id, score_sq8,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY score_sq8 DESC, neighbor_id ASC)
                       AS INT) AS rank
           FROM sc)
SELECT query_id, rank, neighbor_id, score_sq8 FROM ranked WHERE rank <= 5
"""


def q_pq_kmeans_topk(spark, sf):
    """PQ/ADC with Lloyd-trained sub-codebooks (one k-means round per
    subspace over the seed books, floor(sum/count + 0.5) integer-grid
    means — similarity.py pq_kmeans_codebooks): the oracle replays
    seed-encode → per-(subspace, code) mean → re-encode → distance
    tables → ADC scan verbatim, so training itself is countersigned
    bit-identically, like embed_ivf_kmeans_topk for IVF."""
    from crawlers_spark.operators.similarity import pq_kmeans_topk

    e = load(spark, sf, "embeddings")
    return pq_kmeans_topk(
        e.where(F.col("vec_id") < 10), e, n_dims=N_DIMS, m=8, ks=16, k=5, n_iter=1
    )


def _pq_kmeans_sql(m: int = 8, ks: int = 16, k: int = 5) -> str:
    d0 = N_DIMS // m
    return f"""
WITH qv AS (SELECT vec_id, {_Q} AS v FROM embeddings),
seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
          FROM (SELECT vec_id, v FROM qv ORDER BY vec_id LIMIT {ks})),
cent AS (SELECT j.j, s.code, t.t, s.v[CAST(j.j*{d0} + t.t AS INT)] AS cv
         FROM seeds s, range(0,{m}) j(j), range(1,{d0 + 1}) t(t)),
sub AS (SELECT e.vec_id, j.j, t.t, e.v[CAST(j.j*{d0} + t.t AS INT)] AS xv
        FROM qv e, range(0,{m}) j(j), range(1,{d0 + 1}) t(t)),
enc0 AS (SELECT s.vec_id, s.j, c.code,
                SUM(c.cv*c.cv - 2*s.xv*c.cv) AS dpart
         FROM sub s JOIN cent c ON s.j = c.j AND s.t = c.t
         GROUP BY s.vec_id, s.j, c.code),
codes0 AS (SELECT vec_id, j, code FROM (
           SELECT vec_id, j, code,
                  row_number() OVER (PARTITION BY vec_id, j
                                     ORDER BY dpart ASC, code ASC) AS rn
           FROM enc0) WHERE rn = 1),
cent1 AS (SELECT k0.j, k0.code, s.t,
                 CAST(FLOOR(CAST(SUM(s.xv) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS cv
          FROM codes0 k0 JOIN sub s ON k0.vec_id = s.vec_id AND k0.j = s.j
          GROUP BY k0.j, k0.code, s.t),
centT AS (SELECT c.j, c.code, c.t, COALESCE(c1.cv, c.cv) AS cv
          FROM cent c LEFT JOIN cent1 c1
               ON c.j = c1.j AND c.code = c1.code AND c.t = c1.t),
enc2 AS (SELECT s.vec_id, s.j, c.code,
                SUM(c.cv*c.cv - 2*s.xv*c.cv) AS dpart
         FROM sub s JOIN centT c ON s.j = c.j AND s.t = c.t
         GROUP BY s.vec_id, s.j, c.code),
codes AS (SELECT vec_id, j, code FROM (
          SELECT vec_id, j, code,
                 row_number() OVER (PARTITION BY vec_id, j
                                    ORDER BY dpart ASC, code ASC) AS rn
          FROM enc2) WHERE rn = 1),
dt AS (SELECT q.vec_id AS query_id, c.j, c.code,
              SUM((q.xv - c.cv)*(q.xv - c.cv)) AS d2
       FROM (SELECT * FROM sub WHERE vec_id < 10) q
       JOIN centT c ON q.j = c.j AND q.t = c.t
       GROUP BY q.vec_id, c.j, c.code),
tot AS (SELECT d.query_id, x.vec_id AS neighbor_id, SUM(d.d2) AS d2_pq
        FROM codes x JOIN dt d ON x.j = d.j AND x.code = d.code
        WHERE x.vec_id <> d.query_id
        GROUP BY d.query_id, x.vec_id),
ranked AS (SELECT query_id, neighbor_id, d2_pq,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY d2_pq ASC, neighbor_id ASC) AS INT) AS rank
           FROM tot)
SELECT query_id, rank, neighbor_id, CAST(d2_pq AS BIGINT) AS d2_pq
FROM ranked WHERE rank <= {k}
"""


SQL_PQ_KMEANS_TOPK = _pq_kmeans_sql()


def q_bitext_mine(spark, sf):
    """Margin-based bitext mining (operators/similarity.py
    bitext_margin_pairs; Artetxe & Schwenk 2019): even vec_ids play
    the source language, odd ids the target; per source, the best
    target neighbor with the 2k-scaled integer margin against both
    top-4 neighborhoods. The oracle replays the identical cosine
    expression tree, both rank windows, the neighborhood sums, and
    the division-free margin algebra.
    """
    from crawlers_spark.operators.similarity import bitext_margin_pairs

    e = load(spark, sf, "embeddings")
    src = e.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 80))
    tgt = e.where(F.col("vec_id") % 2 == 1)
    return bitext_margin_pairs(src, tgt, k=4, margin_threshold_micro=0)


SQL_BITEXT_MINE = f"""
WITH dots AS (
  SELECT s.src_id, t.tgt_id,
         sum(s.sv[CAST(d AS INT)] * t.tv[CAST(d AS INT)]) AS dot,
         sum(s.sv[CAST(d AS INT)] * s.sv[CAST(d AS INT)]) AS ns,
         sum(t.tv[CAST(d AS INT)] * t.tv[CAST(d AS INT)]) AS nt
  FROM (SELECT vec_id AS src_id, {_Q} AS sv FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id < 80) s
  CROSS JOIN (SELECT vec_id AS tgt_id, {_Q} AS tv FROM embeddings
              WHERE vec_id % 2 = 1) t
  CROSS JOIN range(1, {N_DIMS + 1}) r(d)
  GROUP BY 1, 2),
scored AS (
  SELECT src_id, tgt_id,
         CAST(dot AS DOUBLE) / sqrt(CAST(ns AS DOUBLE))
           / sqrt(CAST(nt AS DOUBLE)) AS sim
  FROM dots),
m AS (
  SELECT src_id, tgt_id, sim,
         CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS cm,
         row_number() OVER (PARTITION BY src_id
                            ORDER BY sim DESC, tgt_id ASC) AS r_s,
         row_number() OVER (PARTITION BY tgt_id
                            ORDER BY sim DESC, src_id ASC) AS r_t
  FROM scored),
sx AS (SELECT src_id, SUM(cm) AS sum_x FROM m WHERE r_s <= 4 GROUP BY 1),
sy AS (SELECT tgt_id, SUM(cm) AS sum_y FROM m WHERE r_t <= 4 GROUP BY 1)
SELECT m.src_id, m.tgt_id,
       {_ROUND6.format('m.sim')} AS cosine_sim,
       CAST(8 * cm - sum_x - sum_y AS BIGINT) AS margin_scaled,
       (8 * cm - sum_x - sum_y) >= 0 AS accepted
FROM m JOIN sx USING (src_id) JOIN sy USING (tgt_id)
WHERE r_s = 1
"""


# ------------- two-stage retrieval: JL candidates + exact rerank
def q_jl_rerank(spark, sf):
    """Coarse-then-fine ANN (`operators/similarity.py
    jl_rerank_topk`): 16-dim JL candidate scan (top-40 per query) →
    exact full-dim cosine rerank of just those pairs. The oracle
    rebuilds the md5 sign matrix, replays BOTH stages' double trees
    and both deterministic tie orders."""
    from crawlers_spark.operators.similarity import jl_rerank_topk

    e = load(spark, sf, "embeddings")
    return jl_rerank_topk(
        e.where(F.col("vec_id") < 10), e, n_dims=N_DIMS,
        out_dims=16, candidates=40, k=5,
    )


SQL_JL_RERANK = f"""
WITH e AS (SELECT vec_id, {_Q} AS v FROM embeddings),
red AS (
  SELECT vec_id, list(val ORDER BY j) AS r FROM (
    SELECT vec_id, j,
           CAST(sum(v[CAST(i + 1 AS INT)] *
             CASE WHEN substr(md5('jl|jl|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1)
                       IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END)
             AS BIGINT) AS val
    FROM e CROSS JOIN range(0, 16) s(j) CROSS JOIN range(0, {N_DIMS}) t(i)
    GROUP BY vec_id, j) z
  GROUP BY vec_id),
s1 AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(sum(q.r[CAST(d AS INT)] * c.r[CAST(d AS INT)]) AS DOUBLE)
           / sqrt(CAST(sum(q.r[CAST(d AS INT)] * q.r[CAST(d AS INT)]) AS DOUBLE))
           / sqrt(CAST(sum(c.r[CAST(d AS INT)] * c.r[CAST(d AS INT)]) AS DOUBLE))
           AS red_sim
  FROM red q CROSS JOIN red c CROSS JOIN range(1, 17) t(d)
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY red_sim DESC, neighbor_id ASC) AS crank
    FROM s1) WHERE crank <= 40),
sims AS (
  SELECT p.query_id, p.neighbor_id,
         CAST(sum(a.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)
           / sqrt(CAST(sum(a.v[CAST(d AS INT)] * a.v[CAST(d AS INT)]) AS DOUBLE))
           / sqrt(CAST(sum(b.v[CAST(d AS INT)] * b.v[CAST(d AS INT)]) AS DOUBLE)) AS sim
  FROM cand p JOIN e a ON a.vec_id = p.query_id JOIN e b ON b.vec_id = p.neighbor_id
  CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY p.query_id, p.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM sims)
SELECT query_id, rank, neighbor_id, {_ROUND6.format('sim')} AS cosine_sim
FROM ranked WHERE rank <= 5
"""


# ---------------- Johnson–Lindenstrauss ±1 random projection (Achlioptas)
def q_random_projection(spark, sf):
    """JL dimensionality reduction 64→8 (`operators/similarity.py
    random_projection`): ±1 sign matrix regenerated from md5 nibble
    parity — the oracle REBUILDS the matrix with DuckDB's own md5
    rather than trusting shipped literals, then replays the exact
    integer multiply-add. Exploded (vec_id, dim, value) shape."""
    from crawlers_spark.operators.similarity import random_projection

    e = load(spark, sf, "embeddings")
    return random_projection(e, n_dims=N_DIMS, out_dims=8)


SQL_RANDOM_PROJECTION = f"""
WITH e AS (SELECT vec_id, {_Q} AS v FROM embeddings)
SELECT vec_id, CAST(j AS INT) AS dim,
       CAST(sum(v[CAST(i + 1 AS INT)] *
         CASE WHEN substr(md5('jl|jl|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1)
                   IN ('0','2','4','6','8','a','c','e') THEN 1 ELSE -1 END)
         AS BIGINT) AS value
FROM e CROSS JOIN range(0, 8) s(j) CROSS JOIN range(0, {N_DIMS}) t(i)
GROUP BY vec_id, j
"""


# ------------------- cluster-balanced data mixing (D4-style, k-means)
def q_cluster_mix(spark, sf):
    """Cluster-balanced mixing (`operators/similarity.py
    cluster_balanced_mix`): k-means the embedding space (1 Lloyd
    round, the audited trained-quantizer path), cap every cluster's
    contribution at 40 rows via the md5-threshold sampling contract.
    Membership-total output — the oracle replays the training round,
    the argmin assignment, the per-cell rate algebra, and each row's
    keep decision bit-for-bit.
    """
    from crawlers_spark.operators.similarity import cluster_balanced_mix

    e = load(spark, sf, "embeddings")
    return cluster_balanced_mix(
        e, n_dims=N_DIMS, target_per_cell=40, n_cells=8, n_iter=1
    ).select("vec_id", "cell", "n_in_cell", "kept")


SQL_CLUSTER_MIX = f"""
WITH e AS (SELECT vec_id, {_Q} AS v FROM embeddings),
cents0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS cell, v AS c
  FROM e ORDER BY vec_id ASC LIMIT 8),
d0 AS (
  SELECT e.vec_id, cents0.cell,
         sum(cents0.c[CAST(d AS INT)] * cents0.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents0.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents0 CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents0.cell),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
    FROM d0) WHERE crank = 1),
upd AS (
  SELECT a.cell, t.d,
         CAST(floor(CAST(sum(e.v[CAST(t.d AS INT)]) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
  FROM a0 a JOIN e USING (vec_id) CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY a.cell, t.d),
cents AS (
  SELECT c0.cell, COALESCE(u.c, c0.c) AS c
  FROM cents0 c0
  LEFT JOIN (SELECT cell, list(m ORDER BY d) AS c FROM upd GROUP BY cell) u USING (cell)),
dists AS (
  SELECT e.vec_id, cents.cell,
         sum(cents.c[CAST(d AS INT)] * cents.c[CAST(d AS INT)])
           - 2 * sum(e.v[CAST(d AS INT)] * cents.c[CAST(d AS INT)]) AS d2
  FROM e CROSS JOIN cents CROSS JOIN range(1, {N_DIMS + 1}) t(d)
  GROUP BY e.vec_id, cents.cell),
ca AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS crank
    FROM dists) WHERE crank = 1),
counts AS (SELECT cell, COUNT(*) AS n_in_cell FROM ca GROUP BY cell),
thr AS (
  SELECT cell, n_in_cell,
         CASE WHEN n_in_cell <= 40 THEN 'g'
              ELSE lpad(lower(to_hex(CAST(floor(
                     CAST(40 AS DOUBLE) / CAST(n_in_cell AS DOUBLE)
                     * 4294967296.0) AS BIGINT))), 8, '0') END AS t
  FROM counts)
SELECT ca.vec_id, ca.cell, CAST(thr.n_in_cell AS BIGINT) AS n_in_cell,
       substr(md5('cluster|' || CAST(ca.vec_id AS VARCHAR)), 1, 8) < thr.t AS kept
FROM ca JOIN thr USING (cell)
"""


QUERIES = {
    "embed_cluster_mix": (q_cluster_mix, SQL_CLUSTER_MIX),
    "embed_random_projection": (q_random_projection, SQL_RANDOM_PROJECTION),
    "embed_jl_rerank_topk": (q_jl_rerank, SQL_JL_RERANK),
    "embed_bitext_mine": (q_bitext_mine, SQL_BITEXT_MINE),
    "embed_pq_topk": (q_pq_topk, SQL_PQ_TOPK),
    "embed_sq8_topk": (q_sq8_topk, SQL_SQ8_TOPK),
    "embed_pq_kmeans_topk": (q_pq_kmeans_topk, SQL_PQ_KMEANS_TOPK),
    "embed_cosine_topk": (q_cosine_topk, SQL_COSINE_TOPK),
    "embed_dedup_clusters": (q_embed_clusters, SQL_EMBED_CLUSTERS),
    "embed_semdedup_prune": (q_semdedup, SQL_SEMDEDUP),
    "embed_lsh_topk": (q_lsh_topk, SQL_LSH_TOPK),
    "embed_ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
    "embed_ivf_kmeans_topk": (q_ivf_kmeans_topk, SQL_IVF_KMEANS_TOPK),
    "embed_near_dup_pairs": (q_near_dup, SQL_NEAR_DUP),
}
