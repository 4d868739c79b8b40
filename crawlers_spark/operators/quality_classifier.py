"""Trained model-based quality classifier — batch perceptron over
hashed bag-of-n-gram counts.

Public method: the DCLM / FineWeb-Edu / fastText-filter pattern —
train a linear text classifier on a labeled slice, score the whole
corpus, keep the top of the ranking. The reference (pyjobs/crawlers)
has no trained filter; this is the mandated LLM-pipeline extension
(SURVEY §2.3) completing the heuristic quality family
(``docs_quality`` / ``docs_gopher_quality`` / ``docs_c4_line_filter``)
with a LEARNED scorer, the way modern web-corpus pipelines do.

Why a perceptron and not logistic regression: the engine's oracle
discipline requires bit-identical replay in ANSI SQL. Logistic loss
needs ``exp`` inside the training loop, and iterated libm calls
compound 1-ulp differences across engines. The batch perceptron
(Rosenblatt 1958; batch variant as in convergence-theorem texts) is
PURE INTEGER arithmetic end-to-end:

    w_0           = 0
    M_e           = {docs with y · (w_e · x) <= 0}        (batch test)
    w_{e+1}[b]    = w_e[b] + Σ_{doc ∈ M_e} y_doc · x_doc[b]

with integer features x (hashed gram counts + a constant bias) and
labels y ∈ {+1, −1}. Every margin, every update, every final score is
an exact integer — aggregation order cannot perturb a bit, and a
fixed-epoch SQL unroll replays training EXACTLY (same class of
oracle-replayable distributed training as ``functions/bpe.py`` merge
learning and the Lloyd round in ``operators/similarity.py``).

Scale shape (the part that must survive 100 TB):

- features: one explode + one ``(id, bucket)`` partial-agg shuffle
  (map-side combine), same as operators/dsir.py;
- each epoch: the weight vector (≤ B+1 rows) BROADCASTS into a
  scoring join — the corpus never shuffles to compute margins; the
  misclassified-set gradient is ONE ``bucket``-keyed aggregate whose
  result is again ≤ B+1 rows. Only the model crosses to the driver
  (B+1 integers per epoch — like BPE's one top-pair per round);
- scoring: broadcast final weights, one per-doc sum — a scan.

Epochs are a small constant (default 3); total work is
O(epochs · corpus-scan), embarrassingly parallel between the two
bounded aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BIAS_BUCKET = -1  # constant feature present once in every document


def _grams(text: Column) -> Column:
    """Whitespace unigrams + space-joined bigrams (the dsir.py feature
    family — scan-side codegen, no explode until counting)."""
    from crawlers_spark.operators.dsir import _grams as dsir_grams

    return dsir_grams(text)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5 bucket contract, salt ``qc|`` (oracle-replayable: with
    ``n_buckets | 16^3`` only the last three nibbles of the first 8
    hex chars matter, as in the DSIR/DuckDB restatement)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("qc|"), gram)), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hashed_feature_counts(
    df: DataFrame, id_col: str, text_col: str, *, n_buckets: int = 1024
) -> DataFrame:
    """Per-document integer features ``(id, bucket, n)``: hashed
    unigram+bigram counts PLUS one bias row ``(id, -1, 1)`` per
    document (so empty documents still score — with the bias weight).
    One explode + one partial-agg shuffle."""
    g = df.select(F.col(id_col), F.explode(_grams(F.col(text_col))).alias("gram"))
    counts = (
        g.select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bias = df.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("n"),
    )
    return counts.select(id_col, "bucket", F.col("n").cast("long")).unionByName(bias)


def _margins(counts: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """(id, margin) under the CURRENT weights: broadcast the ≤B+1-row
    weight table into the counts scan, one per-doc integer sum. Every
    doc has a bias row, so every doc appears."""
    return (
        counts.join(F.broadcast(weights), "bucket", "left")
        .na.fill({"w": 0})
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("w")).alias("margin"))
    )


def train_perceptron(
    counts: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    epochs: int = 3,
    spark: SparkSession,
) -> DataFrame:
    """Batch-perceptron training; returns the final weight table
    ``(bucket, w)`` (≤ B+1 rows, broadcastable).

    ``labels`` is ``(id, y)`` with y ∈ {+1, −1}. Each epoch runs two
    bounded aggregates (per-doc margins under broadcast weights; the
    per-bucket update over the misclassified set) and pulls ONLY the
    ≤B+1-row delta to the driver. A doc absent from ``labels`` does
    not train (score-only corpus); a doc with margin exactly 0 counts
    as misclassified (the standard ``<= 0`` batch test), which makes
    epoch 1 from w=0 the full class-count difference vector.
    """
    weights: dict[int, int] = {}
    w_schema = "bucket long, w long"
    for _ in range(epochs):
        if weights:
            wdf = spark.createDataFrame(sorted(weights.items()), w_schema)
            m = _margins(counts, wdf, id_col)
            mis = (
                labels.join(m, id_col, "left")
                .na.fill({"margin": 0})
                .where(F.col("y") * F.col("margin") <= 0)
                .select(id_col, "y")
            )
        else:
            mis = labels.select(id_col, "y")  # w=0 ⇒ every margin is 0
        delta = (
            counts.join(mis, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("n")).alias("d"))
            .collect()
        )
        if not delta:
            break  # converged: no misclassified docs ⇒ later epochs no-op
        for row in delta:
            weights[row["bucket"]] = weights.get(row["bucket"], 0) + row["d"]
        weights = {b: w for b, w in weights.items() if w != 0}
    if not weights:
        weights = {BIAS_BUCKET: 0}
    return spark.createDataFrame(sorted(weights.items()), w_schema)


def perceptron_scores(
    counts: DataFrame, weights: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """(id, score, pred) for every document in ``counts`` — one
    broadcast join + per-doc integer sum; ``pred`` is ``score > 0``.
    The corpus never shuffles to be scored."""
    m = _margins(counts, weights, id_col)
    return m.select(
        id_col,
        F.col("margin").cast("long").alias("score"),
        (F.col("margin") > 0).alias("pred"),
    )


def quality_classifier(
    docs: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    epochs: int = 3,
    spark: SparkSession,
) -> DataFrame:
    """End-to-end: featurize → train on ``labels`` → score ALL docs.

    The feature table persists across the epoch loop (each epoch reads
    it twice); the caller owns the returned plan — it re-reads the
    persisted features once more for the final scoring scan."""
    counts = hashed_feature_counts(
        docs, id_col, text_col, n_buckets=n_buckets
    ).persist()
    w = train_perceptron(counts, labels, id_col=id_col, epochs=epochs, spark=spark)
    return perceptron_scores(counts, w, id_col=id_col)
