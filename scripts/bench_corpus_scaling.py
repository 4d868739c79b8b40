import json, sys, time
sys.path.insert(0, "/root/repo")

def leg(cores, mult):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.driver.memory", "16g")
             .appName(f"corpus-scaling-{cores}").getOrCreate())
    try:
        from crawlers_spark.plans.corpus import build_training_corpus
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id","text")
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        corpus_in = (docs.crossJoin(reps)
                     .select((F.col("doc_id")*mult+F.col("rep")).alias("doc_id"),
                             F.concat(F.col("text"), F.lit(" v"), F.col("rep").cast("string")).alias("text"))
                     .repartition(cores*4).persist())
        n = corpus_in.count()
        t = time.monotonic()
        out, stats = build_training_corpus(
            corpus_in, id_col="doc_id", text_col="text",
            min_words=5, quality_gate="basic", shard_tokens=100_000)
        out.write.format("noop").mode("overwrite").save()
        w = time.monotonic() - t
        corpus_in.unpersist()
        return n, w, stats["n_final"]
    finally:
        spark.stop()

mult = int(sys.argv[1]) if len(sys.argv) > 1 else 8
legs = {2: [], 8: []}
nfin = None
for _ in range(2):
    for c in (2, 8):
        n, w, nf = leg(c, mult)
        legs[c].append(w); nfin = nf
eff = min(legs[2]) / min(legs[8]) / 4.0
print(json.dumps({"n_docs": n, "n_final": nfin,
                  "t2": round(min(legs[2]),2), "t8": round(min(legs[8]),2),
                  "eff": round(eff,3)}))
