"""Round-14 streaming operator: theta-sketch intersections maintained
across TRUE micro-batches — the FOURTH merge algebra of the
mergeable-sketch stream family, completing the set:

* q473 histogram        — bucket-wise ADDITION
* q476 HyperLogLog      — register-wise MAX
* q479 Misra-Gries      — ADD then SUBTRACT the (k+1)-th
* q481 theta / bottom-k — ORDER-STATISTIC merge (bottom-64 of union)

The claim under test is bottom-k's defining property: bottom-64 of a
union equals bottom-64 of the union of per-part bottom-64s, so
per-micro-batch sketches written by a foreachBatch sink, merged after
the run by one more bottom-64 reduction, must equal the sketch built
over all rows at once — and every pairwise theta-intersection estimate
read off the merged sketches must match the all-rows oracle exactly.
The DuckDB oracle computes the all-rows sketches directly; the Spark
side only ever sees per-batch partials from ~20 real micro-batches —
a hash match IS the empirical mergeability proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.round11 import _H60_DUCK, _H60_SPARK, _TWO60
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

_SK = 64  # sketch size (bottom-k over the 60-bit md5 hash lane)
_N_BATCHES = 20  # target micro-batch count (batchRows = ceil(n / 20))

# user-day activity key — distinct counts per event type land in the
# sketch's sampling regime (~1.6k keys/type vs k=64 at sf0.01) and
# pairwise overlaps are partial (~35%), unlike raw user_id where every
# type sees every user and the audit degenerates
_KEY_DUCK = "user_id || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)"
_KEY_SPARK = ("concat(CAST(user_id AS STRING), ':', "
              "CAST(CAST(ts AS DATE) AS STRING))")


@register(
    "q481_streaming_theta_intersection",
    oracle=f"""
WITH base AS (
  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
         {_H60_DUCK.format(key=_KEY_DUCK)} AS h
  FROM events
),
n AS (SELECT COUNT(*) AS cnt FROM base),
bsz AS (SELECT CAST(ceil(cnt / {_N_BATCHES}.0) AS BIGINT) AS b FROM n),
nb AS (SELECT (cnt + b - 1) // b AS nb FROM n CROSS JOIN bsz),
pool AS (SELECT DISTINCT event_type, h FROM base),
sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS rn
        FROM pool)
  WHERE rn <= {_SK}
),
types AS (SELECT DISTINCT event_type FROM pool),
pl AS (
  SELECT a.event_type AS s1, b.event_type AS s2
  FROM types a JOIN types b ON a.event_type < b.event_type
),
un AS (
  SELECT DISTINCT s1, s2, h FROM (
    SELECT p.s1, p.s2, s.h FROM pl p JOIN sk s ON s.event_type = p.s1
    UNION ALL
    SELECT p.s1, p.s2, s.h FROM pl p JOIN sk s ON s.event_type = p.s2
  )
),
th AS (
  SELECT s1, s2,
         COALESCE(MAX(CASE WHEN rn = {_SK} THEN h END),
                  1152921504606846976) AS theta
  FROM (SELECT s1, s2, h,
               row_number() OVER (PARTITION BY s1, s2 ORDER BY h ASC) AS rn
        FROM un)
  GROUP BY s1, s2
),
com AS (
  SELECT a.event_type AS s1, b.event_type AS s2, a.h
  FROM sk a JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
),
ni AS (
  SELECT t.s1, t.s2, t.theta,
         CAST(COALESCE(SUM(CASE WHEN c.h < t.theta THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_below
  FROM th t LEFT JOIN com c ON c.s1 = t.s1 AND c.s2 = t.s2
  GROUP BY t.s1, t.s2, t.theta
),
ex AS (
  SELECT a.event_type AS s1, b.event_type AS s2,
         CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM pool a JOIN pool b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
est AS (
  SELECT n.s1, n.s2,
         CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter,
         CAST(floor(CAST(n.n_below AS DOUBLE) * {_TWO60} /
                    CAST(n.theta AS DOUBLE)) AS BIGINT) AS est_inter
  FROM ni n LEFT JOIN ex e ON e.s1 = n.s1 AND e.s2 = n.s2
)
SELECT s1, s2, exact_inter, est_inter,
       CAST(abs(est_inter - exact_inter) * 1000000
            // GREATEST(exact_inter, 1) AS BIGINT) AS err_ppm,
       CAST(nb.nb AS BIGINT) AS n_batches
FROM est CROSS JOIN nb
""",
    tags=("streaming", "true_stream", "sketch", "theta", "mergeable"),
)
def q481_streaming_theta_intersection(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING THETA-SKETCH INTERSECTIONS over ~20 TRUE micro-batches
    — the FOURTH merge algebra, completing the mergeable-sketch stream
    family (q473 add / q476 max / q479 add-subtract / here
    ORDER-STATISTIC: bottom-64 of the union). Events replay in
    event-time order; each micro-batch's foreachBatch sink writes ONLY
    its bottom-64 sketch of that batch's distinct user-day hash pool
    per event type (<= 64 x types rows per batch, never fact rows);
    after the run one more bottom-64 reduction over the union of the
    batch sketches yields the merged per-type sketch, and every
    pairwise |A n B| estimate is read off the merged sketches with the
    standard theta rule (q462): theta = the 64th smallest hash of the
    merged pair union, est = (common hashes below theta) * 2^60 /
    theta; a pair whose merged union holds < 64 hashes falls back to
    theta = 2^60 (the sketch IS the union — exact). The DuckDB oracle
    builds the sketches from ALL rows at once — the hash match is the
    empirical proof that bottom-k merges losslessly across
    micro-batches, the property that makes KMV/theta THE distributed
    set-expression sketch. Exact intersections ride along as the audit
    baseline with realized err_ppm (the ~1/sqrt(64) contract).

    Scale shape: streaming state is 64 longs per event type REGARDLESS
    of volume; each micro-batch pays one distinct + per-type bottom-k
    over its own rows (map-side combinable, WindowGroupLimit per-
    partition heaps); the post-run merge touches n_batches x 64 x
    types rows — metadata, not data. At 100 TB/day the same sink runs
    per executor and the union of any set of shards/days/clusters is
    one more bottom-64 — nobody ever re-scans. The single float step
    (2^60 / theta) is one shared IEEE chain floored to BIGINT; all
    counting is exact integers. n_batches = ceil(n/bsz) in Python,
    matching the oracle (the q479 ADVICE idiom — never derived from
    data-bearing partials)."""
    import glob
    import os
    import shutil
    import tempfile

    from cli_spark.sources.replay_datasource import register_replay_source

    e = load_table(spark, sf_dir, "events")
    n = e.count()
    bsz = -(-n // _N_BATCHES)  # ceil
    nb = -(-n // bsz)
    base = e.select(
        "event_type", "event_id", "ts",
        F.expr(_H60_SPARK.format(key=_KEY_SPARK)).alias("h"),
    )

    tmp = tempfile.mkdtemp(prefix="q481_replay_")
    out_root = tempfile.mkdtemp(prefix="q481_sk_")
    try:
        (
            base.repartition(1)
            .sortWithinPartitions(F.unix_micros("ts"), F.col("event_id"))
            .drop("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        register_replay_source(spark)
        stream = (
            spark.readStream.format("replay")
            .option("path", part)
            .option("batchRows", bsz)
            .load()
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            sk = (
                batch_df.select("event_type", "h").distinct()
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("event_type")
                        .orderBy(F.col("h").asc())),
                )
                .filter(F.col("rn") <= _SK)
                .select("event_type", "h")
                .withColumn("batch_id", F.lit(batch_id).cast("long"))
            )
            sk.write.mode("append").parquet(f"{out_root}/sk")

        query = stream.writeStream.foreachBatch(sink).start()
        try:
            query.processAllAvailable()
        finally:
            query.stop()

        # ORDER-STATISTIC MERGE: bottom-64 of the distinct union of the
        # per-batch bottom-64s == bottom-64 of the all-rows pool
        parts = spark.read.parquet(f"{out_root}/sk")
        sk = (
            parts.select("event_type", "h").distinct()
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("event_type")
                    .orderBy(F.col("h").asc())),
            )
            .filter(F.col("rn") <= _SK)
            .select("event_type", "h")
            .persist()
        )
        types = sk.select("event_type").distinct()
        pl = (
            types.select(F.col("event_type").alias("s1"))
            .join(types.select(F.col("event_type").alias("s2")),
                  F.col("s1") < F.col("s2"))
        )
        un = (
            pl.join(F.broadcast(sk), F.col("event_type") == F.col("s1"))
            .select("s1", "s2", "h")
            .unionByName(
                pl.join(F.broadcast(sk), F.col("event_type") == F.col("s2"))
                .select("s1", "s2", "h"))
            .distinct()
        )
        two60_long = 1152921504606846976
        th = (
            un.select(
                "s1", "s2", "h",
                F.row_number().over(
                    Window.partitionBy("s1", "s2").orderBy(F.col("h").asc())
                ).alias("rn"),
            )
            .groupBy("s1", "s2")
            .agg(F.coalesce(
                F.max(F.when(F.col("rn") == _SK, F.col("h"))),
                F.lit(two60_long)).alias("theta"))
        )
        com = (
            sk.select(F.col("event_type").alias("s1"), "h")
            .join(sk.select(F.col("event_type").alias("s2"),
                            F.col("h").alias("h2")),
                  (F.col("h") == F.col("h2")) & (F.col("s1") < F.col("s2")))
            .select("s1", "s2", "h")
        )
        ni = (
            th.join(com.withColumnRenamed("h", "ch"), ["s1", "s2"], "left")
            .groupBy("s1", "s2", "theta")
            .agg(F.coalesce(
                F.sum(F.when(F.col("ch") < F.col("theta"), 1).otherwise(0)),
                F.lit(0)).cast("long").alias("n_below"))
        )
        # exact audit baseline from the batch table (never from the
        # stream — the stream only ever shipped sketches)
        pool = base.select("event_type", "h").distinct()
        ex = (
            pool.select(F.col("event_type").alias("s1"), "h")
            .join(pool.select(F.col("event_type").alias("s2"),
                              F.col("h").alias("h2")),
                  (F.col("h") == F.col("h2")) & (F.col("s1") < F.col("s2")))
            .groupBy("s1", "s2")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
        )
        result = (
            ni.join(ex, ["s1", "s2"], "left")
            .select(
                "s1", "s2",
                F.coalesce("exact_inter", F.lit(0)).cast("long")
                .alias("exact_inter"),
                F.expr(f"CAST(floor(CAST(n_below AS DOUBLE) * {_TWO60} / "
                       "CAST(theta AS DOUBLE)) AS BIGINT)")
                .alias("est_inter"),
            )
            .withColumn(
                "err_ppm",
                F.expr("CAST(abs(est_inter - exact_inter) * 1000000 "
                       "DIV GREATEST(exact_inter, 1) AS BIGINT)"),
            )
            .withColumn("n_batches", F.lit(nb).cast("long"))
        )
        out = spark.createDataFrame(result.collect(), result.schema)
        sk.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
    return out
