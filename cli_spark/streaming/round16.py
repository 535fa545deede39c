"""Round-15 streaming operator: a conformal-coverage MONITOR over a
TRUE test stream (VERDICT r14 #5 scout) — q484's split-conformal
audit promoted from an offline report to the live check a serving
pipeline actually runs: calibrate ONCE on static data, then watch
realized coverage over the arriving test points and raise an alarm
when even the upper confidence bound falls below nominal. This closes
the conformal-audit -> stream loop the same way q486 closed q483's
(priority sampling) and q491 closed q473's (quantile sketch): the
batch estimator's merge algebra — here plain ADDITION of
(n_test, n_covered) count pairs — is exercised through ~20 real
micro-batches whose foreachBatch sink ships ONLY those per-lang count
pairs, and the all-rows oracle proves the merge lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cli_spark.operators.round15 import (
    _CP_RANK,
    _CP_RANK_DUCK,
    _CP_SPLIT_DUCK,
    _CP_SPLIT_SPARK,
    _MAXLONG,
)
from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# target micro-batch count (batchRows = ceil(n / 20)); own module
# attribute (not imported by value) so the tests' fast-mode fixture
# can patch it — the oracle string hard-codes the graded 20.
_N_BATCHES = 20

# one-sided Hoeffding slack at delta = 0.05 for a coverage proportion
# over n_test exchangeable points: sqrt(ln(1/delta) / (2n)), in ppm.
# The ONLY float step — shared verbatim, floored to BIGINT.
_CM_SLACK = ("CAST(floor(1000000.0 * sqrt(ln(20.0) / "
             "(2.0 * CAST(n_test AS DOUBLE)))) AS BIGINT)")


@register(
    "q493_streaming_conformal_monitor",
    oracle=f"""
WITH base AS (
  SELECT lang, doc_id, n_chars AS y, {_CP_SPLIT_DUCK} AS split
  FROM documents
),
n0 AS (SELECT COUNT(*) AS cnt FROM base WHERE split = 2),
bsz AS (SELECT CAST(ceil(cnt / {_N_BATCHES}.0) AS BIGINT) AS b FROM n0),
nb AS (SELECT (cnt + b - 1) // b AS nb FROM n0 CROSS JOIN bsz),
pred AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train,
         CAST(SUM(y) // COUNT(*) AS BIGINT) AS pred_chars
  FROM base WHERE split = 0 GROUP BY lang
),
calib AS (
  SELECT b.lang, abs(b.y - p.pred_chars) AS resid, b.doc_id
  FROM base b JOIN pred p USING (lang) WHERE b.split = 1
),
cn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_calib
       FROM calib GROUP BY lang),
qh AS (
  SELECT c.lang, n.n_calib,
         COALESCE(MAX(CASE WHEN c.rn = {_CP_RANK_DUCK.replace('n_calib', 'n.n_calib')}
                      THEN c.resid END),
                  {_MAXLONG}) AS qhat
  FROM (SELECT lang, resid,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY resid ASC, doc_id ASC) AS rn
        FROM calib) c
  JOIN cn n USING (lang)
  GROUP BY c.lang, n.n_calib
),
test AS (
  SELECT b.lang, CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN abs(b.y - p.pred_chars) <= q.qhat
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM base b JOIN pred p USING (lang) JOIN qh q ON q.lang = b.lang
  WHERE b.split = 2
  GROUP BY b.lang
),
cov AS (
  SELECT t.lang, p.n_train, q.n_calib, t.n_test, p.pred_chars,
         CAST(q.qhat AS BIGINT) AS qhat, t.n_covered,
         CAST(t.n_covered * 1000000 // GREATEST(t.n_test, 1) AS BIGINT)
           AS coverage_ppm,
         {_CM_SLACK} AS slack_ppm
  FROM test t JOIN pred p ON p.lang = t.lang JOIN qh q ON q.lang = t.lang
)
SELECT lang, n_train, n_calib, n_test, pred_chars, qhat, n_covered,
       coverage_ppm, CAST(900000 AS BIGINT) AS nominal_ppm, slack_ppm,
       CAST(CASE WHEN coverage_ppm + slack_ppm < 900000
            THEN 1 ELSE 0 END AS BIGINT) AS alarm,
       CAST(nb.nb AS BIGINT) AS n_batches
FROM cov CROSS JOIN nb
""",
    tags=("streaming", "true_stream", "conformal", "monitor",
          "mergeable"),
)
def q493_streaming_conformal_monitor(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CONFORMAL-COVERAGE MONITOR over ~20 TRUE micro-batches
    — q484's split-conformal audit run the way production runs it:
    the model (per-lang integer mean of n_chars on the TRAIN split)
    and the conformal quantile qhat (the ceil(0.9*(n+1))-th smallest
    calibration residual, MAX-BIGINT sentinel when the calibration
    split is smaller than the rank) are computed ONCE from the static
    splits; the TEST split then ARRIVES as a stream, replayed in
    doc_id order through ~20 real micro-batches. Each batch's
    foreachBatch sink joins the batch against the broadcast
    calibration table and writes ONLY its per-lang
    (n_test, n_covered) count pair — never document rows; the
    post-run merge is count-wise ADDITION (the q473/q491 algebra),
    and realized coverage_ppm is read off the merged counts beside
    the 90% nominal. The monitor's verdict is `alarm`: fires when
    even coverage_ppm + slack_ppm falls below nominal, where
    slack_ppm is the one-sided Hoeffding deviation
    sqrt(ln(1/0.05) / (2*n_test)) in ppm — a miscalibrated or
    drifted test stream trips it; sampling noise inside the
    confidence band does not. The all-rows DuckDB oracle recomputes
    everything from the batch table — a hash match proves the
    streamed count merge lossless AND the calibration/monitor chains
    engine-identical.

    Scale shape: streaming state is TWO integers per language per
    batch regardless of volume; the calibration table broadcast into
    the sink is one row per language (metadata-sized forever); each
    batch pays one map-side-combined count aggregate. At 100 TB/day
    the same sink runs per executor and any window/shard/day rollup
    of the monitor is one more addition — nobody re-scores old
    points. The single float step (the Hoeffding slack) is one shared
    IEEE chain floored to BIGINT; everything else is exact integers.
    n_batches = ceil(n/bsz) in Python, matching the oracle (the q479
    ADVICE idiom — never derived from data-bearing partials)."""
    import glob
    import os
    import shutil
    import tempfile

    from cli_spark.sources.replay_datasource import register_replay_source

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang", "doc_id", F.col("n_chars").alias("y"),
        F.expr(_CP_SPLIT_SPARK).alias("split"),
    )
    pred = base.filter(F.col("split") == 0).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("pred_chars"),
    )
    calib = (
        base.filter(F.col("split") == 1)
        .join(F.broadcast(pred), "lang")
        .select("lang", "doc_id",
                F.abs(F.col("y") - F.col("pred_chars")).alias("resid"))
    )
    cn = calib.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_calib"))
    qh = (
        calib.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("resid").asc(),
                                                   F.col("doc_id").asc())),
        )
        .join(F.broadcast(cn), "lang")
        .groupBy("lang", "n_calib")
        .agg(F.coalesce(
            F.max(F.when(F.col("rn") == F.expr(_CP_RANK), F.col("resid"))),
            F.lit(int(_MAXLONG))).alias("qhat"))
    )
    # the static calibration table shipped into every sink invocation:
    # one row per language, materialized so the stream never
    # recomputes the train/calibration chains per batch
    static = spark.createDataFrame(
        pred.join(qh.select("lang", "n_calib", "qhat"), "lang").collect(),
        "lang string, n_train long, pred_chars long, n_calib long, "
        "qhat long",
    )

    test_rows = base.filter(F.col("split") == 2).select(
        "lang", "doc_id", "y")
    n = test_rows.count()
    bsz = -(-n // _N_BATCHES)  # ceil
    nb = -(-n // bsz)

    tmp = tempfile.mkdtemp(prefix="q493_replay_")
    out_root = tempfile.mkdtemp(prefix="q493_cm_")
    try:
        (
            test_rows.repartition(1)
            .sortWithinPartitions(F.col("doc_id").asc())
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
            partial = (
                batch_df.join(
                    F.broadcast(static.select("lang", "pred_chars", "qhat")),
                    "lang")
                .groupBy("lang")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_test"),
                    F.sum(F.when(F.abs(F.col("y") - F.col("pred_chars"))
                                 <= F.col("qhat"), 1).otherwise(0))
                    .cast("long").alias("n_covered"),
                )
                .withColumn("batch_id", F.lit(batch_id).cast("long"))
            )
            partial.write.mode("append").parquet(f"{out_root}/partials")

        query = stream.writeStream.foreachBatch(sink).start()
        try:
            query.processAllAvailable()
        finally:
            query.stop()

        # ADDITION MERGE: per-lang sums over the per-batch count pairs
        merged = (
            spark.read.parquet(f"{out_root}/partials")
            .groupBy("lang")
            .agg(F.sum("n_test").cast("long").alias("n_test"),
                 F.sum("n_covered").cast("long").alias("n_covered"))
        )
        result = (
            merged.join(F.broadcast(static), "lang")
            .select(
                "lang", "n_train", "n_calib", "n_test", "pred_chars",
                F.col("qhat").cast("long").alias("qhat"), "n_covered",
                F.expr("CAST(n_covered * 1000000 DIV GREATEST(n_test, 1) "
                       "AS BIGINT)").alias("coverage_ppm"),
                F.lit(900000).cast("long").alias("nominal_ppm"),
            )
            .withColumn("slack_ppm", F.expr(_CM_SLACK))
            .withColumn(
                "alarm",
                F.expr("CAST(CASE WHEN coverage_ppm + slack_ppm < 900000 "
                       "THEN 1 ELSE 0 END AS BIGINT)"))
            .withColumn("n_batches", F.lit(nb).cast("long"))
        )
        out = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_root, ignore_errors=True)
    return out
