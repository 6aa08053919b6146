package graft

import org.apache.spark.sql.SparkSession

/** Standard session configuration for the graft engine.
  *
  * - `spark.sql.ansi.enabled=false`: the funnel sources are string-typed CSVs
  *   cast at query time (`CAST(x AS DOUBLE)`, reference
  *   `report_engine.py:123-153`). The reference degrades gracefully on bad
  *   cells (Drill error -> caught -> empty frame, `report_engine.py:60-62`);
  *   non-ANSI casts (bad cell -> null, skipped by SUM) are the Spark analogue.
  *   Spark 4 defaults ANSI on, which would instead kill the job.
  * - `spark.sql.shuffle.partitions` sized to cores: local[N] has N executor
  *   threads; 200 (the default) would produce tiny shuffle files. On a real
  *   cluster this is overridden by AQE coalescing anyway.
  * - AQE on: runtime re-plan (skew-join split, partition coalescing) is the
  *   100 TB posture — plans are sized by observed stats, not guesses.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Apply graft defaults to an externally created session (e.g. the
    * driver's); runtime-settable confs only.
    *
    * `nanosAsLong`: the harness's `events.parquet` carries
    * TIMESTAMP(NANOS), which Spark 4 otherwise refuses to read
    * (PARQUET_TYPE_ILLEGAL); with this on, `ts` arrives as raw Long nanos
    * and readers normalize it (see graft.queries.Relational.events).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // size shuffles to the actual core count when the caller's session
    // kept the 200 default (builder() already does this for our mains)
    if (spark.conf.get("spark.sql.shuffle.partitions") == "200")
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.sparkContext.defaultParallelism.toString)
    spark
  }
}
