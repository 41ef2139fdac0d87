package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + cross-engine determinism helpers.
  *
  * Two hazards every query must respect (SURVEY.md Appendix A):
  *  - `events.ts` is a nanosecond parquet timestamp: Spark 4.x refuses it
  *    by default; DuckDB silently truncates to µs. The [[events]] loader
  *    encapsulates the verified reconciliation recipe.
  *  - double aggregation is accumulation-order dependent: all money/metric
  *    aggregates go through [[D]] (decimal 18,4) so partial/final merge
  *    order can't change the answer, on either engine.
  */
object Tables {

  /** Tables whose queries explode rows (char/token n-grams, bit votes,
    * vector ops): their testdata parquet is a single tiny file = ONE
    * input partition, so without a spread the whole explode-heavy
    * pipeline runs on one core. On a real deployment these corpora are
    * many files/row-groups and the scan parallelizes by itself; the
    * repartition below only pays a sub-MB shuffle to restore the
    * parallelism the single-file fixture hides. Row order stays
    * irrelevant: every declared query aggregates and ends in a
    * total-order sort (SURVEY.md A.3).
    */
  private val rowExplosive = Set("documents", "embeddings")

  /** Plain parquet table at `sfDir/name.parquet`. The spread check reads
    * `inputFiles` (the driver-side file listing the scan already built)
    * rather than `rdd.getNumPartitions`, which would materialize the
    * whole RDD lineage just to count partitions — constant planning
    * cost on every load. Fewer files than cores is exactly the fixture
    * case the repartition exists for; a many-file production directory
    * skips it. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (rowExplosive(name) &&
        df.inputFiles.length < spark.sparkContext.defaultParallelism)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** `events` with the ns-timestamp recipe: raw `ts` column stays as
    * epoch-nanos Long (via nanosAsLong), and a derived `ts_us` Timestamp
    * equals DuckDB's µs-truncated read of the same column. Integer `div`
    * is mandatory — double `/1000` is only ~0.25 µs-granular at 1.7e18.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // REQUIRE the conf rather than set it: a loader silently mutating
    // session state at plan-build time is a surprising side effect in a
    // library (it would also affect unrelated concurrent plans). Every
    // harness entry point (Verify/Bench/TestSpark) pins this at builder
    // time; anything else gets a clear actionable error instead of a
    // mid-scan PARQUET_TYPE_ILLEGAL.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "events.parquet carries nanosecond timestamps: build the session " +
        "with spark.sql.legacy.parquet.nanosAsLong=true (see Bench/Verify)")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
  }

  /** The fixed decimal type all cross-engine-compared aggregates use. */
  val Dec: DecimalType = DecimalType(18, 4)

  /** Decimal-ize BEFORE aggregating (order-independent exact sums). */
  def D(c: Column): Column = c.cast(Dec)

  /** Final output conversion: exact decimal → DOUBLE through its exact
    * string. Parquet DECIMAL reaches pandas as object/Decimal while
    * DuckDB's client hands decimals over as float64 — a dtype mismatch
    * the driver's comparator flags even when every value agrees
    * (observed round 1: every decimal-output query hash-mismatched).
    * String→double parsing is correctly rounded on both engines (A.8),
    * so both sides parse identical digit strings into bit-identical
    * float64 — safe for any downstream compare. */
  def d4(c: Column): Column =
    c.cast(Dec).cast(StringType).cast(DoubleType)

  /** SQL-side twin of [[d4]] for oracle strings. */
  def sqlD4(expr: String): String =
    s"CAST(CAST(CAST($expr AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)"
}
