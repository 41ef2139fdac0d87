package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** SURVEY.md §2.1 (surface row) — ingestion breadth: csv/json/parquet
  * readers and writers as library functions. No csv/json testdata exists,
  * so these are covered by round-trip scalatest instead of the oracle.
  *
  * Scale notes: both readers keep Spark's splittable-file parallelism;
  * `schema` should be passed at 100 TB (inference reads the data twice).
  * Writers partition by the given columns so downstream scans prune.
  */
object Readers {

  def csv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  def json(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
    schema.fold(base)(base.schema).json(path)
  }

  /** Corrupt-tolerant JSON reader: PERMISSIVE parse; a malformed line
    * lands whole in the `_corrupt` string column (its data columns
    * null) instead of failing the job — the 100 TB posture, where a
    * 10^11-line crawl WILL contain bad records and one of them must not
    * kill a 1000-executor stage. Callers split the quarantine off on
    * `_corrupt IS NOT NULL` and keep ingesting. Spark disallows plans
    * that reference ONLY the corrupt column — always select data
    * columns alongside it.
    */
  def jsonTolerant(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolution-tolerant parquet read: `mergeSchema` unions the
    * footers of every file, so batches written before a column was
    * added read as NULL in that column instead of failing or silently
    * dropping it — the only safe default for a long-lived ingestion
    * directory. Costs one footer pass over the file listing (not the
    * data), so it stays cheap even at 100 TB. */
  def parquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Small-file compaction: rewrite a directory into `targetFiles`
    * similarly-sized files. Streaming sinks and per-batch CDC merges
    * accrete thousands of small files whose per-file open/footer cost
    * eventually dominates scans; periodic compaction is standard
    * ingestion hygiene. Write to a NEW directory then swap — an
    * in-place rewrite that dies mid-job loses data, so a dst equal to
    * (or nested under) src is rejected up front rather than left to
    * Spark's read-while-overwriting failure mode. */
  def compactParquet(spark: SparkSession, srcDir: String, dstDir: String,
      targetFiles: Int): Unit = {
    val src = new java.io.File(srcDir).getCanonicalFile.toPath
    val dst = new java.io.File(dstDir).getCanonicalFile.toPath
    require(dst != src && !dst.startsWith(src) && !src.startsWith(dst),
      s"compactParquet dst must be a separate directory (src=$src dst=$dst)" +
        ": an in-place overwrite deletes the input mid-read, and a dst that" +
        " is a parent of src deletes src when Overwrite clears dst")
    spark.read.parquet(srcDir).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
  }

  /** ORC reader — the other self-describing columnar at-rest format the
    * ingestion surface supports (schema from file footers, splittable,
    * predicate pushdown like parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Line-oriented text reader (one `value` row per line) — the raw-crawl
    * ingest format. Splittable like csv/json, so a 100 TB dump of .txt
    * shards parallelizes by file/block; parsing happens downstream as
    * Column expressions, not in the reader. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Whole-file binary reader (`binaryFile` format): one row per file
    * with (path, modificationTime, length, content BINARY) — the
    * multimodal ingest path for image/audio/video blobs that have no
    * record structure to split on. Files parallelize across tasks by
    * listing; `pathGlobFilter` keeps a mixed directory from dragging
    * non-media files into the scan. Pair with
    * `graft.multimodal.Multimodal` decode stages downstream. */
  def binaryFiles(spark: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    glob.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  /** Range-clustered parquet writer — the layout producer behind
    * zone-map/file-skipping reads (q_layout_zorder audits the effect;
    * this writes it). `repartitionByRange` gives disjoint per-file key
    * ranges, `sortWithinPartitions` tightens row groups within each
    * file, and `maxRecordsPerFile` bounds file size so one hot range
    * can't produce a 100 GB straggler file. For multi-dimensional
    * clustering pass a computed Z-value column as `clusterCols.head`.
    */
  def writeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String], nFiles: Int,
      maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = clusterCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def writeCsv(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .partitionBy(partitionBy: _*).csv(path)

  def writeJson(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).json(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).orc(path)

  /** Date/key-partitioned parquet — the 100 TB at-rest layout (partition
    * pruning + DPP need partitioned writes, SURVEY.md §4.1). */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(path)
}
