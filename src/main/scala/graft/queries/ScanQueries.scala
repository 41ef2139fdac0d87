package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.1 — scans / sources. Column pruning + predicate pushdown
  * are delegated to Catalyst (verified in plans: `PushedFilters`,
  * `ReadSchema` carry them into the vectorized parquet reader), so these
  * queries are deliberately thin: their value is proving the scan path,
  * the ns-timestamp recipe, and the JSON-in-string source shape.
  *
  * NOTE (measured at sf0.01): (l_orderkey, l_linenumber) is NOT unique in
  * this generator's lineitem — scans over it must ORDER BY every projected
  * column for a total order (SURVEY.md A.3).
  */
object ScanQueries extends QSet {

  /** Side-effecting round-trip queries write under a per-session unique
    * dir (applicationId): two concurrent harness invocations on one
    * host must not race on a shared /tmp path (overwrite-mode made
    * re-runs safe, not concurrent runs).
    */
  private def tmpDir(s: org.apache.spark.sql.SparkSession, kind: String,
      dir: String): String =
    s"${graft.engine.Tables.tmpRoot}/graft_src_${kind}_" +
      s"${new java.io.File(dir).getName}_" +
      s.sparkContext.applicationId

  /** Month-partitioned orders layout memo, keyed (applicationId, sfDir):
    * the date-partitioned write is LAYOUT PREPARATION — at 100 TB the
    * fact lands date-partitioned from ingestion (SURVEY.md §7.4), so the
    * declared query's timed path is the partition-pruned read only. The
    * path is keyed by sfDir alone, so overwrite reuses one /tmp location
    * across harness runs instead of accreting per-appId copies.
    */
  private val partitionedOrders =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Layout prep for q_source_schema_evolution: two write GENERATIONS
    * of the orders feed — gen1 before `o_orderstatus` existed (even
    * keys), gen2 after the column was added (odd keys). At 100 TB a
    * long-lived ingestion directory ALWAYS spans schema generations;
    * the engine must read them as one table. Memoized like the other
    * layout preps; overwrite keeps one /tmp location per sfDir.
    */
  private val evolvedOrders =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def ensureEvolvedOrders(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    evolvedOrders.computeIfAbsent(
      s.sparkContext.applicationId + "|" + dir, _ => {
        val tag = new java.io.File(dir).getName
          .replaceAll("[^A-Za-z0-9]", "_")
        val path = s"${graft.engine.Tables.tmpRoot}/graft_evolved_orders_$tag"
        val o = t(s, dir, "orders")
        graft.sources.Readers.writeParquet(
          o.filter(col("o_orderkey") % 2 === 0)
            .select("o_orderkey", "o_custkey", "o_totalprice"),
          s"$path/gen1")
        graft.sources.Readers.writeParquet(
          o.filter(col("o_orderkey") % 2 === 1)
            .select("o_orderkey", "o_custkey", "o_totalprice",
              "o_orderstatus"),
          s"$path/gen2")
        path
      })

  def ensurePartitionedOrders(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    partitionedOrders.computeIfAbsent(
      s.sparkContext.applicationId + "|" + dir, _ => {
        val tag = new java.io.File(dir).getName
          .replaceAll("[^A-Za-z0-9]", "_")
        val path = s"${graft.engine.Tables.tmpRoot}/graft_part_orders_$tag"
        graft.sources.Readers.writeParquet(
          t(s, dir, "orders").withColumn("o_month",
            date_format(col("o_orderdate"), "yyyy-MM")),
          path, partitionBy = Seq("o_month"))
        path
      })

  val queries: Map[String, QFn] = Map(
    // Partition pruning as a DECLARED query (not just a PlanSpec proof):
    // the month equality lands in the scan's PartitionFilters, so only
    // the o_month=1996-06 directory is listed and read — on a 100 TB
    // date-partitioned fact this is the difference between scanning one
    // day's worth of files and the whole table. Partitioning is
    // result-invariant, so the oracle runs the same filter+aggregate on
    // the original unpartitioned parquet. PlanSpec asserts the pruned
    // scan reads only matching partition directories.
    "q_scan_partition_pruned" -> ((s, dir) => {
      val path = ensurePartitionedOrders(s, dir)
      graft.sources.Readers.parquet(s, path)
        .filter(col("o_month") === "1996-06")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          d4(sum(D(col("o_totalprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // Schema evolution as a DECLARED query: gen1 files physically lack
    // o_orderstatus, gen2 files carry it; the mergeSchema read unions
    // the footers so gen1 rows surface the column as NULL. The layout
    // is result-equivalent to nulling the column on even keys, so the
    // oracle runs that projection over the ORIGINAL parquet — the
    // evolved read must agree exactly.
    "q_source_schema_evolution" -> ((s, dir) => {
      val p = ensureEvolvedOrders(s, dir)
      graft.sources.Readers.parquetMerged(s, s"$p/gen1", s"$p/gen2")
        .groupBy(coalesce(col("o_orderstatus"), lit("ABSENT"))
          .as("status"))
        .agg(count(lit(1)).as("n_orders"),
          d4(sum(D(col("o_totalprice")))).as("sum_price"))
        .orderBy("status")
    }),

    "q_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    "q_scan_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    }),

    "q_scan_events_ns" -> ((s, dir) => {
      // ns-timestamp hazard demo: ts_us (µs-truncated) equals DuckDB's
      // plain read of the same ns column. SURVEY.md Appendix A.1.
      events(s, dir)
        .select(col("event_id"), col("ts_us").as("ts"))
        .orderBy("event_id")
    }),

    "q_source_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }),

    // Ingestion breadth INSIDE the graded set: the dim round-trips
    // through the csv writer/reader (explicit schema — inference reads
    // the data twice and can drift types), then aggregates. The oracle
    // runs the same aggregation on the original parquet: csv is
    // lossless for these int/string columns, so results must match.
    "q_source_csv_roundtrip" -> ((s, dir) => {
      val path = tmpDir(s, "csv", dir)
      graft.sources.Readers.writeCsv(
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey"),
        path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      graft.sources.Readers.csv(s, path, Some(schema))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"),
          array_join(array_sort(collect_set(col("n_name"))), ",")
            .as("nations"))
        .orderBy("n_regionkey")
    }),

    // Columnar-to-columnar round-trip through the ORC writer/reader —
    // ORC is self-describing (schema from footers, no explicit schema
    // needed) and lossless for every Spark type here, so the aggregate
    // over the round-tripped copy must equal the parquet original.
    "q_source_orc_roundtrip" -> ((s, dir) => {
      val path = tmpDir(s, "orc", dir)
      graft.sources.Readers.writeOrc(
        t(s, dir, "customer")
          .select("c_custkey", "c_mktsegment", "c_acctbal"),
        path)
      graft.sources.Readers.orc(s, path)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          d4(sum(D(col("c_acctbal")))).as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    // Same shape through the json writer/reader; doubles survive JSON
    // (the writer emits round-trip-safe precision) and the decimal
    // aggregation discipline applies as everywhere else.
    "q_source_json_roundtrip" -> ((s, dir) => {
      val path = tmpDir(s, "json", dir)
      graft.sources.Readers.writeJson(
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal"),
        path)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType)))
      graft.sources.Readers.json(s, path, Some(schema))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"),
          d4(sum(D(col("s_acctbal")))).as("sum_bal"))
        .orderBy("s_nationkey")
    }),

    "q_source_json_corrupt" -> ((s, dir) => {
      // corrupt-tolerant ingest: supplier serialized to JSON lines with
      // three malformed lines injected, read back PERMISSIVE — good rows
      // parse (and must aggregate identically to the parquet original),
      // bad lines land in the quarantine column instead of failing the
      // read. Oracle knows n_corrupt = the 3 injected literals.
      import s.implicits._
      val path = tmpDir(s, "json_corrupt", dir)
      val good = t(s, dir, "supplier")
        .select(to_json(struct(col("s_suppkey"), col("s_nationkey"),
          col("s_acctbal"))).as("value"))
      val bad = Seq("{\"s_suppkey\": oops", "[unterminated",
        "not json at all").toDF("value")
      good.unionAll(bad).write.mode("overwrite").text(path)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType)))
      graft.sources.Readers.jsonTolerant(s, path, schema)
        .agg(count(col("s_suppkey")).as("n_good"),
          count(col("_corrupt")).as("n_corrupt"),
          d4(sum(D(col("s_acctbal")))).as("sum_bal"))
        .orderBy("n_good")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_source_schema_evolution" ->
      s"""SELECT COALESCE(CASE WHEN o_orderkey % 2 = 1
        |    THEN o_orderstatus END, 'ABSENT') AS status,
        |  COUNT(*) AS n_orders,
        |  ${sqlD4("SUM(CAST(o_totalprice AS DECIMAL(18,4)))")} AS sum_price
        |FROM orders
        |GROUP BY 1
        |ORDER BY status""".stripMargin,

    "q_scan_partition_pruned" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
        | ${sqlD4("SUM(CAST(o_totalprice AS DECIMAL(18,4)))")} AS sum_price
        |FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '1996-06'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin,

    "q_scan_events_ns" ->
      "SELECT event_id, ts FROM events ORDER BY event_id",

    "q_source_json_props" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_source_csv_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations,
        | (SELECT string_agg(nm, ',' ORDER BY nm)
        |  FROM (SELECT DISTINCT n2.n_name AS nm FROM nation n2
        |        WHERE n2.n_regionkey = n.n_regionkey)) AS nations
        |FROM nation n GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_source_orc_roundtrip" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        | CAST(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_source_json_roundtrip" ->
      """SELECT s_nationkey, COUNT(*) AS n_supp,
        | CAST(CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_source_json_corrupt" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
        | CAST(3 AS BIGINT) AS n_corrupt,
        | CAST(CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_bal
        |FROM supplier ORDER BY n_good""".stripMargin
  )
}
