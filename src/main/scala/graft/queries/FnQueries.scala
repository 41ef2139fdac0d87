package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.7 — scalar function families. One query per family.
  *
  * Cross-engine type alignment (verified hazards):
  *  - DuckDB `length`/`year`/`date_diff` return BIGINT where Spark gives
  *    INT → Spark side casts to long.
  *  - Spark `ceil(double)` returns LONG; DuckDB returns DOUBLE → oracle
  *    casts to BIGINT.
  *  - DuckDB `regexp_replace` replaces FIRST match unless given the 'g'
  *    flag; Spark replaces all → oracle always passes 'g'.
  *  - float math runs in DOUBLE on both engines, `round(,4)` only where
  *    accumulation order could differ (SURVEY.md A.2).
  */
object FnQueries extends QSet {

  val queries: Map[String, QFn] = Map(
    "q_fn_string" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_type")).as("up"),
          length(col("p_name")).cast("long").as("len"),
          substring(col("p_name"), 1, 4).as("sub4"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("cat"),
          regexp_replace(col("p_name"), " ", "_").as("undescored"),
          element_at(split(col("p_name"), " "), 1).as("tok1"),
          lpad(col("p_type"), 10, ".").as("padded"),
          trim(col("p_name")).as("trimmed"))
        .orderBy("p_partkey")
    }),

    "q_fn_regexp" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"))
        .orderBy("p_partkey")
    }),

    "q_fn_date" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          // DuckDB date_trunc('month') yields DATE — align on DATE.
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("long")
            .as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate")).as("eom"))
        .orderBy("o_orderkey")
    }),

    "q_fn_math" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          abs(col("o_totalprice") - 250000.0).as("dist_mid"),
          ceil(col("o_totalprice")).as("ceiled"),
          floor(col("o_totalprice")).as("floored"),
          sqrt(col("o_totalprice")).as("rooted"),
          // Java Math.log and libm log differ in the last ulp (measured at
          // sf0.001) — transcendentals are rounded to 8dp on both engines.
          round(log(col("o_totalprice")), 8).as("logged"),
          round(pow(col("o_totalprice") / 1000.0, 2.0), 6).as("powed"),
          (col("o_orderkey") % 7).as("modded"))
        .orderBy("o_orderkey")
    }),

    "q_fn_array" -> ((s, dir) => {
      // NOTE: no array-typed output columns — the driver's comparator
      // sorts rows by every column in pandas, and ndarray cells are
      // unhashable there (observed round 1: compare crashed). Arrays are
      // exercised (slice/filter/transform/aggregate) but reduced to
      // scalars before the final projection.
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_elem"),
          element_at(slice(col("embedding"), 2, 3), 1).cast("double")
            .as("slice_first"),
          // booleans emit as 0/1 longs: the downstream comparator's
          // bool handling is unproven (no round-1 query emitted one)
          array_contains(col("embedding"), element_at(col("embedding"), 5))
            .cast("long").as("has_fifth"),
          size(expr("filter(embedding, x -> x > 0)")).cast("long")
            .as("n_pos"),
          // 64-element sequential fold in DOUBLE: same order on both
          // engines; round(,4) guards the last-ulp (SURVEY.md §2.8).
          expr("round(sqrt(aggregate(embedding, cast(0 as double), " +
            "(acc, x) -> acc + cast(x as double) * cast(x as double))), 4)")
            .as("l2_norm"))
        .orderBy("vec_id")
    }),

    "q_fn_explode" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("val"))
        .orderBy("vec_id", "pos")
    }),

    // Nested types as first-class columns: props parses into a real
    // MapType (not string re-extraction), map ops reduce it to scalars,
    // and a struct round-trips through pack/extract. Outputs stay
    // scalar (comparator discipline, A.9).
    "q_fn_struct_map" -> ((s, dir) => {
      events(s, dir)
        .withColumn("m",
          from_json(col("props"), MapType(StringType, LongType)))
        .select(
          col("event_id"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          element_at(col("m"), "k").as("k_val"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          struct(col("event_id").as("id"), col("user_id").as("uid"))
            .getField("uid").as("uid_via_struct"))
        .orderBy("event_id")
    }),

    "q_fn_json" -> ((s, dir) => {
      // from_json with the known schema parses props ONCE per row into a
      // typed struct; get_json_object re-runs a JsonPath parse per call
      // (measured 2.3s → this shape at sf0.1; the per-extraction cost is
      // linear forever as fields are added).
      events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // Edit-distance family (the scalar backbone of fuzzy key matching /
    // near-dup verification): levenshtein between each customer name
    // and the NEXT name in its nation — the window pairing keeps the
    // candidate set linear in the table (one pair per row), where a
    // naive distance self-join would be quadratic. Both engines
    // implement classic unit-cost edit distance.
    "q_fn_strdist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_name"))
        .withColumn("next_name", lead(col("c_name"), 1).over(w))
        .filter(col("next_name").isNotNull)
        .select(col("c_custkey"), col("c_name"), col("next_name"),
          levenshtein(col("c_name"), col("next_name")).cast(LongType)
            .as("lev"))
        .orderBy("c_custkey")
    }),

    // Timezone conversion family: the UTC-instant event stream rendered
    // in local wall-clock zones (IANA tz database on both engines —
    // Spark's JVM zone rules vs DuckDB's ICU agree on these zones).
    // Wall timestamps are emitted as epoch-µs-of-the-naive-value via
    // unix_micros (A.9: no raw timestamp dtype alignment risk), local
    // hour/date as the analyst-facing columns. Narrow per-row
    // projection — codegen'd, no shuffle before the output sort.
    "q_fn_datetime_tz" -> ((s, dir) => {
      val ny = from_utc_timestamp(col("ts_us"), "America/New_York")
      val tokyo = from_utc_timestamp(col("ts_us"), "Asia/Tokyo")
      events(s, dir)
        .select(col("event_id"),
          unix_micros(col("ts_us")).as("utc_us"),
          hour(ny).cast(LongType).as("ny_hour"),
          ny.cast(DateType).as("ny_date"),
          hour(tokyo).cast(LongType).as("tokyo_hour"),
          tokyo.cast(DateType).as("tokyo_date"),
          // round-trip proof: NY wall time re-interpreted as NY is the
          // original instant
          unix_micros(to_utc_timestamp(ny, "America/New_York"))
            .as("roundtrip_us"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_datetime_tz" ->
      """SELECT event_id, epoch_us(ts) AS utc_us,
        | CAST(hour(timezone('America/New_York', timezone('UTC', ts)))
        |   AS BIGINT) AS ny_hour,
        | CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE)
        |   AS ny_date,
        | CAST(hour(timezone('Asia/Tokyo', timezone('UTC', ts)))
        |   AS BIGINT) AS tokyo_hour,
        | CAST(timezone('Asia/Tokyo', timezone('UTC', ts)) AS DATE)
        |   AS tokyo_date,
        | epoch_us(timezone('America/New_York',
        |   timezone('America/New_York', timezone('UTC', ts))))
        |   AS roundtrip_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_strdist" ->
      """WITH x AS (
        |  SELECT c_custkey, c_name,
        |    lead(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_custkey)
        |      AS next_name
        |  FROM customer)
        |SELECT c_custkey, c_name, next_name,
        |  CAST(levenshtein(c_name, next_name) AS BIGINT) AS lev
        |FROM x WHERE next_name IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,
    "q_fn_string" ->
      """SELECT p_partkey,
        | lower(p_name) AS lo, upper(p_type) AS up,
        | length(p_name) AS len,
        | substring(p_name, 1, 4) AS sub4,
        | p_brand || '-' || p_type AS cat,
        | regexp_replace(p_name, ' ', '_', 'g') AS undescored,
        | string_split(p_name, ' ')[1] AS tok1,
        | lpad(p_type, 10, '.') AS padded,
        | trim(p_name) AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_regexp" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | last_day(o_orderdate) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_math" ->
      """SELECT o_orderkey,
        | abs(o_totalprice - 250000.0) AS dist_mid,
        | CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
        | CAST(floor(o_totalprice) AS BIGINT) AS floored,
        | sqrt(o_totalprice) AS rooted,
        | round(ln(o_totalprice), 8) AS logged,
        | round(pow(o_totalprice / 1000.0, 2.0), 6) AS powed,
        | o_orderkey % 7 AS modded
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_array" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS BIGINT) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first_elem,
        | CAST(embedding[2:4][1] AS DOUBLE) AS slice_first,
        | CAST(list_contains(embedding, embedding[5]) AS BIGINT) AS has_fifth,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        | round(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_fn_explode" ->
      """SELECT * FROM (
        | SELECT vec_id,
        |  unnest(range(len(embedding))) AS pos,
        |  unnest(embedding) AS val
        | FROM embeddings)
        |ORDER BY vec_id, pos""".stripMargin,

    "q_fn_struct_map" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        | CAST(props->>'$.k' AS BIGINT) AS k_val,
        | array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
        | struct_pack(id := event_id, uid := user_id).uid AS uid_via_struct
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_json" ->
      """SELECT event_type, COUNT(*) AS cnt,
        | CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
