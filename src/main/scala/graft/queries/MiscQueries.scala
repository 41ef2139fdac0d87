package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Reshaping / utility operators that round out the engine surface:
  * pivot, unpivot, ordered string aggregation, time-series resampling
  * with gap fill, and deterministic hash sampling.
  *
  * Hash sampling uses md5 over INTEGER key columns only — md5 is
  * byte-identical across engines, while double→string casts are not.
  */
object MiscQueries extends QSet {

  /** Two ingest "feeds" of the same assets for perceptual dedup: the
    * original payloads plus a re-encoded copy whose FIRST byte flips
    * bit 0x20 (a metadata/header difference; ids offset 10⁷). Both
    * derivations are narrow expressions — the feed union never
    * shuffles. */
  private[graft] def mediaFeeds(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val orig = docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))
    val reenc = docs.select((col("doc_id") + 10000000L).as("media_id"),
      encode(concat(
        expr("char(ascii(substring(text, 1, 1)) ^ 32)"),
        expr("substring(text, 2)")), "UTF-8").as("payload"))
    orig.unionAll(reenc)
  }

  /** q_multimodal_phash body. `shareHashes` (r14 default ON) persists
    * the (media_id, phash) frame before the banded self-join — the
    * same precedent as simhash's signature persist: WITHOUT it the
    * plan evaluates the codec MapPartitions (pack → perceptualHash,
    * the expensive per-row decode+hash pass) once PER JOIN SIDE, i.e.
    * the whole media set is decoded twice for one query (verified in
    * plans/r14/q_multimodal_phash_before.txt: 2 MapPartitions, 4
    * scans). The persisted frame is 16 bytes/row — strictly smaller
    * than the payloads a second codec pass would re-read. In-run
    * materialization only; the bench's per-sample clearCache +
    * getPersistentRDDs cleanup releases it. Output is toggle-invariant
    * (R14TogglesSpec pins shared == unshared row-for-row). */
  private[graft] def phashPairs(s: org.apache.spark.sql.SparkSession,
      dir: String, shareHashes: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val media = graft.multimodal.Multimodal.pack(
      mediaFeeds(t(s, dir, "documents")),
      "media_id", "payload", "image", width = 64, height = 64)
      .as[graft.multimodal.Multimodal.MediaRow]
    val hashedRaw = graft.multimodal.Multimodal
      .perceptualHash(media, batchSize = 64)
      .toDF("media_id", "phash")
    val hashed = if (shareHashes) hashedRaw.persist() else hashedRaw
    val bands = hashed.select(col("media_id"), col("phash"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftright(phash, b * 16) & 65535 AS chunk))")).as("bc"))
      .select(col("media_id"), col("phash"),
        col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val cands = bands.select(col("media_id").as("m1"),
        col("phash").as("p1"), col("band"), col("chunk"))
      .join(bands.select(col("media_id").as("m2"),
        col("phash").as("p2"), col("band").as("band2"),
        col("chunk").as("chunk2")),
        col("band") === col("band2") && col("chunk") === col("chunk2") &&
          col("m1") < col("m2"))
      .select("m1", "m2", "p1", "p2").distinct()
    cands
      .withColumn("hamming", bit_count(col("p1").bitwiseXOR(col("p2"))))
      .filter(col("hamming") <= 3)
      .select(col("m1"), col("m2"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("m1", "m2")
  }

  val queries: Map[String, QFn] = Map(
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"),
            col("p_retailprice").as("p_retailprice")),
          "attr", "val")
        .orderBy("p_partkey", "attr")
    }),

    "q_agg_string_agg" -> ((s, dir) => {
      // ordered distinct concatenation — deterministic on both engines
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(
          array_join(array_sort(collect_set(col("source"))), ",")
            .as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    "q_ts_resample_fill" -> ((s, dir) => {
      // daily resample over the observed span with zero-fill: the day
      // spine derives from the DATA (no literals), so the query is
      // scale- and window-agnostic; spine build is a 1-row broadcast.
      val ev = events(s, dir)
      val daily = ev
        .groupBy(date_trunc("day", col("ts_us")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"),
          d4(sum(D(col("value")))).as("sum_val"))
      val span = ev.agg(
        min(date_trunc("day", col("ts_us")).cast("date")).as("d0"),
        max(date_trunc("day", col("ts_us")).cast("date")).as("d1"))
      val spine = span
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("sum_val"), lit(0.0)).as("sum_val"))
        .orderBy("day")
    }),

    // Non-oracle (the deterministic stub codec is JVM-side, not
    // SQL-expressible): full multimodal pipeline — pack text payloads
    // into the canonical binary media schema, batched decode → feature
    // extraction per partition (the mapInPandas-shaped path), then a
    // relational projection over the features. MultimodalSpec asserts
    // exact feature values; the driver records the rows-only check.
    "q_multimodal_features" -> ((s, dir) => {
      import s.implicits._
      val media = graft.multimodal.Multimodal.pack(
        t(s, dir, "documents").select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload", "image", width = 64, height = 64)
        .as[graft.multimodal.Multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media, batchSize = 64,
        dim = 16).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
        .orderBy("media_id")
    }),

    // Non-oracle (the aHash runs through the JVM codec boundary):
    // IMAGE near-dup via banded perceptual hashing — phash per media
    // row (narrow batched pass), 4 × 16-bit chunk banding, exact
    // Hamming verify. The media set is TWO ingest feeds of the same
    // assets (the second differing by one flipped metadata byte — the
    // re-encoded/watermarked-duplicate case perceptual dedup exists
    // for); the operator must recover the cross-feed pairs WITHOUT
    // knowing the feed structure. Pigeonhole makes the banding
    // COMPLETE for the declared radius (≤ 3 differing bits cannot
    // touch all 4 bands), same argument as the simhash text path — so
    // the output equals brute-force all-pairs Hamming ≤ 3, which
    // LibrarySpec asserts; the candidate join is equi on (band,
    // chunk), never all-pairs.
    "q_multimodal_phash" -> ((s, dir) => phashPairs(s, dir)),

    "q_merge_upsert" -> ((s, dir) => {
      // CDC-style SCD-1 merge: the latest order per customer acts as
      // the changelog and upserts onto the customer dim. Classified
      // MERGE actions (insert = changelog key missing from the dim /
      // update = both / keep = dim only) with coalesced values — the
      // full-outer-join formulation every warehouse merge lowers to.
      // One shuffle for the dedup window + one join, both on custkey;
      // at 100 TB both co-partition on the merge key (AQE handles the
      // changelog being much smaller than the dim).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val latest = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
        .join(latest, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNull, "insert")
            .when(col("o_custkey").isNull, "keep")
            .otherwise("update").as("action"),
          col("c_acctbal").as("old_bal"),
          coalesce(col("o_totalprice"), col("c_acctbal")).as("new_val"),
          col("o_orderdate").cast("date").as("last_date"))
        .orderBy("custkey")
    }),

    "q_agg_histogram" -> ((s, dir) => {
      // fixed-width histogram: bucket index from one double division +
      // floor (identical IEEE on both engines), min/max carry raw
      // column values — no aggregation-order hazard anywhere.
      t(s, dir, "orders")
        .select(floor(col("o_totalprice") / 50000.0).cast("long")
          .as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")
    }),

    "q_sample_stratified" -> ((s, dir) => {
      // per-stratum deterministic sampling: ~50% of English docs, ~6%
      // of every other language — the class-rebalancing shape training
      // pipelines use. Same md5-over-key selection as q_sample_hash,
      // with the rate keyed by the stratum column.
      val hex1 = substring(md5(col("doc_id").cast("string")), 1, 1)
      t(s, dir, "documents")
        .filter(when(col("lang") === "en", hex1 < "8")
          .otherwise(hex1 === "0"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "q_sample_hash" -> ((s, dir) => {
      // deterministic ~1/16 sample: first hex digit of md5 over the key
      // triple — reproducible, partition-count-independent, and
      // identical in any engine with md5.
      t(s, dir, "lineitem")
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))), 1, 1)
          === "0")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    }),

    // Deterministic 3-way train/val/test split (~80/10/10): the first
    // two md5 hex digits of the doc key compare lexicographically
    // against 'cc' (=204/256) and 'e6' (=230/256) — reproducible on
    // any engine/partitioning, every doc in exactly one split, and a
    // doc never migrates when the corpus grows (hash of the KEY, not
    // of position). The audit output is per-(split, lang) volume.
    "q_sample_split" -> ((s, dir) => {
      val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
      t(s, dir, "documents")
        .withColumn("split",
          when(h2 < "cc", "train").when(h2 < "e6", "val")
            .otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"))
        .orderBy("split", "lang")
    }),

    "q_scd2_history" -> ((s, dir) => {
      // SCD-2 dimension history build: every order versions its
      // customer's value; validity = [this version's date, next
      // version's date), open-ended for the current row. One window
      // per key — partitions by the dimension key, scales out.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key"))
        .orderBy(col("valid_from"), col("seq"))
      t(s, dir, "orders")
        .select(col("o_custkey").as("key"),
          col("o_orderkey").as("seq"),
          col("o_totalprice").as("value"),
          col("o_orderdate").cast("date").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull.cast("long"))
        .orderBy("key", "valid_from", "seq")
    }),

    // Point-in-time (temporal) join against the SCD-2 dimension: each
    // event attaches the version valid at its date. The lead()-chained
    // intervals are disjoint, so exactly one version matches any probe
    // at-or-after the first version (events before it keep NULLs via
    // the left join). Equi key + range residual = a hash join per key,
    // never an interval blowup.
    "q_join_scd2_pit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key"))
        .orderBy(col("valid_from"), col("seq"))
      val dim = t(s, dir, "orders")
        .select(col("o_custkey").as("key"),
          col("o_orderkey").as("seq"),
          col("o_totalprice").as("value"),
          col("o_orderdate").cast("date").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      val ev = events(s, dir)
        .select(col("event_id"), col("user_id"),
          col("ts_us").cast("date").as("d"))
      ev.join(dim,
          ev("user_id") === dim("key") &&
          col("valid_from") <= col("d") &&
          (col("valid_to").isNull || col("d") < col("valid_to")), "left")
        .select(col("event_id"), col("user_id"), col("d"),
          col("value").as("dim_value"),
          col("seq").cast("long").as("version_seq"))
        .orderBy("event_id")
    }),

    "q_funnel_conversion" -> ((s, dir) => {
      // Ordered event funnel (view → click → purchase): each stage's
      // timestamp is the first qualifying event AT OR AFTER the prior
      // stage. Three per-user aggregates chained by equi-joins on
      // user_id — co-partitioned shuffles, no window over the whole
      // corpus, scales with users.
      val ev = events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts_us") >= col("t_view"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts_us") >= col("t_click"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (lit(1L) + col("t_click").isNotNull.cast("long")
            + col("t_purchase").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    }),

    // DEADLINE funnel (the windowFunnel shape): unlike
    // q_funnel_conversion's open-ended stages, every later stage must
    // land within T = 24 h of the STARTING view, and any view can
    // start a chain — the user's funnel level is the best over all
    // starts. Greedy-earliest per stage is optimal under a fixed
    // deadline (taking the earliest qualifying click can only widen
    // the remaining window), so two chained left equi-joins on
    // user_id with range predicates compute the exact max chain — no
    // per-user iteration, candidate pairs bounded by per-user
    // activity².
    "q_funnel_window" -> ((s, dir) => {
      val T = 86400000000L // 24 h in µs
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts_us")).as("t"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("t").as("tv"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("uc"), col("t").as("tc"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("up"), col("t").as("tp"))
      val s1 = v.join(c, col("user_id") === col("uc") &&
          col("tc") >= col("tv") && col("tc") <= col("tv") + T, "left")
        .groupBy(col("user_id"), col("tv")).agg(min(col("tc")).as("tc1"))
      val s2 = s1.join(p, col("user_id") === col("up") &&
          col("tp") >= col("tc1") && col("tp") <= col("tv") + T, "left")
        .groupBy(col("user_id"), col("tv"), col("tc1"))
        .agg(min(col("tp")).as("tp1"))
      s2.select(col("user_id"),
          (lit(1L) + col("tc1").isNotNull.cast("long") +
            col("tp1").isNotNull.cast("long")).as("lvl"))
        .groupBy("user_id")
        .agg(max(col("lvl")).as("funnel_level"),
          count(lit(1)).as("n_starts"))
        .orderBy("user_id")
    }),

    // Incremental aggregate maintenance (materialized-view refresh):
    // history before the cutoff is a partial-aggregate STATE table; the
    // new batch re-aggregates only its own slice and MERGES into the
    // state — sum/count partials are associative, so the merged result
    // provably equals the one-shot aggregate (which IS the oracle). At
    // 100 TB this is the difference between scanning one day and
    // re-scanning years of history on every refresh.
    "q_incremental_agg" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cutoff = lit("1996-01-01").cast("timestamp")
      def part(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderpriority")
          .agg(sum(D(col("o_totalprice"))).as("s"), count(lit(1)).as("n"))
      val state = part(orders.filter(col("o_orderdate") < cutoff))
      val batch = part(orders.filter(col("o_orderdate") >= cutoff))
      state.union(batch)
        .groupBy("o_orderpriority")
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
        .select(col("o_orderpriority"), d4(col("s")).as("total"),
          col("n").cast("long").as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Incremental JOIN-view maintenance — the bilinear delta rule
    // (V = L ⋈ R ⟹ ΔV = ΔL⋈R₀ + L₀⋈ΔR + ΔL⋈ΔR), the step up from
    // q_incremental_agg's single-table refresh. Deltas are INDEPENDENT
    // per side (orders by order date, lineitems by ship date — a late
    // shipment against an old order exercises the ΔL⋈R₀ term), each
    // delta term joins a DELTA-sized side (filter-pushdown on its
    // partition column at 100 TB), and the merge into the stored
    // partial-aggregate state is associative decimal sums — so the
    // refreshed view provably equals the one-shot join aggregate,
    // which IS the oracle.
    "q_incremental_join" -> ((s, dir) => {
      val cutR = lit("2001-01-01").cast("timestamp")
      val cutL = lit("2001-03-01").cast("timestamp")
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderdate"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_shipdate"), rev.as("rev"))
      val (o0, dO) = (o.filter(col("o_orderdate") < cutR),
        o.filter(col("o_orderdate") >= cutR))
      val (l0, dL) = (l.filter(col("l_shipdate") < cutL),
        l.filter(col("l_shipdate") >= cutL))
      def part(lf: org.apache.spark.sql.DataFrame,
          of: org.apache.spark.sql.DataFrame) =
        lf.join(of, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("rev")).as("s"), count(lit(1)).as("n"))
      val state = part(l0, o0) // the stored view (derived inline here;
      // a deployment reads the materialized partial-aggregate table)
      val delta = part(dL, o0)
        .unionAll(part(l0, dO))
        .unionAll(part(dL, dO))
      state.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))
        .select(col("o_orderpriority"), d4(col("s")).as("revenue"),
          col("n").cast("long").as("n_lines"))
        .orderBy("o_orderpriority")
    }),

    // Linear interpolation of gapped per-user daily series — the
    // companion to q_ts_resample_fill's zero-fill: each user's day
    // spine spans their own (min, max) active day, missing days take
    // prev + (next − prev) · elapsed/gap from the nearest real
    // neighbours. Everything is per-user windows (ignoreNulls
    // last/first carry the neighbour value and ITS day in one pass);
    // no self-join, no iteration. Endpoints can't dangle: the spine
    // starts and ends on days that have data by construction. Both
    // engines interpolate the same d4-normalized doubles with the same
    // int-ratio fraction, so the arithmetic is bit-identical.
    "q_ts_interpolate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val daily = ev
        .groupBy(col("user_id"),
          date_trunc("day", col("ts_us")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt"), d4(sum(D(col("value")))).as("v"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wp = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val dayIfReal = when(col("v").isNotNull, col("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pd", last(dayIfReal, ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
        .withColumn("nd", first(dayIfReal, ignoreNulls = true).over(wn))
        .select(col("user_id"), col("day"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          round(when(col("v").isNotNull, col("v")).otherwise(
            col("pv") + (col("nv") - col("pv")) *
              (datediff(col("day"), col("pd")).cast("double") /
                datediff(col("nd"), col("pd")).cast("double"))), 4)
            .as("v_interp"))
        .orderBy("user_id", "day")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ts_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS cnt,
        |    CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        |        FROM daily GROUP BY 1)),
        |j AS (
        |  SELECT s.user_id, s.day, COALESCE(cnt, 0) AS cnt, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY s.user_id ORDER BY s.day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY s.user_id ORDER BY s.day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER (PARTITION BY s.user_id ORDER BY s.day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM spine s LEFT JOIN daily USING (user_id, day))
        |SELECT user_id, day, cnt,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    ELSE pv + (nv - pv) *
        |      (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END, 4)
        |    AS v_interp
        |FROM j
        |ORDER BY user_id, day""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin,

    "q_agg_string_agg" ->
      """SELECT lang,
        | (SELECT string_agg(src, ',' ORDER BY src)
        |  FROM (SELECT DISTINCT d2.source AS src FROM documents d2
        |        WHERE d2.lang = d.lang)) AS sources,
        | COUNT(*) AS n_docs
        |FROM documents d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_ts_resample_fill" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |   COUNT(*) AS cnt,
        |   CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    (SELECT MIN(day) FROM daily),
        |    (SELECT MAX(day) FROM daily), INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT spine.day, COALESCE(cnt, 0) AS cnt,
        | COALESCE(sum_val, 0.0) AS sum_val
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,

    "q_merge_upsert" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |  FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) = 1)
        |SELECT COALESCE(c.c_custkey, l.o_custkey) AS custkey,
        |  CASE WHEN c.c_custkey IS NULL THEN 'insert'
        |       WHEN l.o_custkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS action,
        |  c.c_acctbal AS old_bal,
        |  COALESCE(l.o_totalprice, c.c_acctbal) AS new_val,
        |  CAST(l.o_orderdate AS DATE) AS last_date
        |FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        | COUNT(*) AS cnt, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |  ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' END
        |ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity FROM lineitem
        |WHERE substring(md5(l_orderkey || '-' || l_linenumber || '-' || l_suppkey), 1, 1) = '0'
        |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_quantity""".stripMargin,

    "q_sample_split" ->
      """WITH x AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |           THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        |FROM x GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    "q_scd2_history" ->
      """SELECT o_custkey AS key, o_orderkey AS seq, o_totalprice AS value,
        |  CAST(o_orderdate AS DATE) AS valid_from,
        |  lead(CAST(o_orderdate AS DATE)) OVER w AS valid_to,
        |  CAST(lead(CAST(o_orderdate AS DATE)) OVER w IS NULL AS BIGINT)
        |    AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY key, valid_from, seq""".stripMargin,

    "q_join_scd2_pit" ->
      """WITH dim AS (
        |  SELECT o_custkey AS key, o_orderkey AS seq,
        |    o_totalprice AS value,
        |    CAST(o_orderdate AS DATE) AS valid_from,
        |    lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to
        |  FROM orders),
        |e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT e.event_id, e.user_id, e.d, dim.value AS dim_value,
        |  CAST(dim.seq AS BIGINT) AS version_seq
        |FROM e LEFT JOIN dim ON e.user_id = dim.key
        |  AND dim.valid_from <= e.d
        |  AND (dim.valid_to IS NULL OR e.d < dim.valid_to)
        |ORDER BY event_id""".stripMargin,

    "q_funnel_conversion" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
        |  CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS stage
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    // the oracle is the ONE-SHOT aggregate: state+batch merge must equal it
    "q_incremental_agg" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS total,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |v AS (SELECT user_id, t AS tv FROM e WHERE event_type = 'view'),
        |s1 AS (
        |  SELECT v.user_id, v.tv, MIN(c.t) AS tc1
        |  FROM v LEFT JOIN e c ON c.user_id = v.user_id
        |    AND c.event_type = 'click'
        |    AND c.t >= v.tv AND c.t <= v.tv + 86400000000
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT s1.user_id, s1.tv, s1.tc1, MIN(p.t) AS tp1
        |  FROM s1 LEFT JOIN e p ON p.user_id = s1.user_id
        |    AND p.event_type = 'purchase'
        |    AND p.t >= s1.tc1 AND p.t <= s1.tv + 86400000000
        |  GROUP BY 1, 2, 3)
        |SELECT user_id,
        |  CAST(MAX(1 + CASE WHEN tc1 IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN tp1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS funnel_level,
        |  COUNT(*) AS n_starts
        |FROM s2 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the one-shot join aggregate the maintained view must equal
    "q_incremental_join" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
