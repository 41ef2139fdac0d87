package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** SURVEY.md §2.11 — the remaining distinctive TPC-H query shapes, each
  * adapted to this schema (no partsupp / commitdate / receiptdate /
  * shipmode columns in the fixtures — adaptations keep the SHAPE that
  * makes each query a benchmark classic, substituting columns that
  * exist).
  *
  * 100 TB posture per query is noted inline; the common thread: every
  * dimension side broadcasts, every fact⋈fact shuffles on its key once,
  * correlated subqueries become aggregate-then-join (the standard
  * decorrelation Spark's own subquery planner performs), and global
  * scalars ride windows or 1-row broadcasts, never a driver collect.
  */
object TpchQueries extends QSet {

  val queries: Map[String, QFn] = Map(

    // TPC-H Q4 (order priority checking) adapted: no commit/receipt
    // dates → "late" = a lineitem shipped >30 days after the order
    // date. The shape: EXISTS against the fact, executed as a left-semi
    // join whose condition carries the equi key PLUS the non-equi
    // lateness predicate — one shuffle of each fact restricted to the
    // quarter, 5-row result.
    "q_tpch_q4" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-07-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-10-01")))
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q15 (top supplier): per-supplier quarter revenue compared
    // for EXACT equality against the global max. The max rides an
    // unpartitioned window over the per-supplier aggregate output
    // (≤ |suppliers| rows — tiny by construction, never a second fact
    // scan), and the compare stays in exact decimal so "ties return
    // both" is engine-independent. Supplier dim broadcasts into the
    // winners only.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      val bySupp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-07-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
        .groupBy("l_suppkey")
        .agg(sum(rev).as("total_rev"))
      bySupp
        .withColumn("mx", max(col("total_rev")).over(Window.partitionBy()))
        .filter(col("total_rev") === col("mx"))
        .join(dim(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          d4(col("total_rev")).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 (parts/supplier relationship) adapted: no partsupp →
    // count distinct suppliers per (brand, type, size) from lineitem;
    // "complaint" suppliers (NOT IN subquery) = negative account
    // balance. s_suppkey is non-null, so NOT IN ≡ anti join — executed
    // as a broadcast anti join (the excluded set is a filtered dim),
    // with the part dim broadcast too; the only shuffle is the
    // 3-key count-distinct aggregate.
    "q_tpch_q16" -> ((s, dir) => {
      val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
      t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(dim(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#45" &&
            col("p_size").isin(sizes: _*)),
          col("l_partkey") === col("p_partkey"))
        .join(dim(s, dir, "supplier")
          .filter(col("s_acctbal") < 0.0).select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q19 (discounted revenue) adapted: the OR-of-ANDs predicate
    // — three (brand, size-range, quantity-range) arms — with the
    // grouped revenue per brand (grouped rather than Q19's single row
    // to keep a sortable graded output). The point is predicate
    // structure: Catalyst extracts p_partkey = l_partkey as the join
    // key, pushes the common p_size/l_quantity bounds, and evaluates
    // the disjunction post-join without turning the join into a BNLJ.
    "q_tpch_q19" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      val arm = (b: String, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === b && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      t(s, dir, "lineitem")
        .join(dim(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .filter(arm("Brand#12", 15, 1, 20) || arm("Brand#23", 25, 10, 35) ||
          arm("Brand#13", 35, 20, 50))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"), d4(sum(rev)).as("revenue"))
        .orderBy("p_brand")
    }),

    // TPC-H Q12 (shipmode priority classification) adapted: lineitem
    // has no l_shipmode → classify by l_returnflag instead. The shape
    // is the point: fact⋈fact join with the date filter pushed to the
    // lineitem scan, conditional aggregation splitting order priorities
    // into critical/non-critical counts. One shuffle per fact, 3-row
    // result.
    "q_tpch_q12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q13 (customer order-count distribution): the left-outer
    // join that keeps zero-order customers, then the count-of-counts
    // histogram. Two aggregate shuffles (custkey, then c_count); both
    // partial+final. The orders-side filter excludes urgent orders the
    // way Q13's comment NOT LIKE does.
    "q_tpch_q13" -> ((s, dir) => {
      t(s, dir, "customer").select("c_custkey")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 (promotion effect): conditional aggregation ratio over
    // a one-month lineitem window joined to the part dimension
    // (broadcast). Both money sums are exact decimal; the percentage is
    // one double division of the two exact d4 values — bit-identical
    // cross-engine (SURVEY.md A.8 recipe).
    "q_tpch_q14" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
        .join(dim(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          d4(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(Dec))))
            .as("promo_rev"),
          d4(sum(rev)).as("total_rev"))
        .withColumn("promo_pct",
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 6))
    }),

    // TPC-H Q17 (small-quantity-order revenue): the correlated
    // avg-quantity subquery, decorrelated the way every engine executes
    // it — aggregate per partkey, join back. The brand filter lands
    // FIRST (broadcast semi via the filtered part dim), so the
    // per-partkey average aggregates only the brand's lineitems — same
    // rows per surviving partkey, ~50× less aggregated. l_quantity is
    // integral, so sum/count in double is exact and order-independent;
    // the 0.2× threshold compare is then bit-identical cross-engine.
    "q_tpch_q17" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      val li = t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val avgq = li.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(avgq, col("l_partkey") === col("pk") &&
          col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(count(lit(1)).as("n_lines"),
          d4(sum(D(col("l_extendedprice")))).as("total_ext"))
        .withColumn("avg_yearly", round(col("total_ext") / 7.0, 4))
    }),

    // TPC-H Q21 (suppliers who kept orders waiting) adapted: no
    // commit/receipt dates → "late" = shipped more than 90 days after
    // the order date. The EXISTS (another supplier in the order) and
    // NOT EXISTS (another LATE supplier) pair becomes ONE per-order
    // aggregate — distinct-supplier and distinct-late-supplier counts —
    // the aggregate-decorrelation that turns two correlated fact⋈fact
    // subqueries into a single shuffle of the order's lines. min(late
    // supplier) is THE late supplier when the distinct-late count is 1.
    "q_tpch_q21" -> ((s, dir) => {
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS")
      // size(collect_set) instead of two countDistincts: the double
      // distinct plans as an Expand that triples every joined lineitem
      // row before the aggregate shuffle; collect_set keeps ONE copy of
      // each row through a single partial+final aggregate, and the sets
      // are tiny by construction (suppliers per order ≈ lines per
      // order ≈ 4). Measured at sf0.1, median-of-3 in one session:
      // 2.42 s (Expand) → 1.59 s (collect_set) — the Expand
      // formulation's tripled shuffle volume was the tail.
      val perOrder = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(size(collect_set(col("l_suppkey"))).as("n_supp"),
          size(collect_set(when(late, col("l_suppkey")))).as("n_late"),
          min(when(late, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
      perOrder
        .join(dim(s, dir, "supplier")
          .join(t(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_3")
          .select("s_suppkey", "s_name"),
          col("late_supp") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    }),

    // TPC-H Q22 (global sales opportunity) adapted: customer "country
    // code" = last digit of c_name. Three classic pieces: the scalar
    // AVG subquery (exact-decimal sum ÷ count → one double division,
    // broadcast as a 1-row frame), the anti join against orders
    // (customers with no URGENT orders — this fixture's order stream
    // covers every custkey, so Q22's literal "no orders at all" is
    // vacuously empty; the urgent-order restriction keeps the
    // anti-join shape AND a non-degenerate result at every SF), and
    // the per-code rollup.
    "q_tpch_q22" -> ((s, dir) => {
      val codes = Seq("1", "3", "5", "7", "9")
      val cust = t(s, dir, "customer")
        .withColumn("code", expr("right(c_name, 1)"))
        .filter(col("code").isin(codes: _*))
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg(d4(sum(D(col("c_acctbal")))).as("s"), count(lit(1)).as("c"))
        .select((col("s") / col("c")).as("thr"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("code")
        .agg(count(lit(1)).as("numcust"),
          d4(sum(D(col("c_acctbal")))).as("totacctbal"))
        .orderBy("code")
    }),

    // TPC-H Q11 (important stock) adapted: no partsupp → revenue share
    // by part brand, keeping Q11's defining shape: a grouped aggregate
    // HAVING-compared against a fraction of the same aggregate's global
    // total. The global total rides an unpartitioned window over the
    // ~25-row aggregate output (tiny by construction), NOT a second
    // scan; the share predicate multiplies instead of divides
    // (brand_rev × 25 > total ⟺ share > 4%) so the compare stays in
    // exact decimal.
    "q_tpch_q11" -> ((s, dir) => {
      val rev = (D(col("l_extendedprice")) *
        (lit(1).cast(Dec) - D(col("l_discount")))).cast(Dec)
      val byBrand = t(s, dir, "lineitem")
        .join(dim(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(rev).as("brand_rev"))
      byBrand
        .withColumn("total_rev", sum(col("brand_rev")).over(Window.partitionBy()))
        .filter(col("brand_rev") * 25 > col("total_rev"))
        .select(col("p_brand"), d4(col("brand_rev")).as("brand_rev"),
          round(d4(col("brand_rev")) / d4(col("total_rev")), 6).as("share"))
        .orderBy(col("brand_rev").desc, col("p_brand"))
    }),

    // TPC-H Q6 (forecast revenue change): the canonical pushdown probe —
    // every predicate is a plain column comparison, so ALL of them reach
    // the parquet scan and the whole query is scan→partial-agg→1 row.
    // At 100 TB this is the query shape that must never shuffle anything
    // but one partial aggregate per partition.
    "q_tpch_q6" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(d4(sum((D(col("l_extendedprice")) * D(col("l_discount")))
          .cast(Dec))).as("revenue"))
    }),

    // TPC-H Q7 (volume shipping) adapted: supplier nations are sparse at
    // small SF, so the two-country filter becomes a two-REGION filter
    // (EUROPE↔ASIA in either direction; same OR-of-pairs shape). The
    // fact⋈fact join (lineitem⋈orders) shuffles on the order key once;
    // supplier/customer pre-shrink to the two regions via the broadcast
    // nation dim BEFORE touching the facts, so the fact join carries the
    // region filter as a semi-join-sized probe on both sides.
    "q_tpch_q7" -> ((s, dir) => {
      val n = broadcast(t(s, dir, "nation"))
      val supp = t(s, dir, "supplier")
        .join(n.select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation"),
            col("n_regionkey").as("s_rk")),
          col("s_nationkey") === col("s_nk"))
        .filter(col("s_rk").isin(2, 3))
        .select("s_suppkey", "supp_nation", "s_rk")
      val cust = t(s, dir, "customer")
        .join(n.select(col("n_nationkey").as("c_nk"),
            col("n_name").as("cust_nation"),
            col("n_regionkey").as("c_rk")),
          col("c_nationkey") === col("c_nk"))
        .filter(col("c_rk").isin(2, 3))
        .select("c_custkey", "cust_nation", "c_rk")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("s_rk") === 3 && col("c_rk") === 2) ||
          (col("s_rk") === 2 && col("c_rk") === 3))
        .withColumn("vol",
          (D(col("l_extendedprice")) * (D(lit(1)) - D(col("l_discount"))))
            .cast(Dec))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(d4(sum(col("vol"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): NATION_12's share of STANDARD-
    // part revenue sold to ASIA customers, by order year. One pass over
    // the filtered facts; the share is a conditional-sum / sum inside
    // the same aggregate — no second scan, no post-join. All dims hang
    // off the fact star; nation/region broadcast.
    "q_tpch_q8" -> ((s, dir) => {
      val n = broadcast(t(s, dir, "nation"))
      val asiaCust = t(s, dir, "customer")
        .join(n.select(col("n_nationkey").as("c_nk"),
            col("n_regionkey").as("c_rk")),
          col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, dir, "region"))
            .filter(col("r_name") === "ASIA"),
          col("c_rk") === col("r_regionkey"))
        .select("c_custkey")
      val suppN = t(s, dir, "supplier")
        .join(n.select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation")),
          col("s_nationkey") === col("s_nk"))
        .select("s_suppkey", "supp_nation")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "STANDARD")
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01")))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppN, col("l_suppkey") === col("s_suppkey"))
        .withColumn("vol",
          (D(col("l_extendedprice")) * (D(lit(1)) - D(col("l_discount"))))
            .cast(Dec))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_12", col("vol"))
            .otherwise(D(lit(0)))).cast(Dec).as("nv"),
          sum(col("vol")).cast(Dec).as("tv"))
        .select(col("o_year"), d4(col("nv")).as("nation_vol"),
          d4(col("tv")).as("total_vol"),
          round(d4(col("nv")) / d4(col("tv")), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 (product type profit) adapted: no partsupp/supplycost →
    // profit = revenue − p_retailprice·quantity (the part's list price
    // as the cost stand-in). The p_name LIKE filter prunes part before
    // it meets the fact; grouped by supplier nation × order year.
    "q_tpch_q9" -> ((s, dir) => {
      val n = broadcast(t(s, dir, "nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("%widget%"))
          .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(n.select(col("n_nationkey"), col("n_name").as("nation")),
          col("s_nationkey") === col("n_nationkey"))
        .withColumn("profit",
          (D(col("l_extendedprice")) * (D(lit(1)) - D(col("l_discount"))))
            .cast(Dec) -
            (D(col("p_retailprice")) * D(col("l_quantity"))).cast(Dec))
        .groupBy(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(d4(sum(col("profit"))).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q2 (min-cost supplier) adapted: no partsupp → a supplier's
    // cost for a part is its best observed unit price in lineitem
    // (min extendedprice/quantity). The correlated "= (SELECT MIN ...)"
    // rides a window-min over the per-(part,supplier) aggregate — the
    // window input is already one row per (part,supplier), never the
    // fact. EUROPE prunes suppliers via broadcast dims before the
    // aggregate output joins anything; part's size/type filter prunes
    // the final probe.
    "q_tpch_q2" -> ((s, dir) => {
      val n = broadcast(t(s, dir, "nation"))
      val euSupp = t(s, dir, "supplier")
        .join(n.select(col("n_nationkey").as("s_nk"), col("n_name"),
            col("n_regionkey").as("s_rk")),
          col("s_nationkey") === col("s_nk"))
        .join(broadcast(t(s, dir, "region"))
            .filter(col("r_name") === "EUROPE"),
          col("s_rk") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val ucost = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        .join(euSupp, col("l_suppkey") === col("s_suppkey"))
      val best = ucost.withColumn("best_cost",
        min(col("unit_cost")).over(Window.partitionBy(col("l_partkey"))))
      best.filter(col("unit_cost") === col("best_cost"))
        .join(t(s, dir, "part")
          .filter(col("p_size").between(10, 30) &&
            col("p_type") === "SMALL")
          .select("p_partkey", "p_name"),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q20 (part promotion) adapted: no partsupp/availqty → a
    // supplier qualifies when its 1997 shipped quantity of 'blue%'
    // parts exceeds 1.2× the average over qualifying suppliers (the
    // original's "availqty > ½ shipped" correlated-threshold shape,
    // with the threshold itself an aggregate). The threshold is ONE
    // row — cross-joined (broadcast) into the per-supplier aggregate,
    // then the supplier dim left-semi-joins the qualifiers.
    "q_tpch_q20" -> ((s, dir) => {
      val shipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(t(s, dir, "part").filter(col("p_name").like("blue%"))
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(D(col("l_quantity"))).cast(Dec).as("qty"))
      val thr = shipped.agg(
        (d4(sum(col("qty"))) / count(lit(1))).as("thr"))
      val qualifying = shipped.join(broadcast(thr))
        .filter(d4(col("qty")) > lit(1.2) * col("thr"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q19" ->
      """SELECT p_brand, COUNT(*) AS n_lines,
        | CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 50)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
        |                   WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) x
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q14" ->
      s"""SELECT promo_rev, total_rev,
        | ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct
        |FROM (SELECT
        | ${sqlD4("SUM(CASE WHEN p_type = 'PROMO' THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS promo_rev,
        | ${sqlD4("SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)))")} AS total_rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01') x""".stripMargin,

    "q_tpch_q17" ->
      s"""WITH li AS (
        |  SELECT l.* FROM lineitem l
        |  JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'),
        | a AS (
        |  SELECT l_partkey AS pk, SUM(l_quantity) / COUNT(*) AS avg_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT n_lines, total_ext, ROUND(total_ext / 7.0, 4) AS avg_yearly
        |FROM (SELECT COUNT(*) AS n_lines,
        |        ${sqlD4("SUM(CAST(l_extendedprice AS DECIMAL(18,4)))")} AS total_ext
        |      FROM li JOIN a ON l_partkey = pk
        |      WHERE l_quantity < 0.2 * avg_qty) x""".stripMargin,

    "q_tpch_q21" ->
      """WITH perorder AS (
        |  SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |                        THEN l_suppkey END) AS n_late,
        |    MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |             THEN l_suppkey END) AS late_supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM perorder
        |JOIN supplier ON late_supp = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_supp > 1 AND n_late = 1 AND n_name = 'NATION_3'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,

    "q_tpch_q22" ->
      s"""WITH cust AS (
        |  SELECT c_custkey, c_acctbal, right(c_name, 1) AS code
        |  FROM customer WHERE right(c_name, 1) IN ('1','3','5','7','9')),
        | thr AS (
        |  SELECT ${sqlD4("SUM(CAST(c_acctbal AS DECIMAL(18,4)))")} / COUNT(*) AS thr
        |  FROM cust WHERE c_acctbal > 0.0)
        |SELECT code, COUNT(*) AS numcust,
        | ${sqlD4("SUM(CAST(c_acctbal AS DECIMAL(18,4)))")} AS totacctbal
        |FROM cust, thr
        |WHERE c_acctbal > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY code
        |ORDER BY code""".stripMargin,

    "q_tpch_q11" ->
      s"""WITH bb AS (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS brand_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        | tt AS (SELECT bb.*, SUM(brand_rev) OVER () AS total_rev FROM bb)
        |SELECT p_brand,
        | CAST(CAST(brand_rev AS VARCHAR) AS DOUBLE) AS brand_rev,
        | ROUND(CAST(CAST(brand_rev AS VARCHAR) AS DOUBLE)
        |   / CAST(CAST(total_rev AS VARCHAR) AS DOUBLE), 6) AS share
        |FROM tt
        |WHERE brand_rev * 25 > total_rev
        |ORDER BY brand_rev DESC, p_brand""".stripMargin,

    "q_tpch_q6" ->
      s"""SELECT ${sqlD4("SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4)))")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT supp_nation, cust_nation, l_year,
        |  ${sqlD4("SUM(vol)")} AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |        CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vol
        |      FROM lineitem
        |      JOIN orders ON l_orderkey = o_orderkey
        |      JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01'
        |        AND ((n1.n_regionkey = 3 AND n2.n_regionkey = 2)
        |          OR (n1.n_regionkey = 2 AND n2.n_regionkey = 3))) x
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      s"""WITH vols AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |  ${sqlD4("SUM(CASE WHEN supp_nation = 'NATION_12' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END)")} AS nation_vol,
        |  ${sqlD4("SUM(vol)")} AS total_vol,
        |  ROUND(${sqlD4("SUM(CASE WHEN supp_nation = 'NATION_12' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END)")}
        |    / ${sqlD4("SUM(vol)")}, 6) AS mkt_share
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_tpch_q9" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  ${sqlD4("SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) - CAST(CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)))")} AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q2" ->
      """WITH ucost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT ucost.*, s_acctbal, s_name, n_name
        |  FROM ucost
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |best AS (SELECT *,
        |  MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost FROM eu)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        |FROM best JOIN part ON l_partkey = p_partkey
        |WHERE unit_cost = best_cost
        |  AND p_size BETWEEN 10 AND 30 AND p_type = 'SMALL'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q20" ->
      s"""WITH shipped AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'blue%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey),
        |thr AS (SELECT ${sqlD4("SUM(qty)")} / COUNT(*) AS thr FROM shipped)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM shipped, thr
        |              WHERE l_suppkey = s_suppkey
        |                AND CAST(CAST(qty AS VARCHAR) AS DOUBLE) > 1.2 * thr)
        |ORDER BY s_suppkey""".stripMargin
  )
}
