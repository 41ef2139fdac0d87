package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables
import graft.plans.AsOf

/** The custom as-of join operator (LogicalPlan + Strategy + merge-join
  * exec): known-answer cases, equivalence with the equi-join + window
  * formulation on real data, and the plan shape (one exchange + sort
  * per side, no candidate-pair blowup).
  */
class PlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf
  import spark.implicits._

  test("as-of join: hand-built known answers incl. no-match keys") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 10L, "l3"),
      (3L, 5L, "l4")).toDF("k", "t", "ltag")
    val right = Seq((1L, 5L, "a"), (1L, 15L, "b"), (2L, 50L, "c"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(left, right, col("k"), col("t"), col("rk"), col("rt"))
      .select("ltag", "rtag").as[(String, Option[String])].collect().toMap
    assert(got == Map("l1" -> Some("a"), "l2" -> Some("b"),
      "l3" -> None, "l4" -> None))
  }

  test("as-of join: equals the equi-join + window formulation on real data") {
    // deterministic pseudo-random (key, ts) drawn from real tables
    val left = Tables.t(spark, sf, "orders").select(
      col("o_orderkey"),
      pmod(col("o_custkey"), lit(50)).as("k"),
      pmod(xxhash64(col("o_orderkey")), lit(100000)).as("t"))
    val right = Tables.events(spark, sf).select(
      col("event_id"),
      pmod(col("user_id"), lit(50)).as("rk"),
      pmod(xxhash64(col("event_id")), lit(100000)).as("rt"))
    val got = AsOf.join(left, right, col("k"), col("t"), col("rk"), col("rt"))
      .select(col("o_orderkey"), col("rt"))
    // oracle formulation: max matching ts per left row (ts ties collapse
    // to the same max value, so comparing ts is tie-robust)
    val expected = left.join(right,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .groupBy("o_orderkey").agg(max(col("rt")).as("rt"))
    assert(got.count() == left.count(), "left outer: one row per left row")
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "as-of exec must equal the window/agg formulation")
  }

  test("as-of join plan: merge exec with clustered exchanges, no BNLJ") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L)).toDF("rk", "rt")
    val df = AsOf.join(left, right, col("k"), col("t"), col("rk"), col("rt"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // exec prints with Exec suffix stripped
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("optimizer rule lowers the HOF dot-product idiom to the native expression") {
    val emb = Tables.t(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val hof = emb.select(col("vec_id"), expr(
      "aggregate(zip_with(embedding, embedding, " +
        "(x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("dot"))
    val opt = hof.queryExecution.optimizedPlan.toString
    assert(opt.contains("array_dot_f"),
      s"rule did not fire; optimized plan:\n$opt")
    // rewritten result must equal the native-API result bit-for-bit
    // (both fold double products in array order)
    val native = emb.select(col("vec_id"),
      graft.functions.Native.dotF(col("embedding"), col("embedding")).as("dot"))
    assert(hof.orderBy("vec_id").collect().toSeq ==
      native.orderBy("vec_id").collect().toSeq)
    // the conservative guard: a bare float multiply (different rounding)
    // must NOT be rewritten
    val floatMul = emb.select(expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> x * y), " +
        "cast(0 as double), (acc, v) -> acc + cast(v as double))"))
    assert(!floatMul.queryExecution.optimizedPlan.toString
      .contains("array_dot_f"))
  }

  test("HOF rewrite preserves NULL semantics on ragged / null-element arrays") {
    // the un-rewritten fold returns NULL when zip_with pads a length
    // mismatch (NULL products poison acc + v) or any element is NULL;
    // the injected rule must not change those answers
    // through parquet, not a LocalRelation — ConvertToLocalRelation
    // would otherwise evaluate the fold in the main optimizer batch
    // before the injected rule ever sees it
    val dir = s"/tmp/graft_${spark.sparkContext.applicationId}_ragged"
    Seq(
      (1L, Some(Seq[Option[Float]](Some(1.0f), Some(2.0f))),
        Some(Seq[Option[Float]](Some(3.0f), Some(4.0f)))),      // dense
      (2L, Some(Seq[Option[Float]](Some(1.0f), Some(2.0f))),
        Some(Seq[Option[Float]](Some(3.0f)))),                  // ragged
      (3L, Some(Seq[Option[Float]](Some(1.0f), None)),
        Some(Seq[Option[Float]](Some(3.0f), Some(4.0f)))),      // null elem
      (4L, None, Some(Seq[Option[Float]](Some(1.0f))))          // null array
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val hof = df.select(col("id"), expr(
      "aggregate(zip_with(a, b, " +
        "(x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("dot"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("array_dot_f"),
      "rule must fire on nullable-element arrays for this test to bite")
    val got = hof.orderBy("id").as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq(1L -> Some(11.0), 2L -> None, 3L -> None, 4L -> None),
      s"rewritten fold diverged from HOF NULL semantics: $got")
    // interpreted eval path must agree with the codegen path above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = true)
    def lit(xs: Seq[java.lang.Float]) = Literal.create(xs, at)
    import graft.functions.ArrayDotProductF
    assert(ArrayDotProductF(lit(Seq(1.0f, 2.0f)), lit(Seq(3.0f, 4.0f)))
      .eval() == 11.0)
    assert(ArrayDotProductF(lit(Seq(1.0f, 2.0f)), lit(Seq(3.0f)))
      .eval() == null, "ragged → NULL in interpreted eval")
    assert(ArrayDotProductF(lit(Seq(1.0f, null)), lit(Seq(3.0f, 4.0f)))
      .eval() == null, "null element → NULL in interpreted eval")
  }
}
