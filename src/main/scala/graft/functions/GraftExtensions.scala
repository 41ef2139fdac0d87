package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT array_dot_f(a,
  * b)")` and `expr("array_dot_f(...)")` work in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the standard injection surface for extension libraries —
  * the same hook used for custom rules/strategies if the engine ever
  * needs whole-operator plan nodes (SURVEY.md §4.3 keeps that in the
  * toolbox; v1 needs only function registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot_f"),
      new ExpressionInfo(classOf[ArrayDotProductF].getName, null, "array_dot_f"),
      (children: Seq[Expression]) =>
        ArrayDotProductF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeNfc].getName, null, "nfc_normalize"),
      (children: Seq[Expression]) => NormalizeNfc(children(0))))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // own runtime-filter rewrite (InjectRuntimeFilter) but does not
    // register them as SQL functions; exposing them makes the
    // bloom-prefilter pattern (build a bits-sized sketch of a huge key
    // set, pre-filter the probe side, exact-verify the survivors)
    // writable as a plain query — the 100 TB alternative to
    // broadcasting the key set itself. might_contain requires its
    // bloom argument to be a scalar subquery or literal by its own
    // input check, which is exactly the shape the pattern wants.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        null, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        null, "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    // optimizer tier: the portable HOF dot-product idiom lowers to the
    // codegen'd native expression (see RewriteHofDotProduct's Scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
