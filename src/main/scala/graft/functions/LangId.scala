package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (SURVEY.md §2.8 breadth:
  * "language-ID (n-gram heuristic)").
  *
  * Profile build: top-K character trigrams per language from a labeled
  * corpus, weighted by inverse rank (classic Cavnar–Trenkle shape).
  * Prediction: a doc's trigrams join the profile, weights sum per
  * (doc, lang), argmax wins (lang-name tiebreak for determinism).
  * Everything is joins + windows — no driver loops, scales with docs.
  */
object LangId {

  private def charTrigrams(textCol: String) = expr(
    s"transform(sequence(0, length($textCol) - 3), i -> substr($textCol, i + 1, 3))")

  /** (lang, gram, weight) profile from a labeled (textCol, langCol) df. */
  def buildProfiles(labeled: DataFrame, textCol: String, langCol: String,
      topK: Int = 300): DataFrame = {
    val grams = labeled
      .filter(length(col(textCol)) >= 3)
      .select(col(langCol).as("lang"),
        explode(charTrigrams(textCol)).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("freq").desc, col("gram"))
    grams.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("lang"), col("gram"),
        (lit(topK + 1) - col("rnk")).cast("double").as("weight"))
  }

  /** Predict one language per document: (idCol, pred_lang, score). */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame): DataFrame = {
    val docGrams = docs
      .filter(length(col(textCol)) >= 3)
      .select(col(idCol), explode(charTrigrams(textCol)).as("gram"))
    val scored = docGrams.join(profiles, "gram")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("weight")).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("lang"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col(idCol), col("lang").as("pred_lang"), col("score"))
  }
}
