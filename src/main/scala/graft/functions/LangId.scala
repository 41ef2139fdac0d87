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

  /** Explode a doc into one row per character-trigram position. The int
    * position sequence explodes FIRST and substr runs on the exploded
    * rows — building the 3-char-string array per doc row before the
    * explode is ~8× slower (measured at sf0.1: per-row array of ~300
    * small strings vs a primitive int sequence).
    */
  private def triGramRows(df: DataFrame, keep: Seq[String],
      textCol: String): DataFrame =
    df.filter(length(col(textCol)) >= 3)
      .select(keep.map(col) :+ col(textCol).as("__t") :+
        explode(expr(s"sequence(1, length($textCol) - 2)")).as("__p"): _*)
      .select(keep.map(col) :+ expr("substr(__t, __p, 3)").as("gram"): _*)

  /** Per-key gram occurrence counts: keep :+ (gram, gcnt). One explode
    * pass + one shuffle; every downstream stage (profile build AND
    * scoring) runs over this much smaller frame instead of re-exploding
    * the corpus. The tiny shared vocabulary makes distinct grams per doc
    * ~10× fewer than gram positions.
    */
  def gramCounts(df: DataFrame, keep: Seq[String],
      textCol: String): DataFrame =
    triGramRows(df, keep, textCol)
      .groupBy((keep :+ "gram").map(col): _*)
      .agg(count(lit(1)).as("gcnt"))

  /** (lang, gram, weight) profile from (lang, gram, gcnt) counts. */
  def profilesFromCounts(cnts: DataFrame, topK: Int = 300): DataFrame = {
    val grams = cnts.groupBy("lang", "gram").agg(sum(col("gcnt")).as("freq"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("freq").desc, col("gram"))
    grams.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("lang"), col("gram"),
        (lit(topK + 1) - col("rnk")).cast("double").as("weight"))
  }

  /** (lang, gram, weight) profile from a labeled (textCol, langCol) df. */
  def buildProfiles(labeled: DataFrame, textCol: String, langCol: String,
      topK: Int = 300): DataFrame =
    profilesFromCounts(
      gramCounts(labeled.select(col(langCol).as("lang"), col(textCol)),
        Seq("lang"), textCol), topK)

  /** Predict one language per document: (idCol, pred_lang, score).
    *
    * The profile pivots to one broadcast row per gram carrying every
    * language's weight, so scoring is a 1:1 map-side hash join into a
    * one-group-per-doc aggregate with #langs sum columns — no ×#langs
    * row blowup, no shuffle proportional to the gram count (measured
    * ~2× faster than the (doc, lang)-keyed formulation at sf0.1).
    * Argmax ties break toward the lexicographically smallest language
    * (greatest() over (score, inverse-lang-index) structs — identical
    * to a row_number over (score DESC, lang)). The language list is
    * collected from the profile — #langs driver-side values, dimension
    * metadata on the same footing as a broadcast.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, langsHint: Seq[String] = Nil): DataFrame = {
    // langsHint avoids materializing the whole profile pipeline just to
    // list its languages — derive it from a cheap column-pruned distinct
    // on the raw labeled table when you have one.
    val langs: Seq[String] =
      if (langsHint.nonEmpty) langsHint.sorted
      else profiles.select("lang").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    val wide = profiles.groupBy("gram")
      .pivot("lang", langs).agg(first(col("weight")))
    // Occurrence-level scoring on purpose: the broadcast join feeds the
    // per-doc aggregate directly with NO shuffle of the exploded rows —
    // pre-counting grams per doc adds a 5M-row exchange that costs more
    // than the second explode saves (measured at sf0.1: 2.6s → 4.1s).
    val docGrams = triGramRows(docs.select(col(idCol), col(textCol)),
      Seq(idCol), textCol)
    val sums = docGrams.join(broadcast(wide), "gram")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col(langs.head), lit(0.0))).as("s_0"),
        langs.tail.zipWithIndex.map { case (l, i) =>
          sum(coalesce(col(l), lit(0.0))).as(s"s_${i + 1}")
        }: _*)
    val best = greatest(langs.indices.map(i =>
      struct(col(s"s_$i").as("score"),
        lit(langs.length - i).as("inv"))): _*)
    val predLang = langs.indices.foldLeft(lit(null).cast("string")) {
      case (acc, i) => when(best.getField("inv") === (langs.length - i),
        lit(langs(i))).otherwise(acc)
    }
    sums.select(col(idCol), predLang.as("pred_lang"),
      best.getField("score").as("score"))
  }

  /** Per-doc weight sums from (idCol, gram, gcnt) counts: Σ gcnt·weight
    * equals the occurrence-level Σ weight exactly (integral weights and
    * counts — every product and partial sum is an exact double).
    */
  private[graft] def scoreCounts(cnts: DataFrame, idCol: String,
      wide: DataFrame, langs: Seq[String]): DataFrame =
    cnts.join(broadcast(wide), "gram")
      .groupBy(col(idCol))
      .agg(
        sum(col("gcnt") * coalesce(col(langs.head), lit(0.0))).as("s_0"),
        langs.tail.zipWithIndex.map { case (l, i) =>
          sum(col("gcnt") * coalesce(col(l), lit(0.0))).as(s"s_${i + 1}")
        }: _*)

  /** [[predict]] over precomputed (idCol, gram, gcnt) counts — lets a
    * caller that also built the profiles from the same corpus share ONE
    * gram-count pass for both stages.
    */
  def predictFromCounts(cnts: DataFrame, idCol: String,
      profiles: DataFrame, langsHint: Seq[String] = Nil): DataFrame = {
    val langs: Seq[String] =
      if (langsHint.nonEmpty) langsHint.sorted
      else profiles.select("lang").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    val wide = profiles.groupBy("gram")
      .pivot("lang", langs).agg(first(col("weight")))
    val sums = scoreCounts(cnts, idCol, wide, langs)
    val best = greatest(langs.indices.map(i =>
      struct(col(s"s_$i").as("score"),
        lit(langs.length - i).as("inv"))): _*)
    val predLang = langs.indices.foldLeft(lit(null).cast("string")) {
      case (acc, i) => when(best.getField("inv") === (langs.length - i),
        lit(langs(i))).otherwise(acc)
    }
    sums.select(col(idCol), predLang.as("pred_lang"),
      best.getField("score").as("score"))
  }

  /** [[predict]] with the profile broadcast as a plain hash map and the
    * scoring done in ONE map-side pass over each document's characters —
    * no per-occurrence row explode, no join, no shuffle at all. The
    * profile is topK × #langs rows of bounded dimension metadata (the
    * same footing as a broadcast join's build side), so collecting it is
    * scale-safe; the corpus side streams partition-by-partition.
    * Scores and tiebreaks are bit-identical to [[predict]]: integral
    * weights summed in long (exact), argmax breaking ties toward the
    * lexicographically smallest language. Docs matching no profile gram
    * drop out, exactly like the inner gram join.
    */
  def predictBroadcast(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, langsHint: Seq[String] = Nil): DataFrame =
    predictWithModel(docs, idCol, textCol,
      collectProfile(profiles, langsHint))

  /** Materialize the (gram → per-lang weight) hash map + sorted language
    * list from a profile frame — the trained MODEL ARTIFACT a long-lived
    * pipeline builds once and reuses across every scoring run (topK ×
    * #langs rows of bounded dimension metadata, same footing as a
    * broadcast join's build side).
    */
  def collectProfile(profiles: DataFrame, langsHint: Seq[String] = Nil)
      : (java.util.HashMap[String, Array[Long]], Array[String]) = {
    val langs: Seq[String] =
      (if (langsHint.nonEmpty) langsHint
       else profiles.select("lang").distinct()
         .collect().map(_.getString(0)).toSeq).sorted
    val idx = langs.zipWithIndex.toMap
    val m = new java.util.HashMap[String, Array[Long]]()
    profiles.select("gram", "lang", "weight").collect().foreach { r =>
      val arr = m.computeIfAbsent(r.getString(0),
        _ => new Array[Long](langs.length))
      arr(idx(r.getString(1))) = r.getDouble(2).toLong
    }
    (m, langs.toArray)
  }

  /** Scoring pass against a pre-collected model (see [[collectProfile]]).
    */
  def predictWithModel(docs: DataFrame, idCol: String, textCol: String,
      model: (java.util.HashMap[String, Array[Long]], Array[String]))
      : DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val (grams, ls) = bc.value
        it.flatMap { case (id, text) =>
          val scores = new Array[Long](ls.length)
          var matched = false
          var i = 0
          while (i + 3 <= text.length) {
            val w = grams.get(text.substring(i, i + 3))
            if (w != null) {
              matched = true
              var j = 0
              while (j < ls.length) { scores(j) += w(j); j += 1 }
            }
            i += 1
          }
          if (!matched) Iterator.empty
          else {
            var bi = 0
            var j = 1
            while (j < ls.length) { if (scores(j) > scores(bi)) bi = j; j += 1 }
            Iterator.single((id, ls(bi), scores(bi).toDouble))
          }
        }
      }.toDF(idCol, "pred_lang", "score")
  }
}
