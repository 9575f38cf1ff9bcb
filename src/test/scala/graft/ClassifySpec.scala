package graft

import org.apache.spark.sql.functions._

class ClassifySpec extends TestBase {
  import spark.implicits._

  /** Clearly separable two-class corpus: class A speaks {apple banana
   * cherry}, class B {wrench hammer pliers}; enough rows that both
   * sides of the md5 75/25 split are populated. */
  private def fruitToolDocs = {
    val a = (0 until 40).map(i => (i.toLong, s"apple banana cherry apple banana x$i", "fruit"))
    val b = (40 until 80).map(i => (i.toLong, s"wrench hammer pliers wrench hammer y$i", "tool"))
    (a ++ b).toDF("doc_id", "text", "label")
  }

  test("separable classes predict perfectly on the held-out split") {
    val docs = fruitToolDocs
    val pred = pipeline.Classify.naiveBayesTrainPredict(
      docs, "doc_id", "text", "label", trainFraction = 0.75, seed = 42L)
    val joined = pred.join(docs.select(col("doc_id"), col("label")), "doc_id")
    val n = joined.count()
    assert(n > 0 && n < 80, s"split produced $n test rows") // both splits populated
    assert(joined.filter(col("predicted") =!= col("label")).count() == 0)
  }

  test("result is deterministic and partitioning-invariant (exact Long scores)") {
    val docs = fruitToolDocs
    val r1 = pipeline.Classify.naiveBayesTrainPredict(docs, "doc_id", "text", "label")
      .as[(Long, String, Long)].collect().toSet
    val r2 = pipeline.Classify.naiveBayesTrainPredict(docs.repartition(13), "doc_id", "text", "label")
      .as[(Long, String, Long)].collect().toSet
    assert(r1 == r2)
  }

  test("score equals the hand-computed fixed-point log-posterior") {
    // force a known split: ids chosen so the md5 draw puts doc 1 in train
    // would be brittle — instead verify one doc's score against a replay
    // of the exact formula over the ACTUAL split the operator used
    val docs = fruitToolDocs
    val threshold = math.round(0.75 * 65536.0).toInt
    val drawn = conv(substring(md5(concat_ws("|", lit(42L), col("doc_id").cast("string"))), 1, 4), 16, 10).cast("int")
    val train = docs.filter(drawn < threshold)
      .select("doc_id", "text", "label").as[(Long, String, String)].collect()
    val test = docs.filter(!(drawn < threshold))
      .select("doc_id", "text").as[(Long, String)].collect()
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val tc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    train.foreach { case (_, t, c) => toks(t).foreach(w => tc((w, c)) = tc.getOrElse((w, c), 0L) + 1) }
    val classes = train.map(_._3).distinct.sorted
    val tot = classes.map(c => c -> tc.collect { case ((_, cc), n) if cc == c => n }.sum).toMap
    val vocab = tc.keys.map(_._1).toSet.size
    val nd = train.length
    def fp(x: Double) = BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val priors = classes.map(c => c -> fp(math.log(train.count(_._3 == c).toDouble / nd))).toMap
    def like(w: String, c: String) =
      fp(math.log((tc.getOrElse((w, c), 0L) + 1).toDouble / (tot(c) + vocab).toDouble))
    val expected = test.map { case (d, t) =>
      // max score wins, ties to the smallest class label
      val top = classes.map(c => (c, priors(c) + toks(t).map(w => like(w, c)).sum))
      val m = top.map(_._2).max
      val win = top.filter(_._2 == m).map(_._1).min
      (d, win, m)
    }.toSet
    val got = pipeline.Classify.naiveBayesTrainPredict(docs, "doc_id", "text", "label")
      .as[(Long, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("empty-text test docs fall back to the prior argmax") {
    val docs = (0 until 30).map(i => (i.toLong, if (i % 5 == 0) "" else "alpha beta", "big")) ++
      (30 until 36).map(i => (i.toLong, "gamma delta", "small"))
    val pred = pipeline.Classify.naiveBayesTrainPredict(
      docs.toDF("doc_id", "text", "label"), "doc_id", "text", "label")
    // every test doc gets exactly one prediction, empties included
    val ids = pred.select("doc_id").as[Long].collect()
    assert(ids.length == ids.distinct.length && ids.nonEmpty)
    val empties = pred.filter(col("doc_id").isin((0 until 30 by 5).map(_.toLong): _*))
    // prior favors "big" (majority class) for token-free docs
    assert(empties.filter(col("predicted") =!= "big").count() == 0)
  }
}
