package graft

import org.apache.spark.sql.functions._

class Hash2VecSpec extends TestBase {
  import spark.implicits._
  import embeddings.Hash2Vec

  /** Independent replica of the md5-mode lane/sign derivation. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def lane(w: String, dim: Int, seed: Long): Int =
    Integer.parseInt(md5hex(s"i|$w|$seed").substring(0, 4), 16) % dim
  private def sign(w: String, seed: Long): Double =
    if (Integer.parseInt(md5hex(s"s|$w|$seed").substring(0, 1), 16) % 2 == 0) 1.0 else -1.0

  /** Plain-Scala Hash2Vec over sequences (unnormalized). */
  private def replica(seqs: Seq[Seq[String]], dim: Int, c: Int,
      weights: Int => Double, seed: Long): Map[String, Array[Double]] = {
    val acc = scala.collection.mutable.Map.empty[String, Array[Double]]
    for (seq <- seqs; i <- seq.indices) {
      val v = acc.getOrElseUpdate(seq(i), Array.fill(dim)(0.0))
      for (j <- math.max(0, i - c) to math.min(seq.length - 1, i + c); if j != i) {
        val w = seq(j)
        v(lane(w, dim, seed)) += sign(w, seed) * weights(math.abs(i - j))
      }
    }
    acc.toMap
  }

  test("hash2vec md5 mode matches an independent replica (constant decay)") {
    val seqs = Seq(
      Seq("a", "b", "a", "c"),
      Seq("b", "c"),
      Seq("d")) // lone element: zero vector
    val df = seqs.map(Tuple1(_)).toDF("seq")
    val out = Hash2Vec.embedSequences(df, "seq", dim = 8, contextSize = 2,
        decay = "constant", doNorm = false, hashMode = "md5", seed = 7L)
      .as[(String, Seq[Double])].collect().toMap
    val exp = replica(seqs, 8, 2, _ => 1.0, 7L)
    assert(out.keySet == exp.keySet)
    for ((k, v) <- exp; i <- 0 until 8)
      assert(math.abs(out(k)(i) - v(i)) < 1e-12, s"element $k lane $i")
    assert(out("d").forall(_ == 0.0), "context-free element must get a zero vector")
  }

  test("hash2vec gaussian decay and safe norm") {
    val seqs = Seq(Seq("x", "y", "z", "x", "y"))
    val df = seqs.map(Tuple1(_)).toDF("seq")
    val dim = 16
    val sigma = 1.5
    val out = Hash2Vec.embedSequences(df, "seq", dim = dim, contextSize = 3,
        decay = "gaussian", gaussianSigma = sigma, doNorm = true, safeNorm = true,
        hashMode = "md5", seed = 42L)
      .as[(String, Seq[Double])].collect().toMap
    val exp = replica(seqs, dim, 3, d => math.exp(-(d * d) / (sigma * sigma)), 42L)
    for ((k, raw) <- exp) {
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      val v = out(k)
      assert(v.length == dim + 1, "safe norm appends the magnitude channel")
      for (i <- 0 until dim)
        assert(math.abs(v(i) - raw(i) / nrm) < 1e-9, s"$k lane $i")
      assert(math.abs(v(dim) - math.log(nrm + 1) / math.sqrt(dim)) < 1e-9,
        s"$k magnitude channel")
      assert(math.abs(math.sqrt(v.take(dim).map(x => x * x).sum) - 1.0) < 1e-9,
        s"$k unit L2 norm")
    }
  }

  test("hash2vec xxhash64 mode is deterministic and hashMode-shaped") {
    val df = Seq(Tuple1(Seq("p", "q", "r", "p"))).toDF("seq")
    val a = Hash2Vec.embedSequences(df, "seq", dim = 8, contextSize = 2, doNorm = false)
      .as[(String, Seq[Double])].collect().toMap
    val b = Hash2Vec.embedSequences(df, "seq", dim = 8, contextSize = 2, doNorm = false)
      .as[(String, Seq[Double])].collect().toMap
    assert(a == b, "re-running must give identical vectors")
    assert(a.keySet == Set("p", "q", "r"))
    assert(a("q").exists(_ != 0.0))
  }

  test("hash2vec forGraph embeds every walked vertex") {
    val g = twoBlobs(3)
    val emb = Hash2Vec.forGraph(g, dim = 8, contextSize = 2, walkLength = 4,
      walksPerVertex = 2, hashMode = "md5")
    val rows = emb.as[(String, Seq[Double])].collect()
    assert(rows.length == g.vertices.count(), "one vector per vertex (all walked)")
    assert(rows.forall(_._2.length == 9)) // dim + safe-norm channel
  }
}
