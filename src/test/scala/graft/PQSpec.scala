package graft

import org.apache.spark.sql.functions._

/** Product-quantization ANN ([[pipeline.Similarity.pqCodes]] /
 * [[pipeline.Similarity.ivfPqTopK]]). */
class PQSpec extends TestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqCodes: m codes per vector, each within [0, ksub), deterministic") {
    val codes = pipeline.Similarity.pqCodes(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .as[(Long, Seq[Int])].collect()
    assert(codes.length == emb.count())
    codes.foreach { case (_, c) =>
      assert(c.length == 8)
      assert(c.forall(x => x >= 0 && x < 16))
    }
    val again = pipeline.Similarity.pqCodes(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .as[(Long, Seq[Int])].collect()
    assert(codes.toMap == again.toMap)
  }

  test("pqCodes: identical vectors get identical codes") {
    val v = emb.limit(4).select(col("vec_id"), col("embedding"))
    val dup = v.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val all = v.unionByName(dup)
    val m = pipeline.Similarity.pqCodes(all, "vec_id", "embedding", m = 4, ksub = 8)
      .as[(Long, Seq[Int])].collect().toMap
    (0 until 4).foreach { i =>
      assert(m(i.toLong) == m(i.toLong + 1000), s"dup of vec $i coded differently")
    }
  }

  test("ivfPqTopK: valid ranked output, deterministic") {
    val out = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, m = 8, ksub = 16)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_._2 != q))
    }
    val again = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, m = 8, ksub = 16).as[(Long, Long, Int)].collect()
    assert(out.toSet == again.toSet)
  }

  test("ivfPqTopK: an exact duplicate is the rank-1 neighbor (ADC distance 0)") {
    val base = emb.limit(40)
    val dup = emb.filter(col("vec_id") === 7).select(
      lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val all = base.unionByName(dup)
    val out = pipeline.Similarity.ivfPqTopK(all, "vec_id", "embedding", k = 1,
      nlist = 4, nprobe = 2, m = 8, ksub = 8,
      queryFilter = col("vec_id") === 9999L)
      .as[(Long, Long, Int)].collect()
    // identical vector -> same cell, all subspace codes equal, ADC = 0 -> rank 1
    assert(out.toSeq == Seq((9999L, 7L, 1)))
  }

  test("ivfPqTopK: refine shortlist re-rank lifts recall against the exact top-k") {
    val exact = pipeline.Similarity.topK(emb, "vec_id", "embedding", k = 3)
    // ADC-only ranking can't resolve within-cluster fine ordering at these
    // codebook sizes (measured ~0.15 here); the FAISS-style refine step
    // re-ranks the 20-candidate ADC shortlist by exact cosine (measured 0.40,
    // capped at ~0.65 by nlist=4/nprobe=2 cell misses).
    val approx = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 4, nprobe = 2, m = 8, ksub = 32, refine = 20)
    val rec = pipeline.Similarity.recallAtK(approx, exact)
      .agg(avg("recall")).head().getDouble(0)
    assert(rec > 0.3, s"IVF-PQ(refine=20) mean recall@3 unexpectedly low: $rec")
  }

  test("ivfPqTopK: refine covering the whole candidate set equals exact IVF") {
    // with the shortlist as large as the corpus, the exact-cosine re-rank
    // sees every probed-cell candidate -> identical to ivfTopK on the same
    // (nlist, nprobe): PQ only orders the shortlist it hands to refine
    val viaPq = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 4, nprobe = 2, m = 8, ksub = 16, refine = 100000)
      .as[(Long, Long, Int)].collect().toSet
    val viaIvf = pipeline.Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 4, nprobe = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaPq == viaIvf)
  }

  test("queryFilter restricts the query side but not the index") {
    val out = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 2,
      nlist = 4, nprobe = 2, m = 8, ksub = 16, queryFilter = col("vec_id") < 5)
      .as[(Long, Long, Int)].collect()
    assert(out.map(_._1).distinct.forall(_ < 5))
    // neighbors may come from the full corpus
    assert(out.map(_._2).exists(_ >= 5))
  }

  test("indexed search over a persisted model+index equals inline ivfPqTopK") {
    val model = pipeline.Similarity.ivfPqModel(emb, "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 16)
    val index = pipeline.Similarity.ivfPqIndex(emb, "vec_id", "embedding", model)
    // persistence roundtrip: the steady-state contract is parquet in/out
    val tmp = java.nio.file.Files.createTempDirectory("pqidx").toString
    model.write.mode("overwrite").parquet(s"$tmp/model")
    index.write.mode("overwrite").parquet(s"$tmp/index")
    val m2 = spark.read.parquet(s"$tmp/model")
    val i2 = spark.read.parquet(s"$tmp/index")
    val indexed = pipeline.Similarity.ivfPqSearchIndexed(emb, "vec_id", "embedding",
      m2, i2, k = 3, nprobe = 3, refineWith = Some(emb), refine = 10)
      .as[(Long, Long, Int)].collect().toSet
    val inline = pipeline.Similarity.ivfPqTopK(emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, m = 8, ksub = 16, refine = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(indexed == inline)
  }

  test("ivfPqIndexAppend: append equals from-scratch; re-ingestion is idempotent") {
    val model = pipeline.Similarity.ivfPqModel(emb, "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 16)
    val corpus = emb.filter(col("vec_id") < 420)
    val batch = emb.filter(col("vec_id") >= 400) // 400..419 re-ingested
    val appended = pipeline.Similarity.ivfPqIndexAppend(batch, "vec_id",
      "embedding", model, pipeline.Similarity.ivfPqIndex(corpus, "vec_id", "embedding", model))
      .as[(Long, Long, Seq[Int])].collect()
    val scratch = pipeline.Similarity.ivfPqIndex(emb, "vec_id", "embedding", model)
      .as[(Long, Long, Seq[Int])].collect()
    // exactly one row per id (the overlap deduped), identical to a rebuild
    assert(appended.map(_._1).distinct.length == appended.length)
    assert(appended.toSet == scratch.toSet)
    // appending the same batch again changes nothing
    val again = pipeline.Similarity.ivfPqIndexAppend(batch, "vec_id", "embedding",
      model, spark.createDataFrame(spark.sparkContext.parallelize(
        appended.toSeq.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3))),
        pipeline.Similarity.ivfPqIndex(emb, "vec_id", "embedding", model).schema))
      .as[(Long, Long, Seq[Int])].collect()
    assert(again.toSet == scratch.toSet)
    // a dim-drifted batch fails loudly instead of coding nulls
    val drifted = batch.select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
    val err = intercept[Exception] {
      pipeline.Similarity.ivfPqIndexAppend(drifted, "vec_id", "embedding",
        model, pipeline.Similarity.ivfPqIndex(corpus, "vec_id", "embedding", model)).collect()
    }
    assert(err.getMessage.contains("model dim"))
  }

  test("AdcDistance kernel: matches the HOF formulation, interp == codegen") {
    import graft.expressions.AdcDistance.adcDistance
    val df = Seq(
      (Seq(0, 2, 1), Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), Seq(7.0, 8.0, 9.0))),
      (Seq(2, 0, 0), Seq(Seq(0.5, 0.0, 1.5), Seq(2.5, 9.0, 9.0), Seq(3.5, 9.0, 9.0))))
      .toDF("codes", "qtab")
    val hof = aggregate(zip_with(col("codes"), col("qtab"),
      (c, t) => element_at(t, c + lit(1))), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(adcDistance(col("codes"), col("qtab")).as("native"),
      hof.as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h) }
    assert(rows.map(_._1).toSeq == Seq(1.0 + 6.0 + 8.0, 1.5 + 2.5 + 3.5))
    // interpreted kernel agrees with the executed (codegen) path
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0, 2, 1))
    val t = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0, 5.0, 6.0)),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(7.0, 8.0, 9.0))))
    assert(graft.expressions.AdcDistance.adc(a, t) == 15.0)
    // width drift between a persisted index and model fails loudly
    val bad = Seq((Seq(0, 1), Seq(Seq(1.0)))).toDF("codes", "qtab")
    val err = intercept[Exception] {
      bad.select(adcDistance(col("codes"), col("qtab"))).collect()
    }
    assert(err.getMessage.contains("different m"))
  }

  test("PqNearestCode kernel: matches the HOF argmin, interp == codegen, fails loudly") {
    import graft.expressions.PqNearestCode.pqNearestCode
    import org.apache.spark.sql.catalyst.util.ArrayData
    // 4-dim vectors, m=2 subspaces, ksub=3 codes of dsub=2
    val df = Seq(
      (Seq(0.0, 0.0, 5.0, 5.0),
        Seq(Seq(Seq(0.0, 0.1), Seq(3.0, 3.0), Seq(0.0, 0.0)),
          Seq(Seq(5.0, 5.0), Seq(4.9, 5.0), Seq(9.0, 9.0)))),
      // exact tie between codes 0 and 1 in both subspaces -> lowest wins
      (Seq(1.0, 1.0, 2.0, 2.0),
        Seq(Seq(Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(8.0, 8.0)),
          Seq(Seq(2.0, 2.0), Seq(2.0, 2.0), Seq(0.0, 0.0)))))
      .toDF("v", "cb")
    // the HOF formulation pqCode used before the native kernel
    val dsub = 2
    val hof = transform(sequence(lit(0), lit(1)), j => {
      val sub = slice(col("v"), j * lit(dsub) + 1, lit(dsub))
      val dists = transform(element_at(col("cb"), j + lit(1)), cent =>
        aggregate(zip_with(sub, cent, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      val tagged = transform(dists, (d, i) => struct(d.as("_d"), i.as("_i")))
      element_at(array_sort(tagged), 1).getField("_i").cast("int")
    })
    val rows = df.select(pqNearestCode(col("v"), col("cb")).as("native"), hof.as("hof"))
      .as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
    assert(rows.map(_._1).toSeq == Seq(Seq(2, 0), Seq(0, 0)))
    // interpreted kernel agrees with the executed (codegen) path
    val v = ArrayData.toArrayData(Array(0.0, 0.0, 5.0, 5.0))
    val cb = ArrayData.toArrayData(Array(
      ArrayData.toArrayData(Array(ArrayData.toArrayData(Array(0.0, 0.1)),
        ArrayData.toArrayData(Array(3.0, 3.0)), ArrayData.toArrayData(Array(0.0, 0.0)))),
      ArrayData.toArrayData(Array(ArrayData.toArrayData(Array(5.0, 5.0)),
        ArrayData.toArrayData(Array(4.9, 5.0)), ArrayData.toArrayData(Array(9.0, 9.0))))))
    assert(graft.expressions.PqNearestCode.code(v, cb)
      .toIntArray().toSeq == Seq(2, 0))
    // dim not divisible into subspaces fails loudly
    val bad = Seq((Seq(1.0, 2.0, 3.0),
      Seq(Seq(Seq(1.0)), Seq(Seq(1.0))))).toDF("v", "cb")
    val err = intercept[Exception] {
      bad.select(pqNearestCode(col("v"), col("cb"))).collect()
    }
    assert(err.getMessage.contains("divisible"))
  }

  test("zero-norm vectors pass through normalization without crashing") {
    import org.apache.spark.sql.functions.typedlit
    val base = emb.limit(20)
    val zero = base.limit(1).select(lit(8888L).as("vec_id"),
      typedlit(Array.fill(64)(0.0f)).as("embedding"), col("label"))
    val all = base.unionByName(zero)
    val codes = pipeline.Similarity.pqCodes(all, "vec_id", "embedding", m = 4, ksub = 8)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.contains(8888L) && codes(8888L).length == 4)
    // the zero vector indexes as a candidate; its own query row produces
    // null cosines against centroids and is dropped by the cell ranking
    val out = pipeline.Similarity.ivfPqTopK(all, "vec_id", "embedding", k = 2,
      nlist = 4, nprobe = 2, m = 4, ksub = 8,
      queryFilter = col("vec_id") < 8888L)
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
  }

  test("dim not divisible by m throws") {
    val err = intercept[IllegalArgumentException] {
      pipeline.Similarity.pqCodes(emb, "vec_id", "embedding", m = 7, ksub = 8).collect()
    }
    assert(err.getMessage.contains("divisible"))
  }

  test("ivfTopKHier probing every branch and cell equals exact topK") {
    // wprobe = all branches, nprobe = all cells -> every query sees the
    // whole corpus (each data vector lives in exactly one cell), so the
    // hierarchical routing must reproduce the exact ranking bit-for-bit
    val viaHier = pipeline.Similarity.ivfTopKHier(emb, "vec_id", "embedding",
      k = 3, nsuper = 3, nlistPer = 4, wprobe = 3, nprobe = 12)
      .as[(Long, Long, Int)].collect().toSet
    val exact = pipeline.Similarity.topK(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaHier == exact)
  }

  test("ivfTopKHier: bounded probes keep useful recall and are deterministic") {
    val hier = pipeline.Similarity.ivfTopKHier(emb, "vec_id", "embedding",
      k = 3, nsuper = 4, nlistPer = 4, wprobe = 2, nprobe = 4)
    val rows = hier.as[(Long, Long, Int)].collect()
    assert(rows.map(_._1).distinct.length == emb.count(),
      "every vector must get at least one neighbor at these probe widths")
    assert(rows.groupBy(_._1).values.forall(_.length <= 3))
    val again = pipeline.Similarity.ivfTopKHier(emb, "vec_id", "embedding",
      k = 3, nsuper = 4, nlistPer = 4, wprobe = 2, nprobe = 4)
      .as[(Long, Long, Int)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    val exact = pipeline.Similarity.topK(emb, "vec_id", "embedding", k = 3)
    val rec = pipeline.Similarity.recallAtK(hier, exact)
      .agg(avg("recall")).head().getDouble(0)
    // two-level routing approximates flat IVF; at 16 cells / probe 8 the
    // branch-boundary misses still leave most of the true top-3 reachable
    assert(rec > 0.3, s"hier IVF mean recall@3 unexpectedly low: $rec")
  }

  test("ivfTopKHier with nsuper=1 degenerates to flat ivfTopK exactly") {
    // one branch holds every sub-seed, and the sub-seeds are the same
    // md5-order prefix the flat quantizer samples, so the routings must
    // coincide cell-for-cell (lloydIters=0 on the flat side)
    val hier = pipeline.Similarity.ivfTopKHier(emb, "vec_id", "embedding",
      k = 3, nsuper = 1, nlistPer = 8, wprobe = 1, nprobe = 3)
      .as[(Long, Long, Int)].collect().toSet
    val flat = pipeline.Similarity.ivfTopK(emb, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(hier == flat)
  }

  test("ivfTopKHier: no vector is dropped when a branch attracts no extra seeds") {
    // 5 identical vectors + 3 distinct ones with nsuper=4: several super
    // seeds tie at cosine 1.0, so without the anchor-own-branch rule some
    // branches would end up empty and their vectors would vanish from the
    // index join
    val base = emb.limit(3).select(col("vec_id"), col("embedding"))
    val first = emb.orderBy("vec_id").limit(1)
    val dups = (1 to 5).map(i => first.select((col("vec_id") + 9000 + i).as("vec_id"),
      col("embedding"))).reduce(_ unionByName _)
    val all = base.unionByName(dups)
    val out = pipeline.Similarity.ivfTopKHier(all, "vec_id", "embedding",
      k = 2, nsuper = 4, nlistPer = 2, wprobe = 4, nprobe = 8)
      .as[(Long, Long, Int)].collect()
    assert(out.map(_._1).distinct.length == all.count(),
      "anchored branches must keep every vector reachable")
  }

  test("BestCell kernel: matches the sort pipeline, interp == codegen, ties by id") {
    import graft.expressions.BestCell.bestCellIndex
    import graft.expressions.ArrayDotProduct.dotProduct
    // cells as (id, vector, norm) structs; includes an exact tie (cells
    // 10 and 7 identical) that must go to the LOWER id, and a zero-norm
    // cell that must rank last via the -2.0 sentinel
    val df = Seq(
      (Seq(1.0, 0.0), 1.0, Seq(
        (10L, Seq(3.0, 0.0), 3.0), (7L, Seq(3.0, 0.0), 3.0),
        (1L, Seq(0.0, 5.0), 5.0), (2L, Seq(0.0, 0.0), 0.0))),
      (Seq(0.0, 2.0), 2.0, Seq(
        (10L, Seq(3.0, 0.0), 3.0), (7L, Seq(3.0, 0.0), 3.0),
        (1L, Seq(0.0, 5.0), 5.0), (2L, Seq(0.0, 0.0), 0.0))))
      .toDF("v", "n", "cells0")
      .select(col("v"), col("n"), transform(col("cells0"), c => struct(
        c.getField("_1").as("_c_id"), c.getField("_2").as("_c_v"),
        c.getField("_3").as("_c_n"))).as("cells"))
    // the sort pipeline the kernel replaces
    val scored = transform(col("cells"), c => struct(
      coalesce(when(col("n") * c.getField("_c_n") > 0,
        dotProduct(col("v"), c.getField("_c_v")) / (col("n") * c.getField("_c_n"))),
        lit(-2.0)).as("_sim"),
      c.getField("_c_id").as("_c_id")))
    val sorted = array_sort(scored, (a, b) =>
      when(a.getField("_sim") > b.getField("_sim"), lit(-1))
        .when(a.getField("_sim") < b.getField("_sim"), lit(1))
        .when(a.getField("_c_id") < b.getField("_c_id"), lit(-1))
        .when(a.getField("_c_id") > b.getField("_c_id"), lit(1))
        .otherwise(lit(0)))
    val rows = df.select(
      element_at(col("cells"),
        bestCellIndex(col("v"), col("n"), col("cells")) + 1)
        .getField("_c_id").as("native"),
      element_at(sorted, 1).getField("_c_id").as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != sort $h") }
    assert(rows.map(_._1).toSeq == Seq(7L, 1L)) // tie -> lower id; then the y-axis cell
    // string cell ids exercise the generic-ordering compare in codegen
    val sdf = Seq((Seq(1.0), 1.0, Seq(("b", Seq(2.0), 2.0), ("a", Seq(2.0), 2.0))))
      .toDF("v", "n", "cells0")
      .select(col("v"), col("n"), transform(col("cells0"), c => struct(
        c.getField("_1").as("_c_id"), c.getField("_2").as("_c_v"),
        c.getField("_3").as("_c_n"))).as("cells"))
    assert(sdf.select(element_at(col("cells"),
        bestCellIndex(col("v"), col("n"), col("cells")) + 1).getField("_c_id"))
      .as[String].head() == "a")
    // interpreted kernel agrees with the executed (codegen) path
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vec = ArrayData.toArrayData(Array(1.0, 0.0))
    val cv = ArrayData.toArrayData(Array(3.0, 0.0))
    assert(graft.expressions.BestCell.sim(vec, 1.0, cv, 3.0, 0) == 1.0)
    assert(graft.expressions.BestCell.sim(vec, 1.0, cv, 0.0, 0) == -2.0)
    // NaN fails loudly
    val nan = Seq((Seq(Double.NaN), 1.0, Seq((1L, Seq(1.0), 1.0))))
      .toDF("v", "n", "cells0")
      .select(col("v"), col("n"), transform(col("cells0"), c => struct(
        c.getField("_1").as("_c_id"), c.getField("_2").as("_c_v"),
        c.getField("_3").as("_c_n"))).as("cells"))
    val err = intercept[Exception] {
      nan.select(bestCellIndex(col("v"), col("n"), col("cells"))).collect()
    }
    assert(err.getMessage != null)
  }
}
