package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end drive of the CLASSIC (py4j) Python client
 * (python/graft/classic.py → graft.GraftPythonAPI → the shared
 * GraftConnectDispatch table) against a REAL local pyspark session in a
 * separate process — the role of the reference's classic-client pytest
 * coverage (python/graphframes/classic/graphframe.py). Canceled, not
 * failed, when python3/pyspark are unavailable. */
class ClassicPythonSpec extends AnyFunSuite {

  private def run(cmd: Seq[String], env: Map[String, String] = Map.empty): (Int, Seq[String]) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toSeq
    (p.waitFor(), out)
  }

  test("classic py4j client drives graph + pipeline ops end to end") {
    val haveP = try run(Seq("python3", "-c", "import pyspark"))._1 == 0
    catch { case _: java.io.IOException => false }
    if (!haveP) cancel("python3 with pyspark not available")

    val classes = new java.io.File("target/scala-2.13/classes")
    assert(classes.isDirectory, "compiled classes missing")
    val jar = java.io.File.createTempFile("graft-classic", ".jar")
    jar.deleteOnExit()
    val (jrc, jout) = run(Seq("jar", "cf", jar.getAbsolutePath,
      "-C", classes.getAbsolutePath, "."))
    assert(jrc == 0, s"jar failed: ${jout.mkString("\n")}")

    val (rc, out) = run(Seq("python3", "python/tests/test_classic.py"),
      Map("GRAFT_JAR" -> jar.getAbsolutePath))
    assert(rc == 0, s"classic e2e failed:\n${out.takeRight(30).mkString("\n")}")
    assert(out.exists(_.contains("CLASSIC ALL OK")),
      s"missing final marker:\n${out.takeRight(15).mkString("\n")}")
    // every individual check reported
    Seq("degrees", "page_rank", "find", "connected_components",
      "typed_param_error", "pipe_near_dup_clusters", "pipe_ann_topk",
      "betweenness", "ktruss", "greedy_coloring", "neighborhood_function",
      "node2vec_walks", "closeness_sampled", "eccentricity_sampled",
      "pipe_asof_forward", "louvain_modularity", "pipe_nb_classifier",
      "eigenvector", "minimum_spanning_forest", "pipe_knn_graph",
      "triangles_cliques", "negative_samples", "pipe_cms_topk",
      "pipe_also_bought", "pipe_fuzzy_pairs",
      "maximal_matching", "maximal_matching_weighted", "voronoi",
      "pipe_hash_split", "pipe_shuffle_shards", "pipe_fuzzy_pairs_multi",
      "pipe_dsir", "pipe_strip_markup", "pipe_url_canonical",
      "pipe_host_stats", "pipe_corpus_diff", "pipe_group_quantiles",
      "pipe_keep_best", "pipe_extract_links", "pipe_link_graph",
      "pipe_host_rank", "pipe_quantile_cut", "pipe_unigram_train",
      "pipe_unigram_encode", "pipe_wordpiece_vocab", "pipe_wordpiece_encode",
      "pipe_gopher_rules")
      .foreach(c => assert(out.exists(l => l.contains("CLASSIC OK") && l.contains(c)),
        s"check $c missing"))
  }
}
