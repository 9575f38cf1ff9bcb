package graft

import org.apache.spark.sql.functions._
import graft.propertygraph._

/**
 * Port of the reference PropertyGraphFrameTest (reference
 * core/src/test/.../propertygraph/PropertyGraphFrameTest.scala:20-278):
 * the movie-rating fixture, group-subset/filtered `toGraphFrame`, the
 * masking toggle, `projectionBy` with default and custom weights, and
 * `joinVertices` over connected-components output.
 */
class PropertyGraphPortSpec extends TestBase {
  import spark.implicits._

  private lazy val peopleData =
    Seq((1L, "Alice"), (2L, "Bob"), (3L, "Charlie"), (4L, "David"), (5L, "Eve"))
      .toDF("id", "name")
  private lazy val peopleGroup = VertexPropertyGroup("people", peopleData, "id")
  private lazy val moviesData =
    Seq((1L, "Matrix"), (2L, "Inception"), (3L, "Interstellar")).toDF("id", "title")
  private lazy val moviesGroup = VertexPropertyGroup("movies", moviesData, "id")
  private lazy val likesData =
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 2L)).toDF("src", "dst")
  private lazy val likesGroup = EdgePropertyGroup("likes", likesData,
    peopleGroup, moviesGroup, isDirected = false, "src", "dst", lit(1.0))
  private lazy val messagesData = Seq((1L, 2L, 5.0), (2L, 3L, 8.0), (3L, 4L, 3.0),
    (4L, 5L, 6.0), (5L, 1L, 9.0)).toDF("src", "dst", "weight")
  private lazy val messagesGroup = EdgePropertyGroup("messages", messagesData,
    peopleGroup, peopleGroup, isDirected = true, "src", "dst", col("weight"))
  private lazy val g =
    PropertyGraphFrame(Seq(peopleGroup, moviesGroup), Seq(likesGroup, messagesGroup))

  private def sha256Hash(id: Long, group: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    group + md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("projection by movies creates correct graph structure (reference :75-108)") {
    val projected = g.projectionBy("people", "movies", "likes")
    assert(projected.vertexPropertyGroups.map(_.name) == Seq("people"))
    assert(projected.edgesPropertyGroups.map(_.name).toSet == Set("messages", "projected_likes"))
    val pl = projected.edgesPropertyGroups.find(_.name == "projected_likes").get
    assert(pl.srcColumnName == GraphFrame.SRC && pl.dstColumnName == GraphFrame.DST)
    assert(pl.weightColumnName == GraphFrame.WEIGHT && !pl.isDirected)
    val edges = pl.data.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("toGraphFrame with messages edges and people vertices only (reference :116-139)") {
    val graph = g.toGraphFrame(Seq("people"), Seq("messages"),
      Map("messages" -> lit(true)), Map("people" -> lit(true)))
    val vertices = graph.vertices.collect().map(_.getString(0)).toSet
    assert(vertices == Set(1L, 2L, 3L, 4L, 5L).map(sha256Hash(_, "people")))
    val edges = graph.edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val expected = Set((1L, 2L, 5.0), (2L, 3L, 8.0), (3L, 4L, 3.0), (4L, 5L, 6.0),
      (5L, 1L, 9.0)).map { case (s, d, w) =>
      (sha256Hash(s, "people"), sha256Hash(d, "people"), w)
    }
    assert(edges == expected)
  }

  test("toGraphFrame with all groups and proper edge handling (reference :141-173)") {
    val graph = g.toGraphFrame(Seq("people", "movies"), Seq("messages", "likes"),
      Map("messages" -> lit(true), "likes" -> lit(true)),
      Map("people" -> lit(true), "movies" -> lit(true)))
    val vertices = graph.vertices.collect().toSet
    assert(vertices.size == 8)
    assert(vertices.count(_.getString(0) == sha256Hash(1L, "movies")) == 1)
    assert(vertices.count(_.getString(0) == sha256Hash(1L, "people")) == 1)
    val edges = graph.edges.collect().toSet
    val messageEdges = edges.filter(_.getDouble(2) != 1.0)
    val likeEdges = edges.filter(_.getDouble(2) == 1.0)
    assert(messageEdges.size == 5)
    assert(likeEdges.size == 12) // 6 undirected likes symmetrized
    val likesPairs = likeEdges.map(r => (r.getString(0), r.getString(1)))
    assert(likesPairs.contains((sha256Hash(1, "people"), sha256Hash(1, "movies"))) &&
      likesPairs.contains((sha256Hash(1, "movies"), sha256Hash(1, "people"))))
  }

  test("toGraphFrame preserves original IDs when masking disabled (reference :175-223)") {
    val unmaskedMovies = VertexPropertyGroup("movies", moviesData, "id", applyMaskOnId = false)
    val newLikes = EdgePropertyGroup("likes", likesGroup.data, peopleGroup, unmaskedMovies,
      isDirected = false, "src", "dst", likesGroup.weightColumnName)
    val modified = PropertyGraphFrame(Seq(peopleGroup, unmaskedMovies),
      Seq(messagesGroup, newLikes))
    val graph = modified.toGraphFrame(Seq("people", "movies"), Seq("messages", "likes"),
      Map("messages" -> lit(true), "likes" -> lit(true)),
      Map("people" -> lit(true), "movies" -> lit(true)))
    val vertices = graph.vertices.collect().map(_.getString(0)).toSet
    assert(Set("1", "2", "3").subsetOf(vertices))
    assert(vertices.contains(sha256Hash(1L, "people")))
    val likesEdges = graph.edges.collect().filter(_.getDouble(2) == 1.0)
    assert(likesEdges.exists(e =>
      e.getString(0) == sha256Hash(1L, "people") && e.getString(1) == "1"))
    assert(likesEdges.exists(e =>
      e.getString(0) == "1" && e.getString(1) == sha256Hash(1L, "people")))
  }

  test("projection with custom weight function (reference :225-250)") {
    val projected = g.projectionBy("people", "movies", "likes",
      Some((l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) => l + r))
    val pl = projected.edgesPropertyGroups.find(_.name == "projected_likes").get
    val edges = pl.data.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges == Set((1L, 2L, 2.0), (1L, 3L, 2.0), (1L, 5L, 2.0), (3L, 5L, 2.0)))
  }

  test("joinVertices withConnectedComponents (reference :252-277)") {
    val graph = g.toGraphFrame(Seq("people", "movies"), Seq("messages", "likes"),
      Map("messages" -> lit(true), "likes" -> lit(true)),
      Map("people" -> lit(true), "movies" -> lit(true)))
    val components = graph.connectedComponents.run()
    val joined = g.joinVertices(components, Seq("people", "movies"))
      .select(col(PropertyGraphFrame.EXTERNAL_ID), col("component"),
        col(PropertyGraphFrame.PROPERTY_GROUP_COL_NAME))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._3)
    assert(joined.contains("movies") && joined.contains("people"))
    assert(joined("movies").length == 3)
    assert(joined("people").length == 5)
    // everything is one component in this fixture (likes bridge all groups)
    assert((joined("movies") ++ joined("people")).map(_._2).toSet.size == 1)
  }

  test("validation failures are loud (reference EdgePropertyGroup validate)") {
    intercept[InvalidPropertyGroupException](
      VertexPropertyGroup("people", peopleData, "nope"))
    intercept[InvalidPropertyGroupException](
      EdgePropertyGroup("e", likesData, peopleGroup, moviesGroup,
        isDirected = true, "src", "missing", "src"))
    intercept[InvalidPropertyGroupException](
      EdgePropertyGroup("e", likesData.withColumn("w", lit("txt")), peopleGroup,
        moviesGroup, isDirected = true, "src", "dst", "w"))
  }
}
