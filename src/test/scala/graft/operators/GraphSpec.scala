package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val row = Graph
      .triangleCount(edges.toDF("a", "b"), "a", "b")
      .collect()
      .head
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  test("K4 has four triangles") {
    val k4 = for {
      i <- 1L to 4L; j <- 1L to 4L if i < j
    } yield (i, j)
    assert(run(k4) === ((4L, 6L, 4L)))
  }

  test("square with one diagonal has two triangles") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))) ===
      ((4L, 5L, 2L)))
  }

  test("duplicates, reversed orientations, and self-loops normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L), (3L, 2L))
    assert(run(messy) === ((3L, 3L, 1L)))
  }

  test("triangle-free bipartite graph counts zero") {
    val bip = for { i <- 1L to 3L; j <- 10L to 12L } yield (i, j)
    assert(run(bip) === ((6L, 9L, 0L)))
  }

  test("star graph centered on a hub counts zero despite high degree") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(run(star) === ((20L, 19L, 0L)))
  }
}
