package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Double, Long)], width: Double = 5.0): Set[Long] =
    Skyline
      .skyline2D(pts.toDF("id", "x", "y"), "x", "y", width)
      .select("id")
      .collect()
      .map(_.getLong(0))
      .toSet

  test("single dominator wins") {
    assert(run(Seq((1L, 10.0, 5L), (2L, 20.0, 3L), (3L, 15.0, 4L))) === Set(2L))
  }

  test("anti-chain keeps every point") {
    assert(run(Seq((1L, 10.0, 1L), (2L, 20.0, 2L), (3L, 30.0, 3L))) ===
      Set(1L, 2L, 3L))
  }

  test("duplicate points are co-skyline; a strictly better same-x point evicts both") {
    assert(run(Seq((1L, 10.0, 5L), (2L, 10.0, 5L))) === Set(1L, 2L))
    assert(run(Seq((1L, 10.0, 5L), (2L, 10.0, 5L), (3L, 10.0, 4L))) === Set(3L))
  }

  test("equal-y strictly-higher-x dominates") {
    assert(run(Seq((1L, 10.0, 5L), (2L, 20.0, 5L))) === Set(2L))
  }

  test("matches naive dominance on a deterministic cloud across bucket widths") {
    val pts = (1L to 200L).map { i =>
      val x = (i * 131 % 97).toDouble
      val y = i * 173 % 89
      (i, x, y)
    }
    val naive = pts.filter { case (_, ax, ay) =>
      !pts.exists { case (_, bx, by) =>
        bx >= ax && by <= ay && (bx > ax || by < ay)
      }
    }.map(_._1).toSet
    for (w <- Seq(1.0, 7.0, 1000.0))
      assert(run(pts, w) === naive, s"width $w")
  }
}
