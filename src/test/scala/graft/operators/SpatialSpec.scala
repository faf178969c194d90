package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Losslessness + exactness invariants for the grid-bucketed spatial
  * neighbor join (q216's operator): the 3x3 cell probe must reproduce the
  * naive all-pairs answer whenever radius <= cell size, emit each pair
  * exactly once, and carry exact integer squared distances. */
class SpatialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("spatial-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def bruteForce(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  test("grid probe equals brute force on a deterministic scatter (incl. cell-boundary pairs)") {
    // hash-scattered points plus planted adversarial cases: a pair straddling
    // a cell border at exactly radius distance, a same-cell tight pair, and a
    // corner-diagonal pair one unit inside the radius
    val scattered = (1L to 200L).map { i =>
      (i, (i * 2654435761L) % 1000L, (i * 40503L * 65537L) % 1000L)
    }
    val planted = Seq(
      (1001L, 99L, 50L), (1002L, 101L, 50L),   // straddles x=100 cell border
      (1003L, 250L, 250L), (1004L, 250L, 251L), // same cell, d=1
      (1005L, 399L, 399L), (1006L, 403L, 402L)  // diagonal, d2=25 = r2 at r=5... keep r=30
    )
    val pts = scattered ++ planted
    val df = pts.toDF("id", "x", "y")
    val got = Spatial.gridNeighborPairs(df, cellSize = 100L, radius = 30L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteForce(pts, 30L))
  }

  test("each qualifying pair is emitted exactly once") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 6L, 8L)).toDF("id", "x", "y")
    val rows = Spatial.gridNeighborPairs(pts, cellSize = 10L, radius = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size === rows.distinct.size)
    assert(rows.toSet === Set((1L, 2L, 25L), (1L, 3L, 100L), (2L, 3L, 25L)))
  }

  test("negative coordinates stay on the same floor-division grid") {
    val pts = Seq((1L, -1L, -1L), (2L, 1L, 1L), (3L, -95L, -95L)).toDF("id", "x", "y")
    val got = Spatial.gridNeighborPairs(pts, cellSize = 100L, radius = 50L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteForce(Seq((1L, -1L, -1L), (2L, 1L, 1L), (3L, -95L, -95L)), 50L))
  }

  test("radius > cellSize is rejected (the probe would be lossy)") {
    val pts = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Spatial.gridNeighborPairs(pts, cellSize = 10L, radius = 11L)
    }
  }
}
