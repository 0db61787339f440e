package graft

import org.apache.spark.sql.functions._

import graft.operators.{BoxMerge, DistributedCC}

class DistributedCCSpec extends SparkSpec {

  private def randomFeed(seed: Int, tiles: Int, perTile: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until tiles).flatMap { t =>
      (0 until perTile).map { _ =>
        val x1 = rng.nextInt(400); val y1 = rng.nextInt(400)
        (s"t$t", x1, y1, x1 + 1 + rng.nextInt(60), y1 + 1 + rng.nextInt(60),
          if (rng.nextBoolean()) "water_tower" else "closed_roof_tank", s"c${rng.nextInt(3)}")
      }
    }.toDF("key", "x1", "y1", "x2", "y2", "label", "chip")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("key", "cluster_id").collect().toSeq

  test("hash-min clustering equals the bounded union-find operator") {
    val feed = randomFeed(11, tiles = 15, perTile = 25)
    assert(canon(DistributedCC.mergeUnbounded(feed)) == canon(BoxMerge.mergeFrame(feed)))
  }

  test("agrees on a dense skew tile (one key, many overlapping boxes)") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    // dense: 120 boxes in a 200x200 area -> long transitive chains
    val feed = (0 until 120).map { _ =>
      val x1 = rng.nextInt(200); val y1 = rng.nextInt(200)
      ("hot", x1, y1, x1 + 10 + rng.nextInt(40), y1 + 10 + rng.nextInt(40), "water_tower",
        s"c${rng.nextInt(3)}")
    }.toDF("key", "x1", "y1", "x2", "y2", "label", "chip")
    assert(canon(DistributedCC.mergeUnbounded(feed)) == canon(BoxMerge.mergeFrame(feed)))
  }

  test("cross-cell merges are found (pair straddling a 64px boundary)") {
    import spark.implicits._
    val feed = Seq(
      ("t", 50, 10, 63, 40, "water_tower", "c0"),  // ends just left of cell edge
      ("t", 66, 12, 90, 38, "water_tower", "c1"))  // starts just right; 3px gap
    .toDF("key", "x1", "y1", "x2", "y2", "label", "chip")
    // gap = 66-63 = 3 <= 5 and y-interval of first covers second -> one cluster
    val out = canon(DistributedCC.mergeUnbounded(feed))
    assert(out.size == 1 && out.head.getAs[Int]("n_boxes") == 2)
  }

  test("empty and singleton inputs") {
    import spark.implicits._
    val single = Seq(("t", 1, 2, 3, 4, "water_tower", "c0")).toDF("key", "x1", "y1", "x2", "y2", "label", "chip")
    val out = canon(DistributedCC.mergeUnbounded(single))
    assert(out.size == 1 && !out.head.getAs[Boolean]("merged"))
    val empty = single.filter(col("x1") < 0)
    assert(DistributedCC.mergeUnbounded(empty).count() == 0)
  }
}
