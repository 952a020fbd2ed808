package graft.operators

import graft.SparkSpec

class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def run(ids: Seq[Long], epoch: Long, shards: Int) =
    EpochShuffle.assign(ids.toDF("id"), "id", epoch, shards)
      .as[(Long, Long, Long)].collect().toSeq

  test("deterministic across reruns and partitionings") {
    val ids = (1L to 200L)
    val a = run(ids, 3L, 4).sortBy(_._1)
    val b = EpochShuffle.assign(
        ids.toDF("id").repartition(7), "id", 3L, 4)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(a == b)
  }

  test("positions are a dense 1..n permutation within each shard") {
    val out = run(1L to 200L, 5L, 4)
    assert(out.map(_._1).distinct.length == 200)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps == (1L to ps.length).toSeq)
    }
    assert(out.map(_._2).distinct.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("null ids fail loudly instead of hashing the bare epoch") {
    val df = Seq(Some(1L), None).toDF("id")
    val e = intercept[Exception] {
      EpochShuffle.assign(df, "id", 1L, 4).collect()
    }
    assert(e.getMessage.contains("null id") ||
      Option(e.getCause).exists(_.getMessage.contains("null id")),
      e.toString)
  }

  test("different epochs produce different permutations") {
    val e1 = run(1L to 200L, 1L, 4).sortBy(_._1)
    val e2 = run(1L to 200L, 2L, 4).sortBy(_._1)
    assert(e1 != e2)
    // and shards stay reasonably balanced in both
    Seq(e1, e2).foreach { e =>
      val sizes = e.groupBy(_._2).values.map(_.size)
      assert(sizes.min > 20, sizes.toString)
    }
  }
}
