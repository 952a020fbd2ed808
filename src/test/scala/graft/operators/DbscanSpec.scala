package graft.operators

import graft.SparkSpec

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs far apart, one border point, one noise point;
  // eps = 10, minPts = 3 (micro units are plain small ints here)
  private def points() = Seq(
    (1L, 0L, 0L), (2L, 2L, 0L), (3L, 4L, 0L), (4L, 6L, 0L), // blob A
    (11L, 1000L, 0L), (12L, 1002L, 0L), (13L, 1004L, 0L), // blob B
    (21L, 15L, 0L), // border: within eps of core pid 4 (d=9) only
    (31L, 500L, 500L) // noise
  ).toDF("pid", "xm", "ym")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Dbscan.cluster(df, "pid", "xm", "ym", epsMicro = 10L, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1)

  test("blobs label by component min id; noise stays null") {
    val out = run(points())
    val byId = out.map(r => r._1 -> r).toMap
    // blob A: every point within eps of >= 3 points (incl self) => core
    assert(Seq(1L, 2L, 3L, 4L).forall(byId(_)._3))
    assert(Seq(1L, 2L, 3L, 4L).forall(byId(_)._4.contains(1L)))
    // blob B cores cluster under min id 11
    assert(Seq(11L, 12L, 13L).forall(byId(_)._3))
    assert(Seq(11L, 12L, 13L).forall(byId(_)._4.contains(11L)))
    // noise: only itself in range
    assert(byId(31L)._2 === 1L && !byId(31L)._3 && byId(31L)._4.isEmpty)
  }

  test("a border point joins its core neighbor's cluster without core status") {
    val byId = run(points()).map(r => r._1 -> r).toMap
    val border = byId(21L)
    assert(border._2 === 2L) // self + core pid 4 only
    assert(!border._3) // below minPts: not core...
    assert(border._4.contains(1L)) // ...but labeled into blob A
  }

  test("minPts above blob size demotes everything to noise") {
    val out = Dbscan.cluster(points(), "pid", "xm", "ym", 10L, 9)
      .collect()
    assert(out.forall(r => !r.getBoolean(2) && r.isNullAt(3)))
  }

  test("n_neighbors counts the point itself (the |N_eps| convention)") {
    val single = Seq((7L, 100L, 100L)).toDF("pid", "xm", "ym")
    val r = Dbscan.cluster(single, "pid", "xm", "ym", 10L, 1).collect().head
    assert(r.getLong(1) === 1L)
    // minPts = 1: a lone point is its own core cluster
    assert(r.getBoolean(2) && r.getLong(3) === 7L)
  }

  test("cross-cell neighbors are found (the 3x3 screen loses no pair)") {
    // pids straddle a cell boundary at multiples of eps = 10
    val df = Seq((1L, 9L, 0L), (2L, 11L, 0L), (3L, 19L, 0L))
      .toDF("pid", "xm", "ym")
    val out = Dbscan.cluster(df, "pid", "xm", "ym", 10L, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 3L) // 11 is 2 away; 19 is exactly eps (inclusive)
    assert(out(2L) === 3L) // sees both
  }

  test("deterministic under repartitioning") {
    val df = (1 to 200).map(i =>
      (i.toLong, (i * 37 % 500).toLong, (i * 91 % 500).toLong))
      .toDF("pid", "xm", "ym")
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a.toSeq === b.toSeq)
  }
}
