package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k per group via `Aggregator[IN, BUF, OUT]` — the scale
  * alternative to `row_number() OVER (PARTITION BY ... ORDER BY ...)`:
  * the window form SORTS every group's full row set; this aggregator keeps
  * a bounded k-element buffer that combines map-side, so a group with a
  * billion rows ships only k rows per partition to the reducer.
  *
  * Ordering: (score DESC, id ASC) — id tiebreak keeps results
  * deterministic, matching the window formulation exactly.
  */
object TopKAggregator {

  type Scored = (Long, Double) // (id, score)

  final class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) // "better than"

    def zero: List[Scored] = Nil

    def reduce(buf: List[Scored], v: Scored): List[Scored] = insert(buf, v)

    def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[Scored], v: Scored): List[Scored] = {
      val merged = (v :: buf).sortWith(lt)
      if (merged.length > k) merged.take(k) else merged
    }

    def finish(buf: List[Scored]): Seq[Scored] = buf.sortWith(lt)

    def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** DataFrame-level top-k per group: returns (groupCols..., rank, id,
    * score) exactly like the window formulation, but with bounded
    * map-side state. */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val agg = udaf(new TopK(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(idCol), col(scoreCol)).as("topk"))
      .select(groupCols.map(col) :+ posexplode(col("topk")).as(Seq("rank0", "item")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("rank0") + 1).cast("int").as("rank"),
        col("item._1").as(idCol),
        col("item._2").as(scoreCol)): _*)
  }
}
