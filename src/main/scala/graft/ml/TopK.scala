package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k neighbor selection as a typed Aggregator (SURVEY.md §2.9:
  * "a TypedImperativeAggregate/Aggregator per-test-point top-k heap is the
  * 100 TB-scale variant — avoids the sort in the window").
  *
  * The window formulation (`row_number over (partition by query order by
  * sim desc)`) must SORT every candidate row per query partition —
  * O(n log n) per query and a full shuffle of ALL candidate pairs. This
  * aggregator keeps a k-bounded ordered buffer through partial
  * aggregation: map-side combine reduces each partition to ≤k rows per
  * query BEFORE the shuffle, so the exchange carries O(queries·k) rows
  * instead of O(pairs).
  *
  * Ordering matches the window form exactly: sim descending, neighbor id
  * ascending as tie-break — results are identical (asserted in TopKSpec
  * against the oracle-checked window implementation).
  */
object TopK {
  /** (similarity, neighborId, payload) candidate. */
  final case class Cand(sim: Double, id: Long, payload: Int)

  private val ord: Ordering[Cand] =
    Ordering.by((c: Cand) => (-c.sim, c.id))

  final class TopKAgg(k: Int) extends Aggregator[Cand, List[Cand], Seq[Cand]]
      with Serializable {
    override def zero: List[Cand] = Nil
    override def reduce(buf: List[Cand], c: Cand): List[Cand] =
      bound(insert(buf, c))
    override def merge(a: List[Cand], b: List[Cand]): List[Cand] =
      bound(b.foldLeft(a)((acc, c) => insert(acc, c)))
    override def finish(buf: List[Cand]): Seq[Cand] = buf
    override def bufferEncoder: Encoder[List[Cand]] = ExpressionEncoder[List[Cand]]()
    override def outputEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()

    private def insert(buf: List[Cand], c: Cand): List[Cand] = {
      val (before, after) = buf.span(b => ord.lt(b, c))
      before ::: c :: after
    }
    private def bound(buf: List[Cand]): List[Cand] =
      if (buf.lengthCompare(k) > 0) buf.take(k) else buf
  }

  /** Top-k per group over (groupCol, sim, id, payload) rows; one output row
    * per kept neighbor with rank rk ∈ [1, k]. */
  def topKPerGroup(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("long").as("g"), col("sim"),
        col("id").cast("long").as("id"), col("payload").cast("int").as("payload"))
      .as[(Long, Double, Long, Int)]
      .groupByKey(_._1)
      .mapValues { case (_, sim, id, p) => Cand(sim, id, p) }
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (g, cands) =>
        cands.zipWithIndex.map { case (c, i) => (g, c.sim, c.id, c.payload, i + 1) }
      }
      .toDF(groupCol, "sim", "id", "payload", "rk")
  }
}
