package graft.analytics

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The repo's ONE home for two-pass range-partitioned ranking — the
  * machinery that replaces every `rank()/ntile()/row_number()` window
  * whose partition key is too coarse to parallelize (no partition, or a
  * 3-value flag over row grain): range-partition on the sort key, collect
  * O(#partitions × #groups) counts on the driver, local sort (no further
  * exchange) + running-index stamp + broadcast cumulative offsets. Used
  * by [[Advanced]] globalRank (q388 Gini), [[graft.dedup.Dedup]]
  * ntileByKey (q222 et al.), and the grouped weighted prefix behind q344
  * Spearman — keeping the q222-safe discipline in a single audited place.
  *
  * Cost discipline: exactly ONE materialization (the range-partitioned
  * projection is localCheckpointed because both passes read it), ONE
  * O(#partitions × #groups) driver collect, and ONE stamping
  * mapPartitions over the sorted partitions — the round-16 q344 bench
  * caught a variant that checkpointed the stamped frame a second time
  * and paid ~2× for nothing. No SinglePartition exchange anywhere. */
object RangeIndex {

  private def ranged(s: SparkSession, df: DataFrame,
                     cols: Seq[String]): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.select(cols.map(col): _*)
      .repartitionByRange(parts, cols.map(col): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
  }

  /** Global 1..n row index over a UNIQUE composite sort key: returns
    * (`cols`… , `rn`) plus the total row count. rank == row_number under
    * uniqueness, so callers get rank semantics for free. */
  def indexed(s: SparkSession, df: DataFrame,
              cols: Seq[String]): (DataFrame, Long) = {
    val r = ranged(s, df, cols)
    // pass 1: per-partition counts → exclusive cumulative offsets
    // (O(#partitions) rows on the driver, never O(rows))
    val counts = r.groupBy("pid").count().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
        .init.zip(counts).map { case ((_, off), (pid, _)) => pid -> off }
        .toMap
    // pass 2: local sort (no exchange) + running-index stamp + offsets
    val sorted = r.sortWithinPartitions(cols.map(col): _*)
    val stamped = sorted.mapPartitions { it =>
      var i = 0L
      it.map { row => i += 1; Row.fromSeq(row.toSeq :+ i) }
    }(org.apache.spark.sql.Encoders.row(sorted.schema.add("lrn", LongType)))
    val out = stamped
      .withColumn("rn", col("lrn") +
        coalesce(element_at(typedLit(offsets), col("pid")), lit(0L)))
      .select(cols.map(col) :+ col("rn"): _*)
    (out, n)
  }

  /** Per-GROUP exclusive weighted prefix sum over a unique (grp, ord)
    * key: for each input row, `pfx` = Σ w over rows of the SAME group
    * with a strictly smaller `ord`. This is exactly the min-rank − 1 of
    * a value inside its group when `w` counts rows per value — computed
    * with a range shuffle on (grp, ord) and a per-partition scan, never
    * a per-group single-task sort (the q344 lesson: Window.partitionBy
    * on a 3-value flag IS a single-reducer sort at row grain). */
  def groupedPrefix(s: SparkSession, df: DataFrame, grp: String,
                    ord: String, w: String): DataFrame = {
    val r = ranged(s, df, Seq(grp, ord, w))
    // pass 1: per-(partition, group) totals → per-(partition, group)
    // exclusive offsets (groups are range-contiguous across pids, so
    // an offset is the sum of the SAME group's totals on earlier pids)
    val totals = r.groupBy("pid", grp)
      .agg(sum(col(w).cast(LongType)).as("t")).collect()
      .map(x => (x.getInt(0), x.get(1), x.getLong(2)))
    val offsets: Map[(Int, Any), Long] = totals.groupBy(_._2).flatMap {
      case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.scanLeft((0, 0L)) { case ((_, acc), (pid, _, t)) =>
          (pid, acc + t)
        }.init.zip(byPid).map { case ((_, off), (pid, _, _)) =>
          (pid, g) -> off }
    }
    val bc = s.sparkContext.broadcast(offsets)
    // pass 2: local sort + one running-sum stamp; the accumulator
    // resets to the broadcast offset at every group boundary
    val sorted = r.sortWithinPartitions(col(grp), col(ord))
    val schema = sorted.schema.add("pfx", LongType)
    val (gi, wi, pi) = (sorted.schema.fieldIndex(grp),
      sorted.schema.fieldIndex(w), sorted.schema.fieldIndex("pid"))
    sorted.mapPartitions { it =>
      var started = false; var cur: Any = null; var acc = 0L
      it.map { row =>
        val g = row.get(gi)
        if (!started || cur != g) {
          started = true; cur = g
          acc = bc.value.getOrElse((row.getInt(pi), g), 0L)
        }
        val out = Row.fromSeq(row.toSeq :+ acc)
        acc += row.get(wi).asInstanceOf[Number].longValue()
        out
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .select(col(grp), col(ord), col(w), col("pfx"))
  }
}
