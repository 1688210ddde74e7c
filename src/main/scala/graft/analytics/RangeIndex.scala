package graft.analytics

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The repo's ONE home for two-pass range-partitioned ranking — the
  * machinery that replaces every `rank()/ntile()/row_number()` window
  * whose partition key is too coarse to parallelize (no partition, or a
  * 3-value flag over row grain): range-partition on the sort key, collect
  * O(#partitions) counts on the driver, local sort (no further exchange)
  * + running-index stamp + broadcast cumulative offsets. Used by
  * [[Advanced]] globalRank (q388 Gini), [[graft.dedup.Dedup]] ntileByKey
  * (q222 et al.), and the grouped weighted prefix behind q344 Spearman —
  * keeping the q222-safe discipline in a single audited place.
  *
  * Scale contract: nothing driver-side ever exceeds O(#partitions ×
  * #groups) rows; no SinglePartition exchange; the stamped frame keeps
  * the range-partitioning for downstream joins. */
object RangeIndex {

  /** Core stamp: range-partition `df`'s `cols` projection on `cols`,
    * then per partition attach `pid` and the 1-based local running index
    * `lrn` in `cols` sort order. The returned frame is localCheckpointed
    * (both passes read it); no global offsets yet. */
  private def stamp(s: SparkSession, df: DataFrame,
                    cols: Seq[String]): DataFrame = {
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.select(cols.map(col): _*)
      .repartitionByRange(parts, cols.map(col): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sorted = ranged.sortWithinPartitions(cols.map(col): _*)
    sorted.mapPartitions { it =>
      var i = 0L
      it.map { row => i += 1; Row.fromSeq(row.toSeq :+ i) }
    }(org.apache.spark.sql.Encoders.row(sorted.schema.add("lrn", LongType)))
  }

  /** Global 1..n row index over a UNIQUE composite sort key: returns
    * (`cols`… , `rn`) plus the total row count. rank == row_number under
    * uniqueness, so callers get rank semantics for free. */
  def indexed(s: SparkSession, df: DataFrame,
              cols: Seq[String]): (DataFrame, Long) = {
    val stamped = stamp(s, df, cols).localCheckpoint()
    val counts = stamped.groupBy("pid").agg(max("lrn").as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
        .init.zip(counts).map { case ((_, off), (pid, _)) => pid -> off }
        .toMap
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
    * on a 3-value flag IS a single-reducer sort at row grain).
    * Driver sees O(#partitions × #groups) (pid, grp, total) rows. */
  def groupedPrefix(s: SparkSession, df: DataFrame, grp: String,
                    ord: String, w: String): DataFrame = {
    val stamped0 = stamp(s, df, Seq(grp, ord, w))
    // per-partition running sum of w, reset at group boundaries
    // (partitions are (grp, ord)-range-contiguous, so each group spans
    // a contiguous pid interval and boundaries are detectable locally)
    val schema = stamped0.schema.add("lpfx", LongType)
    // positional indices resolved on the driver: rows inside
    // mapPartitions are schemaless GenericRows (no getAs-by-name)
    val (gi, wi) =
      (stamped0.schema.fieldIndex(grp), stamped0.schema.fieldIndex(w))
    val local = stamped0.mapPartitions { it =>
      var started = false; var cur: Any = null; var acc = 0L
      it.map { row =>
        val g = row.get(gi)
        if (!started || cur != g) { started = true; cur = g; acc = 0L }
        val out = Row.fromSeq(row.toSeq :+ acc)
        acc += row.get(wi).asInstanceOf[Number].longValue()
        out
      }
    }(org.apache.spark.sql.Encoders.row(schema)).localCheckpoint()
    val totals = local.groupBy("pid", grp)
      .agg(sum(col(w).cast(LongType)).as("t")).collect()
      .map(r => (r.getInt(0), r.getAs[Any](grp), r.getLong(2)))
    // offset(pid, g) = Σ totals of the same group on EARLIER partitions
    val offsets: Map[(Int, Any), Long] = totals.groupBy(_._2).flatMap {
      case (g, rows) =>
        val byPid = rows.sortBy(_._1)
        byPid.scanLeft((0, 0L)) { case ((_, acc), (pid, _, t)) =>
          (pid, acc + t)
        }.init.zip(byPid).map { case ((_, off), (pid, _, _)) =>
          (pid, g) -> off }
    }
    val bc = s.sparkContext.broadcast(offsets)
    val (pi, li) = (schema.fieldIndex("pid"), schema.fieldIndex("lpfx"))
    local.mapPartitions { it =>
      it.map { row =>
        val off = bc.value.getOrElse((row.getInt(pi), row.get(gi)), 0L)
        Row.fromSeq(row.toSeq :+ (row.getLong(li) + off))
      }
    }(org.apache.spark.sql.Encoders.row(schema.add("pfx", LongType)))
      .select(col(grp), col(ord), col(w), col("pfx"))
  }
}
