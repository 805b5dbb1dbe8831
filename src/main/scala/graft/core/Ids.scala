package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic id assignment + seeded hashing utilities.
  *
  * The reference builds entity/relation dictionaries by first-seen file
  * order (/root/reference/src/gnn/lcilp/utils/data_utils.py:23-45) — a
  * single-process notion. Distributed equivalent must be retry-stable:
  * NEVER monotonically_increasing_id (non-deterministic under task
  * retry). Ranks follow the global order of the key column, computed
  * WITHOUT a single-partition global sort — SURVEY.md §4 item 3.
  */
object Ids {

  /** Global dense rank (1..n) by `orderCol` without a one-task global
    * sort: range-partition on the key, rank locally per partition, then
    * add broadcast per-partition offset prefix-sums. Range partitions
    * are ordered by key, so offset + local rank == global rank exactly;
    * the result is independent of where the (sampled) range boundaries
    * fall, hence deterministic and retry-stable.
    *
    * The partitioned frame is localCheckpoint'ed so the offset-count
    * pass and the ranking pass see the SAME partitioning (range-sampler
    * seeds differ across separate executions). The offsets collect is
    * bounded metadata: one (pid, count) row per shuffle partition.
    *
    * `orderCol` values must be distinct (callers rank distinct keys or
    * unique row keys); ties within a partition would rank
    * nondeterministically.
    */
  def globalRowNumber(df: DataFrame, orderCol: String, rnCol: String = "rn"): DataFrame =
    globalOrdered(df, Seq(col(orderCol)), rnCol)

  /** Generalization of [[globalRowNumber]]: global row_number (1..n)
    * over a MULTI-column total order, plus optional exact running sums
    * over the same order — everything a metric-style global window
    * (`Window.orderBy(...)` with no partitioning) provides, without the
    * single-partition sort that WindowExec would use (it moves the
    * whole input to one task — the 100TB scale-killer this exists to
    * avoid).
    *
    * Same partition-offset machinery as before, now two prefix sums per
    * running-sum column: range-partition on the order columns, compute
    * local rank / local cumsum per partition, then add the broadcast
    * per-partition (count, sum) prefix totals. Range partitions are
    * ordered by the key tuple, so offset + local value == global value
    * exactly; deterministic and retry-stable regardless of where the
    * sampled range boundaries fall.
    *
    * `orderCols` tuples must be distinct (callers append a unique
    * tiebreak column); ties within a partition would rank
    * nondeterministically.
    *
    * `runningSums`: (input column, output name) pairs; each output is
    * sum(input) over rows 1..rn in the global order (inclusive running
    * total, LONG input/output — callers scale doubles to exact integers
    * first, the engine's cross-engine hash discipline).
    */
  def globalOrdered(df: DataFrame, orderCols: Seq[Column], rnCol: String = "rn",
      runningSums: Seq[(Column, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sumIns = runningSums.zipWithIndex.map { case ((c, _), i) => c.as(s"__si$i") }
    // enforce the documented LONG contract up front: the offsets collect
    // below reads the per-partition totals with getLong, so a double (or
    // any non-long) running-sum column would otherwise surface as an
    // opaque ClassCastException deep in the offset pass
    if (runningSums.nonEmpty) {
      val sumSchema = df.select(sumIns: _*).schema
      runningSums.zipWithIndex.foreach { case ((_, name), i) =>
        val dt = sumSchema(s"__si$i").dataType
        require(dt == org.apache.spark.sql.types.LongType,
          s"globalOrdered running-sum '$name' must be LONG " +
            s"(exact-integer contract: scale doubles to integers first), got $dt")
      }
    }
    val ranged = df
      .select(col("*") +: sumIns: _*)
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val aggs = count(lit(1)).as("__n") +:
      runningSums.indices.map(i => sum(col(s"__si$i")).as(s"__s$i"))
    val totals = ranged.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        runningSums.indices.map(i => if (r.isNullAt(2 + i)) 0L else r.getLong(2 + i))))
      .sortBy(_._1)
    var accN = 0L
    val accS = Array.fill(runningSums.size)(0L)
    val offsets = totals.map { case (pid, n, ss) =>
      val o = (pid, accN, accS.toSeq)
      accN += n; ss.zipWithIndex.foreach { case (s, i) => accS(i) += s }
      o
    }.toSeq
    import spark.implicits._
    val offDf = offsets.map { case (pid, off, soffs) => (pid, off, soffs) }
      .toDF("__pid", "__off", "__soffs")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sumOuts = runningSums.zipWithIndex.map { case ((_, name), i) =>
      (coalesce(sum(col(s"__si$i")).over(cum), lit(0L)) +
        element_at(col("__soffs"), i + 1)).as(name)
    }
    ranged.join(broadcast(offDf), Seq("__pid"))
      .select(col("*") +:
        (row_number().over(w).cast("long") + col("__off")).as(rnCol) +:
        sumOuts: _*)
      .drop("__pid" +: "__off" +: "__soffs" +: runningSums.indices.map(i => s"__si$i"): _*)
  }

  /** (key -> dense long id) dictionary, deterministic: ids follow the
    * lexicographic order of the distinct keys.
    *
    * Adaptive like ConnectedComponents.run: dictionary-sized key sets
    * (< smallThreshold) rank through one window — the partition-offset
    * machinery costs ~4 jobs (checkpoint, counts, broadcast, join) that
    * dwarf a one-task sort of a few thousand keys — while anything
    * larger takes [[globalRowNumber]] so no full-graph node set ever
    * funnels through one task. Both paths produce IDENTICAL ids (global
    * lexicographic rank). Pass smallThreshold=0 to force the
    * distributed path (tests do).
    */
  def dictionary(df: DataFrame, keyCol: String, idCol: String = "id",
      smallThreshold: Long = 1 << 16): DataFrame = {
    val distinct = df.select(col(keyCol)).distinct()
    if (smallThreshold > 0) {
      // materialize the distinct ONCE before probing: without it the
      // probe's limit+count runs the full aggregation and the chosen
      // path re-runs the identical distinct from scratch — doubling the
      // dominant cost exactly in the large-input case
      val mat = distinct.localCheckpoint(true)
      if (mat.limit(smallThreshold.toInt).count() < smallThreshold)
        mat.withColumn(idCol,
          row_number().over(Window.orderBy(col(keyCol))).cast("long"))
      else globalRowNumber(mat, keyCol, idCol)
    } else globalRowNumber(distinct, keyCol, idCol)
  }

  /** Pure 64-bit mix (splitmix64 finalizer). Stable across JVMs/retries;
    * used anywhere the reference used a sequential RNG (SURVEY.md §7.4:
    * "make it a pure hash-based function of (s,o,seed)").
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** mix64 of two longs (seeded). */
  def mix64(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Uniform double in [0,1) from a long, pure. */
  def unitDouble(x: Long): Double = (mix64(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Column form: deterministic per-row salt in [0, buckets) derived from
    * the given key columns — used for skew salting (north_star "salted
    * sort-merge join") so the salt is stable under retries, unlike rand().
    */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")
}
