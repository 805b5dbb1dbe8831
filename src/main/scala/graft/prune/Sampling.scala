package graft.prune

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators.
  *
  * The reference uses seeded python RNGs; all distributed forms here are
  * pure row-hash functions (retry-stable, engine-portable — SURVEY.md
  * §7.4).
  */
object Sampling {

  /** Bernoulli-by-hash sample: keep a row iff the first 4 hex chars of
    * md5(key|seed) fall below fraction * 0x10000. Same expression is
    * writable in any SQL engine.
    */
  def hashSample(df: DataFrame, keyCols: Seq[Column], fraction: Double, seed: Long): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // the 4-hex-char compare is lexicographic over exactly 4 chars; a
    // bound of 0x10000 would render as 5 chars and compare wrongly, so
    // the boundary fractions short-circuit
    val scaled = math.round(fraction * 65536).toInt
    if (scaled >= 65536) df
    else if (scaled <= 0) df.limit(0)
    else {
      val bound = f"$scaled%04x"
      df.filter(
        substring(md5(concat_ws("|", keyCols :+ lit(seed.toString): _*)), 1, 4) < bound)
    }
  }

  /** Stratified proportional sample with EXACT per-stratum counts
    * (reference scripts/balance_negatives.py:120-193: proportional
    * per-source-file quotas with exact-count fixups): row_number over a
    * hash order within each stratum, keep the first n.
    */
  def exactStratified(df: DataFrame, stratumCol: String, nPerStratum: Int,
      keyCols: Seq[Column], seed: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat_ws("|", keyCols :+ lit(seed.toString): _*)))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
  }

  /** Negative sampling by corruption (reference graph_sampler.py:33-87):
    * per positive edge, corrupt head or tail with a hash-chosen entity,
    * reject self-loops and existing edges, regenerate the deficit until
    * `numNeg` negatives per positive exist (loop-until-count).
    */
  def negativeSample(
      edges: DataFrame, // (subject, predicate, object)
      entities: DataFrame, // (entity_id: string, id: long dense 1..N)
      numNeg: Int,
      seed: Long,
      maxRounds: Int = 5): DataFrame = {
    val nEnt = entities.count()
    val entByIdx = broadcast(entities.select(
      col("id").as("__idx"), col("entity_id").as("__corrupt")))

    def attempt(round: Int, perPos: Int): DataFrame =
      edges
        .select(col("subject").as("src_s"), col("predicate").as("src_p"),
          col("object").as("src_o"),
          explode(sequence(lit(0), lit(perPos - 1))).as("__a"))
        .withColumn("__h", xxhash64(col("src_s"), col("src_p"),
          col("src_o"), col("__a"), lit(seed + round)))
        .withColumn("__idx", pmod(col("__h"), lit(nEnt)) + 1)
        .join(entByIdx, "__idx")
        .withColumn("__corruptHead", pmod(col("__h"), lit(2)) === 0)
        .select(col("src_s"), col("src_p"), col("src_o"),
          when(col("__corruptHead"), col("__corrupt")).otherwise(col("src_s")).as("subject"),
          col("src_p").as("predicate"),
          when(col("__corruptHead"), col("src_o")).otherwise(col("__corrupt")).as("object"))
        .filter(col("subject") =!= col("object"))
        .join(edges, Seq("subject", "predicate", "object"), "left_anti")
        .distinct()

    var negs = attempt(0, numNeg + 1).localCheckpoint(true)
    var round = 1
    val target = edges.count() * numNeg
    while (negs.count() < target && round < maxRounds) {
      negs = negs.unionAll(attempt(round, numNeg + 1))
        .distinct().localCheckpoint(true)
      round += 1
    }
    // exact per-positive cap, deterministic order (the reference keeps
    // num_neg negatives per positive link)
    val w = Window.partitionBy(col("src_s"), col("src_p"), col("src_o"))
      .orderBy(md5(concat_ws("|", col("subject"), col("object"))))
    negs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= numNeg)
      .select("subject", "predicate", "object")
  }
}
