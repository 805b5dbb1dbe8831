package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity canonicalization: CC over same-as assertions, then rewrite
  * triples through the entity -> canonical map (SURVEY.md §7.1 step 4).
  *
  * The canonical representative is the lexicographically smallest member
  * id (deterministic; mirrors the reference's pick-the-min conventions).
  * The map has one row per NON-root member only, so the rewrite joins are
  * against a table that is tiny relative to the triple table and is
  * broadcast.
  */
object Canonicalize {

  /** sameAs(src, dst) -> map(entity_id, canonical_id), non-identity rows. */
  def canonicalMap(sameAs: DataFrame): DataFrame =
    ConnectedComponents.run(sameAs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("entity_id"), col("component").as("canonical_id"))

  /** Rewrite subject/object through the map (identity when absent). */
  def rewrite(triples: DataFrame, canonicalMap: DataFrame): DataFrame = {
    val sMap = broadcast(canonicalMap
      .withColumnRenamed("entity_id", "subject")
      .withColumnRenamed("canonical_id", "s_canon"))
    val oMap = broadcast(canonicalMap
      .withColumnRenamed("entity_id", "object")
      .withColumnRenamed("canonical_id", "o_canon"))
    triples
      .join(sMap, Seq("subject"), "left")
      .join(oMap, Seq("object"), "left")
      .withColumn("subject", coalesce(col("s_canon"), col("subject")))
      .withColumn("object", coalesce(col("o_canon"), col("object")))
      .drop("s_canon", "o_canon")
  }
}
