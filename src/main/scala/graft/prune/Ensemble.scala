package graft.prune

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score ensembling (reference /root/reference/src/gnn/lcilp/ensembling/
  * blend.py:22-79): linear blend w1*s1 + w2*s2 + b of two scorers'
  * outputs over the same triplet set. The reference asserts the two
  * score files align row-for-row (blend.py:31-35); distributed form:
  * inner join on the triple key + count-preservation check.
  */
object Ensemble {

  def blend(a: DataFrame, b: DataFrame, w1: Double, w2: Double, bias: Double): DataFrame = {
    val key = Seq("subject", "predicate", "object")
    a.select(col("subject"), col("predicate"), col("object"), col("score").as("s1"))
      .join(b.select(col("subject"), col("predicate"), col("object"), col("score").as("s2")), key)
      .withColumn("score", round(lit(w1) * col("s1") + lit(w2) * col("s2") + lit(bias), 9))
  }

  /** blend + the reference's alignment assert. */
  def blendChecked(a: DataFrame, b: DataFrame, w1: Double, w2: Double, bias: Double): DataFrame = {
    val out = blend(a, b, w1, w2, bias)
    val (na, nb, no) = (a.count(), b.count(), out.count())
    if (na != nb || nb != no)
      throw new IllegalStateException(
        s"ensemble inputs misaligned: a=$na b=$nb blended=$no")
    out
  }
}
