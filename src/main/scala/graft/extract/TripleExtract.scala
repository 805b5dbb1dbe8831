package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures

/** Batched pattern-based triple extraction (north_star "batched
  * pattern/OpenIE-style triple extraction").
  *
  * The closed predicate vocabulary mirrors the reference's "choose ONLY
  * from these predicates" LLM contract
  * (/root/reference/Edge_Assignor.ipynb cell 12 l.30-36): a sentence
  * yields a candidate assertion iff it matches
  * `<alias> <verb-phrase> <alias>` with a vocabulary verb phrase.
  *
  * Everything is declarative Column logic — posexplode + regexp_extract
  * + a lead() window for the disambiguation context — so Catalyst keeps
  * the whole stage in codegen and pushes the lang filter into the scan.
  */
object TripleExtract {

  /** Verb alternation, longest-first so multiword verbs win. */
  private val verbs: Seq[(String, String)] =
    Fixtures.predicateSpecs.map(p => p.verb -> p.curie).sortBy(-_._1.length)

  private val sentenceRe =
    s"^([A-Za-z0-9]+(?: [A-Za-z0-9]+)*?) (${verbs.map(_._1).mkString("|")}) ([A-Za-z0-9]+(?: [A-Za-z0-9]+)*)$$"

  /** verb surface form -> predicate CURIE as a codegen'd when-chain. */
  private def verbToCurie(verb: Column): Column =
    verbs.foldLeft(lit(null: String)) { case (acc, (v, curie)) =>
      when(verb === v, lit(curie)).otherwise(acc)
    }

  /** pages -> assertions(url, sent_idx, subj_alias, predicate, obj_alias,
    * context). Context = tokens of the following sentence (the fixture
    * always emits a keyword filler sentence after each assertion).
    *
    * The "next sentence" lookup is done against the pre-explode sentence
    * array (element_at), NOT a lead() window — a window would shuffle the
    * full text corpus by url; this stays a narrow dependency.
    */
  def assertions(pages: DataFrame): DataFrame = {
    pages
      .filter(col("lang") === "en") // pushed into the scan
      .withColumn("sents", split(regexp_replace(col("text"), "\\.$", ""), "\\. "))
      .select(col("url"), col("sents"),
        posexplode(col("sents")).as(Seq("sent_idx", "sentence")))
      .withColumn("next_sentence",
        coalesce(element_at(col("sents"), col("sent_idx") + 2), lit("")))
      .withColumn("subj_alias", regexp_extract(col("sentence"), sentenceRe, 1))
      .withColumn("verb", regexp_extract(col("sentence"), sentenceRe, 2))
      .withColumn("obj_alias", regexp_extract(col("sentence"), sentenceRe, 3))
      .filter(col("subj_alias") =!= "")
      .withColumn("predicate", verbToCurie(col("verb")))
      .withColumn("context", split(col("next_sentence"), " "))
      .select("url", "sent_idx", "subj_alias", "predicate", "obj_alias", "context")
  }
}
