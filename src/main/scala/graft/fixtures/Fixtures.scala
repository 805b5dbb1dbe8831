package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core._
import graft.core.Ids.{mix64, unitDouble}

/** Deterministic KG fixture generator (FIXTURES.md F1-F8).
  *
  * Everything is a pure function of (seed, index) via splitmix64 — no
  * sequential RNG, so generation is identical across partitionings and
  * retries (SURVEY.md §7.4). The same per-page decision function feeds
  * both the pages table and the truth oracle, so expected precision /
  * recall of the full pipeline is computable exactly.
  *
  * Shapes mirror the reference data files:
  *  - triples (s,p,o) strings with CURIE ids —
  *    /root/reference/data/alzheimers_triples.csv:1
  *  - closed predicate vocabulary ("choose ONLY from these predicates",
  *    /root/reference/Edge_Assignor.ipynb cell 12)
  *  - hub-entity skew: one seed entity on ~40% of edges (the Alzheimer's
  *    hub in the reference data) — exercises salted joins.
  */
final case class FixtureConfig(nPages: Long, nEntities: Int, seed: Long = 42L) {
  require(nEntities >= 40, "need enough entities for all prefix classes")
}

object Fixtures {

  // ---------------------------------------------------------------- vocab

  /** (verb phrase in text, predicate CURIE, allowed subject prefixes,
    * allowed object prefixes, functional?). Prefix whitelists mirror
    * /root/reference/src/knowledge-graph/download.py:34-38.
    */
  final case class PredicateSpec(
      verb: String,
      curie: String,
      subjPfx: Set[String],
      objPfx: Set[String],
      functional: Boolean)

  val prefixes: Vector[String] = Vector("MONDO", "HGNC", "CHEBI", "GO", "HP")

  val predicateSpecs: Vector[PredicateSpec] = Vector(
    PredicateSpec("treats", "biolink:treats", Set("CHEBI"), Set("MONDO", "HP"), functional = false),
    PredicateSpec("causes", "biolink:causes", Set("HGNC", "MONDO"), Set("MONDO", "HP"), functional = false),
    PredicateSpec("interacts with", "biolink:interacts_with", Set("HGNC", "CHEBI"), Set("HGNC", "CHEBI"), functional = false),
    PredicateSpec("part of", "biolink:part_of", Set("GO", "HGNC"), Set("GO"), functional = false),
    PredicateSpec("located in", "biolink:located_in", Set("HGNC", "CHEBI"), Set("GO"), functional = true))

  val predicateVocab: Vector[String] = predicateSpecs.map(_.curie)

  // ------------------------------------------------------------- entities

  def entityPrefix(i: Int): String = prefixes(i % prefixes.length)
  def entityId(i: Int): String = f"${entityPrefix(i)}:${10000 + i}"
  def entityKeyword(i: Int): String = s"kw$i"

  /** Primary surface form; always present in the alias dictionary. */
  def primaryAlias(i: Int): String = s"Entity$i"

  /** Two-token synonym for every third entity (multi-token mentions). */
  def synonymAlias(i: Int): Option[String] =
    if (i % 3 == 0) Some(s"Syn$i Prime") else None

  /** Ambiguous alias shared by entities 10k and 10k+1. */
  def ambiguousAliasOf(i: Int): Option[String] =
    if (i % 10 == 0) Some(s"Amb${i / 10}")
    else if (i % 10 == 1) Some(s"Amb${i / 10}")
    else None

  def aliasRows(cfg: FixtureConfig): Seq[AliasEntry] =
    (0 until cfg.nEntities).flatMap { i =>
      val id = entityId(i)
      Seq(AliasEntry(primaryAlias(i), id, 0.9)) ++
        synonymAlias(i).map(a => AliasEntry(a, id, 0.8)) ++
        ambiguousAliasOf(i).map(a => AliasEntry(a, id, if (i % 10 == 0) 0.6 else 0.4))
    }

  def nodeRows(cfg: FixtureConfig): Seq[NodeMeta] =
    (0 until cfg.nEntities).map(i => NodeMeta(entityId(i), s"Entity $i", s"fixture entity $i ${entityKeyword(i)}"))

  def ontologyRows: Seq[OntologyRule] =
    predicateSpecs.map(p => OntologyRule(p.curie, p.subjPfx.toArray.sorted, p.objPfx.toArray.sorted, p.functional))

  /** Equivalence assertions (canonicalization input): same-prefix pairs so
    * merging never changes the type class. i%9==0 -> (i, i+5);
    * i%27==0 -> (i, i+10) creates 3-chains.
    */
  def sameAsRows(cfg: FixtureConfig): Seq[(String, String)] = {
    val n = cfg.nEntities
    (0 until n).flatMap { i =>
      val a = if (i % 9 == 0 && i + 5 < n) Seq((entityId(i), entityId(i + 5))) else Nil
      val b = if (i % 27 == 0 && i + 10 < n) Seq((entityId(i), entityId(i + 10))) else Nil
      a ++ b
    }
  }

  /** Driver-side union-find oracle for canonicalization (test-only). */
  def canonicalOracle(cfg: FixtureConfig): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    sameAsRows(cfg).foreach { case (a, b) => union(a, b) }
    (0 until cfg.nEntities).map(i => entityId(i) -> find(entityId(i))).toMap
  }

  // ------------------------------------------------------ per-page truth

  /** One generated assertion with full ground truth. */
  final case class TruthRow(
      url: String,
      sent_idx: Int,
      subj_idx: Int,
      pred_idx: Int,
      obj_idx: Int,
      expected_true: Boolean,
      lang: String)

  // memoized per (nEntities, predicate): these are consulted for every
  // generated assertion — recomputing the O(nEntities) filter per call
  // would dominate generation cost at bench scales
  private val allowedCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Char), Vector[Int]]()
  private def cached(n: Int, p: Int, kind: Char)(f: => Vector[Int]): Vector[Int] =
    allowedCache.computeIfAbsent((n, p, kind), _ => f)

  private def allowedSubjects(cfg: FixtureConfig, p: Int): Vector[Int] =
    cached(cfg.nEntities, p, 's')(
      (0 until cfg.nEntities).filter(i => predicateSpecs(p).subjPfx.contains(entityPrefix(i))).toVector)
  private def allowedObjects(cfg: FixtureConfig, p: Int): Vector[Int] =
    cached(cfg.nEntities, p, 'o')(
      (0 until cfg.nEntities).filter(i => predicateSpecs(p).objPfx.contains(entityPrefix(i))).toVector)
  private def disallowedObjects(cfg: FixtureConfig, p: Int): Vector[Int] =
    cached(cfg.nEntities, p, 'x')(
      (0 until cfg.nEntities).filter(i => !predicateSpecs(p).objPfx.contains(entityPrefix(i))).toVector)

  val domainsCount = 20

  def urlOf(j: Long): String = s"https://fixture.test/d${j % domainsCount}/page$j"

  /** Duplicate pages: every 7th-ish page republishes the previous page's
    * content under its own url (web corpora are heavily duplicated; the
    * dedup stage needs true work). Content-wise page j IS page srcOf(j);
    * the distinct-triple oracle is unchanged whether duplicates are
    * dropped or kept.
    */
  def srcOf(j: Long): Long = if (j % 7 == 3 && j > 0) j - 1 else j

  def langOf(j: Long): String = if (srcOf(j) % 17 == 0) "de" else "en"
  def tsOf(j: Long): Timestamp = {
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    new Timestamp(base + (j % domainsCount) * 86400000L + (j / domainsCount) * 60000L)
  }

  /** All assertion decisions for page j — THE shared truth function. */
  def assertionsFor(cfg: FixtureConfig, j: Long): Seq[(Int, Int, Int, Boolean, Boolean, Boolean)] = {
    // returns (subjIdx, predIdx, objIdx, expectedTrue, ambSubj, ambObj)
    val h = mix64(cfg.seed, j)
    val nAssert = (mix64(h, 1) & 0x7fffffffL).toInt % 4
    (0 until nAssert).map { a =>
      val p = (mix64(h, 10 + a * 7) & 0x7fffffffL).toInt % predicateSpecs.length
      val subs = allowedSubjects(cfg, p)
      val hub = subs.head // hub entity per predicate: ~40% of edges (F2 skew)
      val s =
        if (unitDouble(mix64(h, 20 + a * 7)) < 0.40) hub
        else subs((mix64(h, 21 + a * 7) & 0x7fffffffL).toInt % subs.size)
      val garbage = unitDouble(mix64(h, 22 + a * 7)) < 0.15
      val o =
        if (predicateSpecs(p).functional && !garbage) {
          // functional: object is a fixed function of the subject
          val objs = allowedObjects(cfg, p)
          objs((s * 31 + p) % objs.size)
        } else if (garbage) {
          val bad = disallowedObjects(cfg, p)
          bad((mix64(h, 23 + a * 7) & 0x7fffffffL).toInt % bad.size)
        } else {
          val objs = allowedObjects(cfg, p)
          objs((mix64(h, 24 + a * 7) & 0x7fffffffL).toInt % objs.size)
        }
      val ambS = ambiguousAliasOf(s).isDefined && unitDouble(mix64(h, 25 + a * 7)) < 0.3
      val ambO = ambiguousAliasOf(o).isDefined && unitDouble(mix64(h, 26 + a * 7)) < 0.3
      (s, p, o, !garbage, ambS, ambO)
    }
  }

  private def surfaceForm(i: Int, useAmb: Boolean, pick: Long): String =
    if (useAmb) ambiguousAliasOf(i).get
    else synonymAlias(i) match {
      case Some(syn) if (pick & 1L) == 1L => syn
      case _ => primaryAlias(i)
    }

  /** Sentences of page j: per assertion, the assertion sentence followed
    * by a keyword filler sentence (the disambiguation context); plus one
    * trailing filler. Pure function of (cfg, j).
    */
  def sentencesOf(cfg: FixtureConfig, j: Long): Seq[String] = {
    val h = mix64(cfg.seed, j)
    val as = assertionsFor(cfg, j)
    val core = as.zipWithIndex.flatMap { case ((s, p, o, _, ambS, ambO), a) =>
      val sa = surfaceForm(s, ambS, mix64(h, 30 + a))
      val oa = surfaceForm(o, ambO, mix64(h, 31 + a))
      Seq(
        s"$sa ${predicateSpecs(p).verb} $oa",
        s"Research on ${entityKeyword(s)} alongside ${entityKeyword(o)} continues")
    }
    // filler wording varies per page (several hash words) so unrelated
    // pages do not become MinHash near-duplicates of each other
    def w(k: Int) = java.lang.Long.toString(mix64(h, 40 + k) & 0xffffffffL, 36)
    val filler =
      if (j % 13 == 0) Seq(s"Joint work by A&B Labs noted item ${w(0)}")
      else Seq(s"Filler note ${w(0)} and ${w(1)} closes page section ${w(2)} item ${w(3)}")
    core ++ filler
  }

  def textOf(cfg: FixtureConfig, j: Long): String =
    sentencesOf(cfg, srcOf(j)).mkString(". ") + "."

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def htmlOf(cfg: FixtureConfig, j: Long): Array[Byte] = {
    val body = sentencesOf(cfg, srcOf(j))
      .map(s => s"  <p>${escapeHtml(s)}.</p>")
      .mkString("\n")
    val doc =
      s"""<html><head><title>Fixture page $j</title>
         |<style>p { margin: 0; }</style>
         |<script>var tracker = "ignore-me-$j";</script>
         |</head>
         |<body>
         |<article>
         |$body
         |</article>
         |</body></html>""".stripMargin
    doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def pageOf(cfg: FixtureConfig, j: Long): Page =
    Page(urlOf(j), tsOf(j), htmlOf(cfg, j), textOf(cfg, j), langOf(j))

  // ---------------------------------------------------------- Spark sides

  def pages(spark: SparkSession, cfg: FixtureConfig): Dataset[Page] = {
    import spark.implicits._
    spark.range(cfg.nPages).mapPartitions(_.map(j => pageOf(cfg, j)))
  }

  def truth(spark: SparkSession, cfg: FixtureConfig): Dataset[TruthRow] = {
    import spark.implicits._
    spark.range(cfg.nPages).mapPartitions(_.flatMap { j =>
      assertionsFor(cfg, srcOf(j)).zipWithIndex.map { case ((s, p, o, ok, _, _), a) =>
        TruthRow(urlOf(j), a * 2, s, p, o, ok, langOf(j))
      }
    })
  }

  def aliasDict(spark: SparkSession, cfg: FixtureConfig): Dataset[AliasEntry] = {
    import spark.implicits._
    spark.createDataset(aliasRows(cfg))
  }

  def nodes(spark: SparkSession, cfg: FixtureConfig): Dataset[NodeMeta] = {
    import spark.implicits._
    spark.createDataset(nodeRows(cfg))
  }

  def entityKeywords(spark: SparkSession, cfg: FixtureConfig): Dataset[(String, Array[String])] = {
    import spark.implicits._
    spark.createDataset((0 until cfg.nEntities).map(i => (entityId(i), Array(entityKeyword(i)))))
      .withColumnRenamed("_1", "entity_id").withColumnRenamed("_2", "keywords")
      .as[(String, Array[String])]
  }

  def ontology(spark: SparkSession, cfg: FixtureConfig): Dataset[OntologyRule] = {
    import spark.implicits._
    spark.createDataset(ontologyRows)
  }

  def sameAs(spark: SparkSession, cfg: FixtureConfig): Dataset[(String, String)] = {
    import spark.implicits._
    spark.createDataset(sameAsRows(cfg))
      .withColumnRenamed("_1", "src").withColumnRenamed("_2", "dst")
      .as[(String, String)]
  }

  /** Expected FINAL pipeline output: distinct canonical true triples from
    * `en` pages — the P/R oracle (north_rule: P/R >= 0.95 vs reference).
    */
  def expectedTriples(spark: SparkSession, cfg: FixtureConfig): Dataset[Triple] = {
    import spark.implicits._
    val canon = canonicalOracle(cfg)
    val bc = spark.sparkContext.broadcast(canon)
    spark.range(cfg.nPages).mapPartitions { it =>
      val c = bc.value
      it.flatMap { j =>
        if (langOf(j) != "en") Iterator.empty
        else assertionsFor(cfg, srcOf(j)).iterator.collect {
          case (s, p, o, true, _, _) =>
            Triple(c(entityId(s)), predicateSpecs(p).curie, c(entityId(o)))
        }
      }
    }.distinct()
  }

  // standard scales (FIXTURES.md F1)
  def tiny: FixtureConfig = FixtureConfig(nPages = 200L, nEntities = 100)
  def small: FixtureConfig = FixtureConfig(nPages = 5000L, nEntities = 200)
  def bench: FixtureConfig = FixtureConfig(nPages = 200000L, nEntities = 1000)
  /** scaling-protocol scales: large enough that compute dominates the
    * fixed per-job overheads at 32 cores (BASELINE.md measurement);
    * xxbench additionally dominates host-VM noise (±tens of seconds).
    */
  def xbench: FixtureConfig = FixtureConfig(nPages = 2000000L, nEntities = 2000)
  def xxbench: FixtureConfig = FixtureConfig(nPages = 20000000L, nEntities = 5000)
}
