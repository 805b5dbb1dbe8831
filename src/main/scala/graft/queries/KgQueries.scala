package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents
import graft.core.Ids
import graft.prune.{AntiJoinReconcile, Splits}
import graft.queries.Q._

/** Driver-contract queries for the KG-shaped operator inventory
  * (SURVEY.md §2.2-2.7), each DuckDB-verifiable over /root/testdata.
  */
object KgQueries {

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------- scans / projections
    QueryDef("q01_scan_project",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)),

    // ------------------------------------------------- filters (§2.2)
    QueryDef("q02_filter_empty_pred",
      // empty-predicate mask: isnull or trim('')==''
      // (Edge_Assignor.ipynb cell 12 l.20-22)
      (s, d) => triples(s, d)
        .withColumn("predicate",
          when(col("predicate") === "view", lit(" ")).otherwise(col("predicate")))
        .filter(col("predicate").isNull || trim(col("predicate")) === "")
        .select("subject", "object"),
      Some(s"""SELECT subject, "object"
              |FROM (SELECT subject,
              |             CASE WHEN predicate = 'view' THEN ' ' ELSE predicate END AS predicate,
              |             "object"
              |      FROM ($triplesSql) t) x
              |WHERE predicate IS NULL OR trim(predicate) = ''""".stripMargin)),

    QueryDef("q03_filter_target_set",
      // subject OR object in a literal target set (extract.py:94-98)
      (s, d) => triples(s, d)
        .filter(col("subject").isin("U:1", "U:2", "U:3") ||
          col("object").isin("E:7", "E:9"))
        .select("subject", "predicate", "object").distinct(),
      Some(s"""SELECT DISTINCT subject, predicate, "object"
              |FROM ($triplesSql) t
              |WHERE subject IN ('U:1','U:2','U:3') OR "object" IN ('E:7','E:9')""".stripMargin)),

    QueryDef("q04_distinct_nonempty_pred",
      (s, d) => triples(s, d)
        .filter(trim(col("predicate")) =!= "")
        .select("predicate").distinct(),
      Some(s"""SELECT DISTINCT predicate FROM ($triplesSql) t
              |WHERE trim(predicate) <> ''""".stripMargin)),

    QueryDef("q05_semijoin_known",
      // keep triples whose subject appears as a 'signup' subject
      // (known-entity filter, datasets.py:43-56)
      (s, d) => {
        val t = triples(s, d)
        val known = t.filter(col("predicate") === "signup").select("subject").distinct()
        t.join(known, Seq("subject"), "left_semi")
          .select("subject", "predicate", "object").distinct()
      },
      Some(s"""WITH t AS ($triplesSql)
              |SELECT DISTINCT subject, predicate, "object" FROM t
              |WHERE subject IN (SELECT subject FROM t WHERE predicate = 'signup')""".stripMargin)),

    // --------------------------------------------------- joins (§2.3)
    QueryDef("q06_antijoin_reconcile",
      // the reference's named core op (Edge_Assignor.ipynb cell 20)
      (s, d) => {
        val t = triples(s, d)
        val orig = t.groupBy("subject", "object").agg(min("predicate").as("predicate"))
          .select("subject", "predicate", "object")
        val refilled = t.filter(col("predicate") === "purchase")
          .select(col("subject"), lit("refilled").as("predicate"), col("object"))
          .distinct()
        AntiJoinReconcile.reconcile(orig, refilled)
      },
      Some(s"""WITH t AS ($triplesSql),
              |orig AS (SELECT subject, min(predicate) AS predicate, "object"
              |         FROM t GROUP BY subject, "object"),
              |refilled AS (SELECT DISTINCT subject, 'refilled' AS predicate, "object"
              |             FROM t WHERE predicate = 'purchase')
              |SELECT o.subject, o.predicate, o."object" FROM orig o
              |WHERE NOT EXISTS (SELECT 1 FROM refilled r
              |                  WHERE r.subject = o.subject AND r."object" = o."object")
              |UNION ALL
              |SELECT r.subject, r.predicate, r."object" FROM refilled r
              |WHERE EXISTS (SELECT 1 FROM orig o
              |              WHERE o.subject = r.subject AND o."object" = r."object")""".stripMargin)),

    QueryDef("q07_node_lookup_join",
      // edge endpoints -> metadata via broadcast dims
      // (create_cytoscape_files.py:80-92)
      (s, d) => table(s, d, "customer")
        .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name")),
      Some("""SELECT c_custkey, c_name, n_name, r_name
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey""".stripMargin)),

    QueryDef("q08_membership_count",
      // backbone ⊆ merged semi-join count (src/gnn/extract.py:213-225)
      (s, d) => {
        val t = triples(s, d).select("subject", "predicate", "object").distinct()
        val backbone = t.filter(col("predicate") === "error")
        backbone.join(t, Seq("subject", "predicate", "object"), "left_semi")
          .agg(count(lit(1)).as("n_present"))
      },
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x)
              |SELECT count(*) AS n_present FROM t b
              |WHERE b.predicate = 'error'
              |  AND EXISTS (SELECT 1 FROM t m WHERE m.subject = b.subject
              |              AND m.predicate = b.predicate AND m."object" = b."object")""".stripMargin)),

    QueryDef("q09_negcheck_antijoin",
      // corrupted candidate must NOT be an existing edge
      // (graph_sampler.py:80)
      (s, d) => {
        val t = triples(s, d).select("subject", "predicate", "object").distinct()
        val candidates = triples(s, d).select(
          col("subject"), col("predicate"),
          concat(lit("E:"), ((col("event_id") + 1) % 100).cast("string")).as("object"))
          .distinct()
        candidates.join(t, Seq("subject", "predicate", "object"), "left_anti")
      },
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x),
              |cand AS (SELECT DISTINCT subject, predicate,
              |                'E:' || CAST((event_id + 1) % 100 AS VARCHAR) AS "object"
              |         FROM ($triplesSql) y)
              |SELECT c.* FROM cand c
              |WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.subject = c.subject
              |                  AND t.predicate = c.predicate AND t."object" = c."object")""".stripMargin)),

    QueryDef("q10_dict_encode",
      // deterministic dense entity ids (data_utils.py:23-45 distributed)
      (s, d) => Ids.dictionary(
        triples(s, d).select(col("subject").as("entity"))
          .unionAll(triples(s, d).select(col("object").as("entity"))),
        "entity"),
      Some(s"""WITH t AS ($triplesSql),
              |e AS (SELECT DISTINCT entity FROM
              |      (SELECT subject AS entity FROM t UNION ALL SELECT "object" FROM t) u)
              |SELECT entity, row_number() OVER (ORDER BY entity) AS id FROM e""".stripMargin)),

    QueryDef("q11_salted_join_equiv",
      // salted SMJ == plain join (north_star skew discipline): degree of
      // each subject joined back onto distinct triples
      (s, d) => {
        val t = triples(s, d).select("subject", "predicate", "object").distinct()
        val deg = t.groupBy(col("subject")).agg(count(lit(1)).as("subj_degree"))
        graft.link.SkewJoin.salted(t, deg, Seq("subject"), 8,
          Seq(col("subject"), col("predicate"), col("object")))
      },
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x),
              |deg AS (SELECT subject, count(*) AS subj_degree FROM t GROUP BY subject)
              |SELECT t.subject, t.predicate, t."object", deg.subj_degree
              |FROM t JOIN deg USING (subject)""".stripMargin)),

    // -------------------------------------------- aggregations (§2.4)
    QueryDef("q12_pred_counts",
      (s, d) => triples(s, d).groupBy("predicate").agg(count(lit(1)).as("n")),
      Some(s"""SELECT predicate, count(*) AS n FROM ($triplesSql) t GROUP BY predicate""")),

    QueryDef("q13_degree",
      // undirected node degree (prepare_meta_data.py:21-26)
      (s, d) => triples(s, d).select(col("subject").as("node"))
        .unionAll(triples(s, d).select(col("object").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree")),
      Some(s"""WITH t AS ($triplesSql)
              |SELECT node, count(*) AS degree FROM
              |(SELECT subject AS node FROM t UNION ALL SELECT "object" FROM t) u
              |GROUP BY node""".stripMargin)),

    QueryDef("q14_group_stats",
      // mean/min/max/stddev summary (graph_sampler.py:176-222)
      (s, d) => table(s, d, "lineitem").groupBy("l_returnflag").agg(
        round(avg("l_quantity"), 6).as("avg_qty"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        round(stddev_pop("l_quantity"), 6).as("sd_qty"),
        count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  min(l_quantity) AS min_qty,
             |  max(l_quantity) AS max_qty,
             |  round(stddev_pop(l_quantity), 6) AS sd_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    QueryDef("q15_auc",
      // rank-statistic AUC (trainer.py:143-144 reinterpreted):
      // label = value > 100, score as in Q.scored; deterministic
      // row_number tiebreak on event_id keeps both engines identical.
      // EXACT INTEGER output (round 1 shipped a rounded double whose
      // 6dp half-boundary hashed differently across engines): p, n, the
      // positive rank-sum, and the AUC in micro-units via integral
      // division — U = rank_sum - p(p+1)/2, auc_micro = U*1e6 div (p*n).
      (s, d) => {
        val t = triples(s, d)
          .withColumn("pos", (col("value") > 100.0).cast("int"))
          .withColumn("score", (col("event_id") % 100).cast("double") / 100.0)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score"), col("event_id"))))
        t.agg(
          sum(col("pos")).cast("long").as("p"),
          sum(lit(1) - col("pos")).cast("long").as("n"),
          sum(when(col("pos") === 1, col("rnk")).otherwise(0)).cast("long")
            .as("rank_sum_pos"))
          .select(col("p"), col("n"), col("rank_sum_pos"),
            expr("((rank_sum_pos - (p * (p + 1)) DIV 2) * 1000000) DIV (p * n)")
              .as("auc_micro"))
      },
      Some(s"""WITH t AS (
              |  SELECT CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS pos,
              |         CAST(event_id % 100 AS DOUBLE) / 100.0 AS score, event_id
              |  FROM ($triplesSql) x),
              |r AS (SELECT pos, row_number() OVER (ORDER BY score, event_id) AS rnk FROM t),
              |agg AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
              |               CAST(sum(1 - pos) AS BIGINT) AS n,
              |               CAST(sum(CASE WHEN pos = 1 THEN rnk ELSE 0 END) AS BIGINT) AS rank_sum_pos
              |        FROM r)
              |SELECT p, n, rank_sum_pos,
              |  ((rank_sum_pos - (p * (p + 1)) // 2) * 1000000) // (p * n) AS auc_micro
              |FROM agg""".stripMargin)),

    // ------------------------------------------------ windows (§2.5)
    QueryDef("q16_uncertainty_topk",
      // review selection (select_edges_for_review.py:26-43)
      (s, d) => scored(s, d)
        .withColumn("uncertainty", round(lit(1.0) - abs(col("score") - 0.5) * 2.0, 6))
        .orderBy(col("uncertainty").desc, col("edge_id"))
        .limit(10)
        .select("edge_id", "score", "uncertainty"),
      Some(s"""SELECT edge_id, score,
              |       round(1.0 - abs(score - 0.5) * 2.0, 6) AS uncertainty
              |FROM ($scoredSql) se
              |ORDER BY uncertainty DESC, edge_id LIMIT 10""".stripMargin)),

    QueryDef("q17_low_conf_topk",
      // lowest-score selection (select_edges_for_review.py:107-109)
      (s, d) => scored(s, d)
        .orderBy(col("score"), col("edge_id"))
        .limit(10)
        .select("edge_id", "score"),
      Some(s"""SELECT edge_id, score FROM ($scoredSql) se
              |ORDER BY score, edge_id LIMIT 10""".stripMargin)),

    QueryDef("q18_subject_cap",
      // <= 3 objects per subject (extract.py:139-148)
      (s, d) => {
        val t = triples(s, d).select("subject", "predicate", "object").distinct()
        t.withColumn("rn", row_number().over(
          Window.partitionBy("subject").orderBy(col("object"), col("predicate"))))
          .filter(col("rn") <= 3).drop("rn")
      },
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x),
              |r AS (SELECT *, row_number() OVER
              |      (PARTITION BY subject ORDER BY "object", predicate) AS rn FROM t)
              |SELECT subject, predicate, "object" FROM r WHERE rn <= 3""".stripMargin)),

    QueryDef("q19_removal_quota",
      // per-predicate 50% blanking quota, seeded by row hash
      // (Edge_Assignor.ipynb cell 5 l.33-41; md5 replaces random.choice)
      (s, d) => {
        val t = triples(s, d).select("subject", "predicate", "object").distinct()
        val w = Window.partitionBy("predicate")
          .orderBy(md5(concat_ws("|", col("subject"), col("object"))))
        t.withColumn("rn", row_number().over(w))
          .withColumn("quota", floor(count(lit(1)).over(
            Window.partitionBy("predicate")) * 0.5).cast("long"))
          .withColumn("blanked", (col("rn") <= col("quota")).cast("int"))
          .select("subject", "predicate", "object", "blanked")
      },
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x),
              |r AS (SELECT *,
              |  row_number() OVER (PARTITION BY predicate
              |                     ORDER BY md5(subject || '|' || "object")) AS rn,
              |  CAST(floor(count(*) OVER (PARTITION BY predicate) * 0.5) AS BIGINT) AS quota
              |  FROM t)
              |SELECT subject, predicate, "object",
              |       CASE WHEN rn <= quota THEN 1 ELSE 0 END AS blanked FROM r""".stripMargin)),

    QueryDef("q20_rank_corruptions",
      // rank of each edge within its subject block, desc score, min
      // method (compute_rank_metrics.py:8-18)
      (s, d) => scored(s, d)
        .withColumn("rnk", rank().over(
          Window.partitionBy("subject").orderBy(col("score").desc)))
        .select("subject", "object", "score", "rnk"),
      Some(s"""SELECT subject, "object", score,
              |  rank() OVER (PARTITION BY subject ORDER BY score DESC) AS rnk
              |FROM ($scoredSql) se""".stripMargin)),

    QueryDef("q21_mrr_hits",
      // MRR / Hits@k over per-subject ranking; true edge = min(object)
      // per subject (test_ranking.py:504-545 protocol shape)
      (s, d) => {
        val se = scored(s, d)
        val ranked = se.withColumn("rnk", row_number().over(
          Window.partitionBy("subject").orderBy(col("score").desc, col("object"))))
        val truth = se.groupBy("subject").agg(min("object").as("object"))
        ranked.join(truth, Seq("subject", "object"))
          .agg(
            round(avg(lit(1.0) / col("rnk")), 6).as("mrr"),
            round(avg((col("rnk") <= 1).cast("double")), 6).as("hits1"),
            round(avg((col("rnk") <= 5).cast("double")), 6).as("hits5"),
            round(avg((col("rnk") <= 10).cast("double")), 6).as("hits10"))
      },
      Some(s"""WITH se AS ($scoredSql),
              |ranked AS (SELECT subject, "object",
              |  row_number() OVER (PARTITION BY subject ORDER BY score DESC, "object") AS rnk
              |  FROM se),
              |truth AS (SELECT subject, min("object") AS "object" FROM se GROUP BY subject)
              |SELECT round(avg(1.0 / rnk), 6) AS mrr,
              |       round(avg(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END), 6) AS hits1,
              |       round(avg(CASE WHEN rnk <= 5 THEN 1.0 ELSE 0.0 END), 6) AS hits5,
              |       round(avg(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END), 6) AS hits10
              |FROM ranked JOIN truth USING (subject, "object")""".stripMargin)),

    // -------------------------------- sorts / limits / set ops (§2.6)
    QueryDef("q22_sort_limit_prefix",
      // reference Cypher read shape: prefix filter + distinct + order +
      // limit (download.py:21-56)
      (s, d) => triples(s, d)
        .filter(col("subject").rlike("^U:1[0-9]$"))
        .select("subject", "predicate", "object").distinct()
        .orderBy("subject", "predicate", "object")
        .limit(100),
      Some(s"""SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) t
              |WHERE regexp_matches(subject, '^U:1[0-9]$$')
              |ORDER BY subject, predicate, "object" LIMIT 100""".stripMargin)),

    QueryDef("q23_set_intersect",
      // common pairs (cell 20 l.33)
      (s, d) => {
        val t = triples(s, d)
        t.filter(col("predicate") === "purchase").select("subject", "object")
          .intersect(t.filter(col("predicate") === "click").select("subject", "object"))
      },
      Some(s"""WITH t AS ($triplesSql)
              |SELECT subject, "object" FROM t WHERE predicate = 'purchase'
              |INTERSECT
              |SELECT subject, "object" FROM t WHERE predicate = 'click'""".stripMargin)),

    QueryDef("q24_split_assign",
      // seeded 70/15/15 split + leakage-free by construction
      // (extract.py:227-243)
      (s, d) => Splits.assign(
        triples(s, d).select("subject", "predicate", "object").distinct())
        .groupBy("split").agg(count(lit(1)).as("n")),
      Some(s"""WITH t AS (SELECT DISTINCT subject, predicate, "object" FROM ($triplesSql) x),
              |a AS (SELECT CASE
              |  WHEN substring(md5(subject || '|' || predicate || '|' || "object" || '|' || '42'), 1, 2) < 'b3' THEN 'train'
              |  WHEN substring(md5(subject || '|' || predicate || '|' || "object" || '|' || '42'), 1, 2) < 'd8' THEN 'valid'
              |  ELSE 'test' END AS split FROM t)
              |SELECT split, count(*) AS n FROM a GROUP BY split""".stripMargin)),

    // ----------------------------------------------- graph ops (§2.7)
    QueryDef("q25_undirected",
      (s, d) => {
        val e = graphEdges(s, d)
        e.unionAll(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      },
      Some(s"""WITH e AS ($graphSql)
              |SELECT src, dst FROM e
              |UNION
              |SELECT dst, src FROM e""".stripMargin)),

    QueryDef("q26_khop",
      // 2-hop BFS neighborhood of a seed (dgl_utils.py:8-31)
      (s, d) => {
        val e = graphEdges(s, d)
        val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        val h1 = und.filter(col("src") === "N:3").select(col("dst").as("node")).distinct()
        val h2 = und.join(h1, und("src") === h1("node")).select(col("dst").as("node"))
          .distinct()
        h1.unionAll(h2).distinct().filter(col("node") =!= "N:3")
      },
      Some(s"""WITH e AS ($graphSql),
              |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
              |h1 AS (SELECT DISTINCT dst AS node FROM und WHERE src = 'N:3'),
              |h2 AS (SELECT DISTINCT u.dst AS node FROM und u JOIN h1 ON u.src = h1.node)
              |SELECT DISTINCT node FROM (SELECT node FROM h1 UNION SELECT node FROM h2) x
              |WHERE node <> 'N:3'""".stripMargin)),

    QueryDef("q27_connected_components",
      // large-star/small-star CC vs recursive-CTE transitive closure
      (s, d) => ConnectedComponents.run(graphEdges(s, d)),
      Some(s"""WITH RECURSIVE e AS ($graphSql),
              |und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
              |reach(root, node) AS (
              |  SELECT a, a FROM und
              |  UNION
              |  SELECT r.root, u.b FROM reach r JOIN und u ON r.node = u.a)
              |SELECT node AS id, min(root) AS component FROM reach GROUP BY node""".stripMargin)),

    QueryDef("q28_induced_subgraph",
      // both-endpoints-in-set induced subgraph (extract.py:133-137)
      (s, d) => {
        val e = graphEdges(s, d)
        val nodes = e.select(col("src").as("node"))
          .unionAll(e.select(col("dst").as("node"))).distinct()
          .filter(col("node").rlike("^(N|R):"))
        e.join(nodes.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst")
      },
      Some(s"""WITH e AS ($graphSql),
              |nodes AS (SELECT DISTINCT node FROM
              |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u
              |  WHERE regexp_matches(node, '^(N|R):'))
              |SELECT src, dst FROM e
              |WHERE src IN (SELECT node FROM nodes) AND dst IN (SELECT node FROM nodes)""".stripMargin))
  )
}
