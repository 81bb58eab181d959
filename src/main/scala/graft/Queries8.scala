package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 query surface, part 2: graph centrality, dictionary
  * tagging, and curation observability. Oracle-parity rules as in
  * [[Queries]]/[[Queries2]].
  */
object Queries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------ q98_pagerank
  /** Weighted PageRank ([[graft.operators.Graphs.pageRank]]) over the
    * nation-level trade graph: an edge per (customer nation → supplier
    * nation) weighted by lineitem count, five damped iterations with
    * exact dangling redistribution, ranks joined back to nation names.
    * The graph build is the heavy half at scale (two fact-fact joins +
    * a map-side-combined fold to ≤625 edges); the iterations
    * themselves are the distributed part of the operator — equi-join
    * on `src`, hash-agg on `dst`, per-round pins — sized here at 25
    * nodes but shaped for the 10⁸-node host graphs of web curation.
    * The oracle unrolls all five iterations as CTE triples (dangling
    * mass, contributions, rank update), replaying the operator's
    * integer-nanos arithmetic step-for-step — exact BIGINT half-up
    * divisions, no per-iteration float rounding to drift cross-engine.
    */
  val q98Pagerank = {
    val Iters = 5
    def iterCtes(i: Int): String = {
      val p = if (i == 1) "r0" else s"r${i - 1}"
      s"""d$i AS (
          SELECT coalesce(CAST((2 * SUM(rank_n) + any_value(nl))
                   // (2 * any_value(nl)) AS BIGINT), 0) AS dc
          FROM $p, nn WHERE node NOT IN (SELECT DISTINCT src FROM ew)),
        c$i AS (
          SELECT dst, CAST(SUM((rank_n * ratio_n + 500000000)
                   // 1000000000) AS BIGINT) AS s
          FROM ew JOIN $p ON ew.src = $p.node GROUP BY 1),
        r$i AS (
          SELECT node,
                 CAST((CAST(6000000000 AS BIGINT) + 20 * nl) // (2 * 20 * nl)
                   + (2 * 17 * (coalesce(s, 0) + dc) + 20) // (2 * 20)
                   AS BIGINT) AS rank_n
          FROM nodes LEFT JOIN c$i ON nodes.node = c$i.dst, nn, d$i)"""
    }
    QueryDef(
      "q98_pagerank",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Graphs
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
        val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .select(c("c_nationkey").as("src"), su("s_nationkey").as("dst"),
            lit(1.0).as("w"))
        val pr = Graphs.pageRank(edges, "src", "dst", "w", iters = Iters)
        pr.join(t(s, dir, "nation"), pr("node") === col("n_nationkey"))
          .select($"n_name".as("nation"), $"rank")
          .orderBy($"rank".desc, $"nation")
      },
      Some(s"""
        WITH e0 AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                 CAST(count(*) AS DOUBLE) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        outw AS (
          SELECT src, CAST(SUM(CAST(w AS DECIMAL(27,12))) AS DOUBLE) AS tw
          FROM e0 GROUP BY 1),
        ew AS (
          SELECT src, dst,
                 CAST(round(1000000000.0 * w / tw) AS BIGINT) AS ratio_n
          FROM e0 JOIN outw USING (src)),
        nodes AS (SELECT src AS node FROM ew UNION SELECT dst FROM ew),
        nn AS (SELECT count(*) AS nl FROM nodes),
        r0 AS (
          SELECT node, CAST((2 * 1000000000 + nl) // (2 * nl) AS BIGINT)
                   AS rank_n
          FROM nodes, nn),
        ${(1 to Iters).map(iterCtes).mkString(",\n        ")}
        SELECT n.n_name AS nation,
               CAST(r.rank_n AS DOUBLE) / 1000000000.0 AS rank
        FROM r$Iters r JOIN nation n ON n.n_nationkey = r.node
        ORDER BY rank DESC, nation"""))
  }

  // ---------------------------------------------------------- q99_dict_tagger
  /** Dictionary tagging over the corpus
    * ([[graft.functions.MultiPatternCounts]]): per-pattern OVERLAPPING
    * occurrence totals and affected-document counts for a fixed phrase
    * dictionary, matched by one Aho–Corasick pass per document instead
    * of K per-pattern scans — the blocklist/taxonomy-tagger shape
    * where the dictionary is 10⁴ phrases at production scale and
    * re-scanning the corpus per pattern is the non-starter. The
    * dictionary deliberately contains a sub-phrase of another entry
    * ("join" ⊂ "merge join") and a self-overlapping phrase ("batch
    * batch"), so the oracle must count POSITIONALLY (`substr(text, i,
    * len(p)) = p` over every start) — `replace`-division undercounts
    * both. Scale shape: one narrow codegen'd pass fused into the scan,
    * a K-wide posexplode collapsed by map-side partial agg to K rows,
    * pattern names attached by broadcast.
    */
  val q99DictTagger = {
    val Pats = Seq("batch batch", "merge join", "join", "scan", "the", "window")
    QueryDef(
      "q99_dict_tagger",
      (s, dir) => {
        import s.implicits._
        import graft.functions.MultiPatternCounts
        import org.apache.spark.sql.graftcolumn
        val counted = t(s, dir, "documents")
          .select($"doc_id", graftcolumn(
            MultiPatternCounts(graftcolumn.expr($"text"), Pats)).as("c"))
          .select($"doc_id", posexplode($"c"))
          .toDF("doc_id", "pi", "n")
        val names = Pats.zipWithIndex.map { case (p, i) => (i, p) }
          .toDF("pi", "pattern")
        counted.groupBy($"pi")
          .agg(sum($"n").as("n_occ"),
            sum(when($"n" > 0, 1L).otherwise(0L)).as("n_docs"))
          .join(broadcast(names), "pi")
          .select($"pattern", $"n_occ", $"n_docs")
          .orderBy($"pattern")
      },
      Some(s"""
        WITH pats AS (
          SELECT * FROM (VALUES ${Pats.map(p => s"('$p')").mkString(", ")})
            AS t(pattern)),
        hits AS (
          SELECT d.doc_id, p.pattern
          FROM documents d
          CROSS JOIN pats p,
          unnest(range(1, length(d.text) - length(p.pattern) + 2)) AS u(i)
          WHERE substr(d.text, CAST(i AS INTEGER), length(p.pattern))
                  = p.pattern),
        agg AS (
          SELECT pattern, CAST(count(*) AS BIGINT) AS n_occ,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM hits GROUP BY 1)
        SELECT p.pattern, coalesce(a.n_occ, 0) AS n_occ,
               coalesce(a.n_docs, 0) AS n_docs
        FROM pats p LEFT JOIN agg a USING (pattern)
        ORDER BY p.pattern"""))
  }

  def all: Seq[QueryDef] = Seq(q98Pagerank, q99DictTagger)
}
