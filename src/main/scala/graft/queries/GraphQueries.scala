package graft.queries

import org.apache.spark.sql.functions._

import graft.{GraftQuery, QueryPack, Tables}
import graft.graph.PageRank

/** Graph analytics over the harness tables. The connected-components
  * dedup clusters live in `DocQueries`; this pack holds the rank-style
  * iterative algorithms.
  */
object GraphQueries extends QueryPack {

  /** PageRank over the nation-level trade graph: a directed edge
    * customer-nation -> supplier-nation for every distinct trading
    * relationship observed in lineitem x orders. The big fact-fact join
    * shuffles once on orderkey with both dimension sides broadcast; the
    * graph itself (<= 25 nodes) is tiny, so the iterations run on a
    * vector dwarfed by the scan — exactly the shape a 100 TB run has
    * (edges distilled once, then cheap iterations). Integer micro-unit
    * arithmetic makes all 5 iterations hash-replayable in DuckDB.
    */
  val nationPageRank: GraftQuery = GraftQuery(
    "pagerank_nation_trade",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val edges = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      val ranks = PageRank.pageRankMicro(edges, "src", "dst", iters = 5)
      val nation = Tables(s, dir, "nation").select("n_nationkey", "n_name")
      ranks
        .join(broadcast(nation), ranks("id") === nation("n_nationkey"))
        .select(col("n_name").as("nation"), col("rank_micro"))
        .orderBy(desc("rank_micro"), col("nation"))
    },
    Some(s"""
      WITH e AS MATERIALIZED (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      ${PageRank.oracleCtes(iters = 5)}
      SELECT nn.n_name AS nation, r5.r AS rank_micro
      FROM r5 JOIN nation nn ON nn.n_nationkey = r5.id
      ORDER BY rank_micro DESC, nation"""))

  override def queries: Seq[GraftQuery] = Seq(nationPageRank)
}
