package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists the engine's other operators
  * emit (near-dup pairs, contact pairs, proximity joins) — starting with
  * triangle counting, the density/QA signal for duplicate and contact
  * graphs (a dup cluster that is also a triangle-rich clique is a true
  * re-upload family; a sparse star is usually boilerplate collision). */
object Graphs {

  /** Per-node triangle participation counts over an undirected edge list.
    * `edges`: (id_a, id_b), id_a < id_b, distinct (the canonical pair shape
    * every dedup/join operator here emits). Output: (id, triangles) for
    * every node in at least one triangle.
    *
    * Algorithm: DEGREE-ORDERED orientation (the Cohen / MapReduce-triangle
    * shape): every edge directs from its (degree, id)-smaller endpoint;
    * each triangle then has exactly one vertex with out-edges to the other
    * two, so enumerating out-edge wedges counts every triangle exactly
    * once — and the wedge volume Σ outdeg², the cost driver, is bounded by
    * O(m^1.5) total because oriented out-degrees are O(sqrt(m)): a
    * 10^6-degree hub contributes its fan-in to LOW-degree sources instead
    * of building 10^12 wedges. The orientation changes the plan, never the
    * count — the oracle replays the plain a<b<c triple join.
    *
    * Shape at scale: one degree aggregate, two broadcast-or-shuffle
    * equi-joins to attach degrees, the wedge self-join on src (the m^1.5
    * stage — rows are (src, dst) id pairs only), one closure equi-join
    * against the canonical edges, one explode+count. The oriented edge
    * list is pinned: it feeds both wedge sides. */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    val edges = edges0.select(col("id_a"), col("id_b")).localCheckpoint()
    val deg = edges.select(col("id_a").as("id"))
      .unionAll(edges.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("id").as("id_a"), col("deg").as("__da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("__db")), "id_b")
    // src = (degree, id)-smaller endpoint; ties fall to id_a (< id_b)
    val aFirst = col("__da") < col("__db") || (col("__da") === col("__db"))
    val dir = withDeg.select(
      when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
      when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"))
      .localCheckpoint()
    // wedges at the oriented source; e1.dst < e2.dst is already the
    // canonical (id_a, id_b) order of the closing edge
    val wedges = dir.as("e1").join(dir.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("u"), col("e2.dst").as("v"))
    val tri = wedges.join(edges,
      wedges("u") === edges("id_a") && wedges("v") === edges("id_b"))
    tri.select(explode(array(col("a"), col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }
}
