package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Round-13 replay-state machinery: the observed-ICM-rounds accumulator
 * (the LSQ oracle's bounded unroll), the built-graph snapshot hook, and
 * the exhaustivity precondition the knn_hnsw flat-oracle promotion
 * measures on its own graphs.
 */
class ReplayStateSpec extends SparkSpec {

  test("MaxAccumulator: max semantics, merge, retry-safety") {
    val a = new MaxAccumulator
    assert(a.isZero)
    a.add(3L); a.add(1L); a.add(3L) // re-observing a value (task retry) is a no-op
    assert(a.value === 3L)
    val b = new MaxAccumulator
    b.add(5L)
    a.merge(b)
    assert(a.value === 5L)
    val c = a.copy()
    assert(c.value === 5L)
    a.reset()
    assert(a.isZero && c.value === 5L)
  }

  test("encodeArrRounds: bounded-unroll idempotency — re-running ICM past the " +
    "observed fixpoint never changes the code") {
    val rnd = new scala.util.Random(7)
    val books = Array.fill(3)(Array.fill(8)(Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    (0 until 50).foreach { _ =>
      val v = Array.fill(6)(rnd.nextFloat() * 4 - 2)
      val (code, rounds) = Lsq.encodeArrRounds(v, books)
      assert(rounds >= 0 && rounds <= Lsq.IcmRounds)
      // the whole promotion argument: rounds past the fixpoint are
      // idempotent, so the full encode equals itself re-run (and the
      // oracle's `rounds`-bounded unroll equals the engine's early-exit)
      assert(Lsq.encodeArr(v, books).toSeq === code.toSeq)
    }
  }

  test("observedLsqRoundsOf: populated after the coded layout materializes, " +
    "bounded by IcmRounds, absent for non-LSQ indexes") {
    val spark = SparkSpec.session
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (0L until 128L).map(i => (i, Array.fill(8)(rnd.nextFloat()))).toDF("label", "vec")
    val qs = Seq((0L, Array.fill(8)(0.5f))).toDF("qid", "qvec")
    if (IndexCatalog.exists("t_rounds")) IndexCatalog.destroy("t_rounds")
    IndexCatalog.create("t_rounds", 8, "IDMap,LSQ2", "l2sq", Map("refine" -> "4"))
    IndexCatalog.add(data, "t_rounds")
    IndexCatalog.search("t_rounds", 3, qs).collect() // materializes the encode
    val r = IndexCatalog.observedLsqRoundsOf("t_rounds")
    assert(r.nonEmpty && r.get >= 0 && r.get <= Lsq.IcmRounds)
    if (IndexCatalog.exists("t_rounds_rq")) IndexCatalog.destroy("t_rounds_rq")
    IndexCatalog.create("t_rounds_rq", 8, "IDMap,RQ2", "l2sq", Map("refine" -> "4"))
    IndexCatalog.add(data, "t_rounds_rq")
    IndexCatalog.search("t_rounds_rq", 3, qs).collect()
    assert(IndexCatalog.observedLsqRoundsOf("t_rounds_rq").isEmpty) // RQ: no ICM
  }

  test("builtHnswGraphsOf: snapshots every shard graph under the cap, None past it") {
    val spark = SparkSpec.session
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val data = (0L until 96L).map(i => (i, Array.fill(4)(rnd.nextFloat()))).toDF("label", "vec")
    if (IndexCatalog.exists("t_graphs")) IndexCatalog.destroy("t_graphs")
    IndexCatalog.create("t_graphs", 4, "IDMap,HNSW4", "l2sq", Map("efConstruction" -> "16"))
    IndexCatalog.add(data, "t_graphs")
    IndexCatalog.search("t_graphs", 3,
      Seq((0L, Array.fill(4)(0.5f))).toDF("qid", "qvec")).collect()
    val gs = IndexCatalog.builtHnswGraphsOf("t_graphs")
    assert(gs.nonEmpty)
    assert(gs.get.map(_.labels.length).sum === 96)
    // per-shard adjacency is label-consistent (every neighbor index valid)
    gs.get.foreach { g =>
      g.adj.zipWithIndex.foreach { case (layers, i) =>
        assert(layers.length === g.levels(i) + 1)
        layers.foreach(_.foreach(nb => assert(nb >= 0 && nb < g.labels.length)))
      }
    }
    // the cap degrades to None (the rows-only path), never an error
    assert(IndexCatalog.builtHnswGraphsOf("t_graphs", maxNodes = 10).isEmpty)
    // non-graph index: None
    if (IndexCatalog.exists("t_graphs_flat")) IndexCatalog.destroy("t_graphs_flat")
    IndexCatalog.create("t_graphs_flat", 4, "IDMap,Flat", "l2sq")
    IndexCatalog.add(data, "t_graphs_flat")
    assert(IndexCatalog.builtHnswGraphsOf("t_graphs_flat").isEmpty)
  }
}
