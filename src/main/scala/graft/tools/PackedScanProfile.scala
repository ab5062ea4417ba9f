package graft.tools

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.vec
import graft.search.ListTopKScan

/**
 * Micro-bench for the CodegenFallback question on the packed scan
 * kernels (ListTopKScan / CodedTopKScan share the shape): the scan
 * expression is interpreted, so the projection stage it sits in drops
 * out of whole-stage codegen and any OTHER column in that projection
 * is interpreted too. This measures that tax directly:
 *
 *   A. packed probe stage, bare      — select(qid, explode(scan))
 *   B. packed probe stage + 1 extra  — same + an arithmetic column in
 *      the SAME projection (the worst placement a caller could pick)
 *   C. row-per-pair path             — join + codegen distance + top-k
 *      aggregate (the plan the packed path replaced)
 *
 * The tax hypothesis: companions of the scan expr are evaluated once
 * per (probe, chunk) input row — chunk granularity, thousands of
 * candidates each — so interpreted evaluation there is noise next to
 * the primitive-loop scan. Not part of the driver contract.
 */
object PackedScanProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2097152")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("GRAFT_PROFILE_SIMD").contains("1")) {
      graft.functions.VectorMath.Simd.enabled = true
      System.err.println(
        s"[psp] SIMD gate ON (available=${graft.functions.VectorMath.Simd.available})")
    }
    import spark.implicits._

    val R = sys.env.getOrElse("GRAFT_PSP_ROWS", "2000000").toLong
    val Q = sys.env.getOrElse("GRAFT_PSP_QUERIES", "10000").toLong
    val NLIST = sys.env.getOrElse("GRAFT_PSP_NLIST", "1000").toInt
    val NPROBE = 4
    val DIM = 64
    val K = 10

    def vecOf(idCol: org.apache.spark.sql.Column) = vec.vector(array(
      (0 until DIM).map(i => (pmod(xxhash64(idCol + lit(i * 131)), lit(1000)).cast("float")
        / lit(1000.0f))): _*))

    // corpus packed one row per list (R/NLIST items each), cached
    val packed = spark.range(R)
      .select(pmod(col("id"), lit(NLIST)).cast("int").as("list_id"),
        col("id").as("label"), vecOf(col("id")).as("vec"))
      .groupBy("list_id")
      .agg(collect_list(struct(col("label"), col("vec"))).as("items"))
      .cache()
    packed.count()

    // probes: each query fans out to NPROBE deterministic lists
    val probes = spark.range(Q)
      .select(col("id").as("qid"), vecOf(col("id") + lit(7777777)).as("qvec"))
      .select(col("qid"), col("qvec"), explode(array(
        (0 until NPROBE).map(p =>
          pmod(xxhash64(col("qid") + lit(p * 997)), lit(NLIST)).cast("int")): _*)).as("list_id"))
      .cache()
    probes.count()

    val scanExpr = GraftBridge.column(ListTopKScan(
      GraftBridge.expression(col("items")),
      GraftBridge.expression(col("qvec")),
      GraftBridge.expression(col("qid")),
      K, graft.functions.VectorMath.L2SQ, true, false))

    // force FULL evaluation: a bare count() lets the optimizer prune
    // unused aggregate expressions (the row path's top-k heap would be
    // dropped entirely) — sum a value derived from every output row
    def time(tag: String)(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(col("d"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"[psp] $tag%-28s min=${best}%8.3f s  (runs: ${runs.map(r => f"$r%.2f").mkString(" ")})")
      best
    }

    val joined = probes.join(packed, "list_id")
    val a = time("packed bare") {
      joined.select(col("qid"), explode(scanExpr).as("nn"))
        .select(col("nn.distance").as("d"))
    }
    val b = time("packed + extra projected") {
      // the extra column lands in the SAME projection as the scan expr,
      // so it is interpreted; evaluated once per (probe, chunk) row
      joined.select(col("qid"), explode(scanExpr).as("nn"),
        (pmod(xxhash64(col("qid")), lit(1000003)) * lit(31) + pmod(col("qid"), lit(97)))
          .cast("double").as("extra"))
        .select((col("nn.distance") + col("extra") * lit(0.0)).as("d"))
    }
    val c = time("row-per-pair + topk agg") {
      val pairs = probes.join(
        packed.select(col("list_id"), explode(col("items")).as("it"))
          .select(col("list_id"), col("it.label").as("label"), col("it.vec").as("vec")),
        "list_id")
      pairs.select(col("qid"), col("label"), vec.l2sq(col("vec"), col("qvec")).as("d"))
        .groupBy("qid").agg(vec.topk(K, col("d"), col("label"), ascending = true).as("nn"))
        .select(explode(col("nn.distance")).as("d"))
    }
    println(f"[psp] extra-column tax: ${(b / a - 1) * 100}%.1f%%  packed-vs-row speedup: ${c / a}%.1fx")
    spark.stop()
  }
}
