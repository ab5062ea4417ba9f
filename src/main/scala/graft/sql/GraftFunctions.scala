package graft.sql

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions._
import graft.index.NearestCentroids

/**
 * SQL surface: every graft expression as a `vec_*` / hash function, so
 * `spark.sql("SELECT vec_l2sq(a, b) ...")` works — the analog of the
 * reference's SQL-level functions (faiss_search et al. are table
 * functions there; here scalar/agg expressions compose with all of
 * Spark SQL).
 *
 * Two registration paths:
 *  - config: `spark.sql.extensions=graft.sql.GraftExtensions`
 *  - runtime: `GraftFunctions.registerAll(spark)`
 */
object GraftFunctions {

  // note: SQL parses `3.0` as a Decimal literal — accept all numeric shapes
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case Literal(v: org.apache.spark.sql.types.Decimal, _) if v.toDouble == v.toLong.toDouble => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) if v.toDouble == v.toLong.toDouble => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }
  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(s"$what must be a double literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val metricFns = Seq(
      "vec_l2sq" -> "l2sq", "vec_l2" -> "euclidean", "vec_ip" -> "ip",
      "vec_cosine_dist" -> "cosine", "vec_l1" -> "l1", "vec_linf" -> "linf",
      "vec_canberra" -> "canberra", "vec_braycurtis" -> "braycurtis",
      "vec_jensenshannon" -> "jensenshannon", "vec_jaccard" -> "jaccard"
    ).map { case (fn, metric) =>
      fn -> { (args: Seq[Expression]) =>
        VectorDistance(args(0), args(1), VectorMath.metricId(metric), 2.0): Expression
      }
    }
    metricFns ++ Seq[(String, Seq[Expression] => Expression)](
      "vec_lp" -> (args => VectorDistance(args(0), args(1), VectorMath.LP, litDouble(args(2), "p"))),
      "vec_topk" -> (args =>
        TopKByDistance(args(1), args(2), litInt(args(0), "k"),
          ascending = args.lift(3).forall { case Literal(b: Boolean, _) => b; case _ => true })),
      "minhash_signature" -> (args =>
        MinHashSignature(args(0), litInt(args(1), "numHashes"), litLong(args(2), "seed"))),
      "simhash64" -> (args => SimHash64(args(0), litLong(args.lift(1).getOrElse(Literal(42L)), "seed"))),
      "fingerprint64" -> (args => Fingerprint64(args(0))),
      "vec_normalize" -> (args => VectorNormalize(args(0))),
      "vec_sign_bits" -> (args => SignBits(args(0))),
      "sorted_intersect_count" -> (args => SortedIntersectCount(args(0), args(1))),
      "top_shingle_ratio" -> (args =>
        graft.text.TopShingleRatio(args(0), litInt(args(1), "n"))),
      "dup_shingle_fraction" -> (args =>
        graft.text.DupShingleFraction(args(0), litInt(args(1), "n"))),
      "hyperplane_buckets" -> (args =>
        HyperplaneBuckets(args(0), litInt(args(1), "bands"), litInt(args(2), "bitsPerBand"),
          litLong(args.lift(3).getOrElse(Literal(42L)), "seed"))))
  }

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => GraftBridge.registerFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        b))
    }
}
