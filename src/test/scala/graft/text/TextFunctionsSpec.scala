package graft.text

import graft.SparkSpec
import graft.functions.hashes

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def one(col: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(col.as("r")).collect()(0).get(0)
  }

  test("tokens lowercases and splits on whitespace runs") {
    assert(one(size(TextFunctions.tokens(col("text"))), "The  Quick\tfox") === 3)
  }

  test("shingles produce n-grams, empty below n tokens") {
    val sh = one(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSeq === Seq("a b c", "b c d"))
    val short = one(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short.isEmpty)
  }

  test("winnowing: shared >= k+w-1 token run yields a shared fingerprint") {
    import spark.implicits._
    def fps(text: String): Set[Long] =
      Seq(text).toDF("text")
        .withColumn("hs", TextFunctions.shingleHashes15(TextFunctions.tokens(col("text")), 3))
        .select(TextFunctions.winnowSelect(col("hs"), 4).as("fp"))
        .collect()(0).getSeq[Long](0).toSet
    // k=3, w=4: any shared run of >= 6 tokens guarantees a shared pick
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = fps(s"one two three $shared four five")
    val b = fps(s"$shared nine ten eleven twelve thirteen")
    assert(a.intersect(b).nonEmpty, "6-token shared run must share a fingerprint")
    // below k tokens: nothing selected
    assert(fps("only two").isEmpty)
    // k <= tokens < k+w-1: one global-min window
    assert(fps("a b c d").size === 1)
    // compression: far fewer fingerprints than shingles on a long doc
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    assert(fps(long).size < 198, "winnowing must select a strict subset")
    assert(fps(long).size >= 198 / 5, "roughly 2/(w+1) of hashes survive")
  }

  test("stopword ratio and unique ratio") {
    assert(one(TextFunctions.stopwordRatio(TextFunctions.tokens(col("text"))), "the cat the dog") === 0.5)
    assert(one(TextFunctions.uniqueRatio(TextFunctions.tokens(col("text"))), "a a b b") === 0.5)
  }

  test("punct ratio counts punctuation chars") {
    assert(one(TextFunctions.punctRatio(col("text")), "ab,.") === 0.5)
  }

  test("quality score stays within [0,1]") {
    for (t <- Seq("x", "the quick brown fox is here and it is good", "!!!,,,...")) {
      val q = one(TextFunctions.qualityScore(col("text")), t).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"score $q for '$t'")
    }
  }

  test("langId picks the profile with most stopword hits, deterministic ties") {
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))),
      "the cat and the dog is in that house it seems") === "en")
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))),
      "el perro y la casa de que los es un") === "es")
    // no hits at all -> alphabetically first profile (de)
    assert(one(TextFunctions.langId(TextFunctions.tokens(col("text"))), "zzz qqq") === "de")
  }

  test("scrub replaces urls and emails, counts match") {
    val t = "see https://example.com/x?q=1 or mail bob.smith@corp.example.org now"
    assert(one(TextFunctions.scrub(col("text")), t) === "see <URL> or mail <EMAIL> now")
    assert(one(TextFunctions.urlCount(col("text")), t) === 1)
    assert(one(TextFunctions.emailCount(col("text")), t) === 1)
    assert(one(TextFunctions.scrub(col("text")), "clean text") === "clean text")
  }

  test("shinglesAll keeps repeats; repetition ratio reflects them") {
    val all = one(TextFunctions.shinglesAll(TextFunctions.tokens(col("text")), 2), "a b a b a b")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(all.toSeq === Seq("a b", "b a", "a b", "b a", "a b"))
  }

  test("fingerprint64 is deterministic and collision-separating") {
    val f1 = one(hashes.fingerprint64(col("text")), "hello world")
    val f2 = one(hashes.fingerprint64(col("text")), "hello world")
    val f3 = one(hashes.fingerprint64(col("text")), "hello worlD")
    assert(f1 === f2)
    assert(f1 !== f3)
  }

  test("topShingleRatio: native kernel matches group-by mode semantics") {
    def ratio(t: String): Any =
      one(TextFunctions.topShingleRatio(TextFunctions.tokens(col("text")), 2), t)
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> mode 3 of 5
    assert(ratio("a b a b a b") === 3.0 / 5.0)
    // all distinct bigrams -> 1/m
    assert(ratio("a b c d") === 1.0 / 3.0)
    // single bigram -> 1.0
    assert(ratio("x y") === 1.0)
    // fewer than n tokens -> NULL (group-by emits no row)
    assert(ratio("solo") === null)
    assert(ratio("") === null)
    // kernel agrees with an explode+groupBy reference on mixed docs
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the cat sat on the cat"),
      (2L, "x x x x x x"),
      (3L, "one two three four five six seven"),
      (4L, "a b a b c a b")).toDF("id", "text")
    val kernel = docs.select($"id",
        TextFunctions.topShingleRatio(TextFunctions.tokens($"text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = docs.select($"id",
        explode(TextFunctions.shinglesAll(TextFunctions.tokens($"text"), 2)).as("g"))
      .groupBy("id", "g").count()
      .groupBy("id").agg((max($"count").cast("double") / sum($"count").cast("double")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel === ref)
  }

  test("dupShingleFraction: native kernel matches group-by dup semantics") {
    def dup(t: String, n: Int = 2): Any =
      one(TextFunctions.dupShingleFraction(TextFunctions.tokens(col("text")), n), t)
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> all 5 duplicated
    assert(dup("a b a b a b") === 1.0)
    // all distinct bigrams -> 0
    assert(dup("a b c d") === 0.0)
    // "a b c a b": grams [a b, b c, c a, a b] -> 2 of 4 duplicated
    assert(dup("a b c a b") === 2.0 / 4.0)
    // below n tokens -> NULL
    assert(dup("solo") === null)
    // kernel agrees with an explode+groupBy reference
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the cat sat on the cat"),
      (2L, "x x x x x x"),
      (3L, "one two three four five six seven"),
      (4L, "a b a b c a b")).toDF("id", "text")
    val kernel = docs.select($"id",
        TextFunctions.dupShingleFraction(TextFunctions.tokens($"text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = docs.select($"id",
        explode(TextFunctions.shinglesAll(TextFunctions.tokens($"text"), 2)).as("g"))
      .groupBy("id", "g").count()
      .groupBy("id").agg(
        (sum(when($"count" >= 2, $"count").otherwise(0L)).cast("double") /
          sum($"count").cast("double")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kernel === ref)
  }

  test("minhash similarity approximates jaccard") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o q"), // high overlap
      (3L, "z y x w v u t s r q1 p2 o3 n4 m5 l6 k7")) // low overlap
      .toDF("id", "text")
    val sigs = Dedup2.sigsFor(df)
    val s = sigs.map { case (id, sig) => id -> sig }.toMap
    def sim(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(sim(s(1L), s(2L)) > 0.5)
    assert(sim(s(1L), s(3L)) < 0.3)
  }

  test("text_collocations matches a driver-side lift replay of the top-20") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("text_collocations")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length === 20)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+").toSeq)
    val bigrams = toks.filter(_.length >= 2).flatMap(t => t.zip(t.tail))
    val n = bigrams.length.toLong
    val cxy = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
    val cx = bigrams.groupBy(_._1).view.mapValues(_.length.toLong)
    val cy = bigrams.groupBy(_._2).view.mapValues(_.length.toLong)
    val expected = cxy.toSeq.collect { case ((x, y), c) if c >= 5 =>
      val lift = BigDecimal(c.toDouble * n.toDouble / (cx(x).toDouble * cy(y).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (x, y, c, lift)
    }.sortBy { case (x, y, _, lift) => (-lift, x, y) }.take(20)
    assert(rows.toSeq === expected)
  }
}

/** helper kept outside the anonymous closures (Spark serializability) */
object Dedup2 {
  import graft.dedup.Dedup
  def sigsFor(df: org.apache.spark.sql.DataFrame): Array[(Long, Array[Long])] = {
    Dedup.minhashSignatures(df, "id", "text", 64, 2, 42L)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
  }
}
