package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinGramHash, MinHashSig}
import graft.plans.AsOf

/** Seeded property tests for the native operators beyond the corpus
  * equivalence specs: randomized unicode text for the expressions, and
  * randomized keyed event streams (with nulls and boundary ties) for
  * the as-of operator vs an in-memory reference implementation.
  */
class NativeExprPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  /** Deterministic sampler (scalatestplus isn't on the offline
    * classpath; fixed seed chain, same coverage every run).
    */
  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(4242L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    chars <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ü', '中', '文', 'あ'),
      1 -> Gen.oneOf("🙂", "🎉").map(_.charAt(0)))) // lone surrogates too
  } yield chars.mkString

  test("min_gram_hash equals HOF formulation on random unicode (batched)") {
    import spark.implicits._
    val samples = scala.collection.mutable.ArrayBuffer[String]()
    forAll(textGen, n = 200)(samples += _)
    val df = samples.toSeq.toDF("text")
      .filter(length(col("text")) >= 8)
      .withColumn("native", MinGramHash.minGramHash(col("text"), 8, 200))
      .withColumn("hof", expr(
        """aggregate(
          |  transform(sequence(1, least(length(text), 200) - 7),
          |    i -> cast(conv(substr(md5(substr(text, i, 8)), 1, 15), 16, 10)
          |              as bigint)),
          |  cast(9223372036854775807 as bigint), (acc, h) -> least(acc, h))"""
          .stripMargin))
    val diff = df.filter(col("native") =!= col("hof"))
    assert(diff.isEmpty,
      s"diverged on:\n${diff.select("text").limit(3).collect().mkString("\n")}")
    assert(df.count() > 50, "generator produced too few 8+-char samples")
  }

  test("minhash_sig equals explode+groupBy on random token arrays") {
    import spark.implicits._
    val arrGen: Gen[Seq[String]] = for {
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, Gen.identifier.map(_.take(6)))
    } yield toks
    val samples = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    forAll(arrGen, n = 120)(samples += _)
    val df = samples.toSeq.zipWithIndex.toDF("shingles", "id")
    val native = df.select(col("id"),
      MinHashSig.minhashSig(col("shingles"), 8).as("sig"))
    val declarative = df
      .select(col("id"), explode(col("shingles")).as("s"))
      .withColumn("h", graft.functions.CrossHash.h60(col("s")))
      .groupBy("id")
      .agg(min(graft.functions.CrossHash.universal(col("h"), 0)).as("m0"),
        (1 until 8).map(j =>
          min(graft.functions.CrossHash.universal(col("h"), j)).as(s"m$j")): _*)
      .select(col("id"), array((0 until 8).map(j => col(s"m$j")): _*).as("sig"))
    val joined = native.as("n").join(declarative.as("d"), "id")
      .filter(col("n.sig") =!= col("d.sig"))
    assert(joined.isEmpty)
  }

  test("as-of operator equals an in-memory reference on random streams") {
    import spark.implicits._
    val rowsGen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Long)])] = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      // small key/ts domains force key collisions, boundary ties, and
      // keys present on only one side
      l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
    } yield (l, r.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

    forAll(rowsGen, n = 40) { case (lRows, rRows) =>
      // scale to whole seconds: micros < 1000 would collapse to 0 in
      // Timestamp.getTime (millis) and the comparison key would alias
      val left = lRows.toDF("k", "t")
        .select(col("k"), timestamp_micros(col("t") * 1000000L).as("t"))
      val right = rRows.toDF("k2", "t2", "rid")
        .select(col("k2"), timestamp_micros(col("t2") * 1000000L).as("t2"),
          col("rid"))
      val got = AsOf.join(left, right, "k", "k2", "t", "t2")
        .select(col("k"), col("t"), col("rid"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sorted
      // reference: for each left row, the matching right rows are those
      // with equal key and t2 <= t; pick max t2, ties broken by the
      // operator's total order = max remaining columns (rid)
      val expected = lRows.map { case (k, t) =>
        val ms = rRows.filter { case (k2, t2, _) => k2 == k && t2 <= t }
        val rid = if (ms.isEmpty) -1L
          else { val mt = ms.map(_._2).max
            ms.filter(_._2 == mt).map(_._3).max }
        (k, t * 1000, rid) // seconds -> Timestamp.getTime millis
      }.sorted
      assert(got.toSeq == expected,
        s"diverged for left=$lRows right=$rRows:\n got=${got.toSeq}\n exp=$expected")
    }
  }
}
