package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties for the sketching primitives
  * (SURVEY.md §5d). Sampling loop is hand-rolled (no scalatestplus bridge in
  * the offline cache).
  */
class TextFunctionsSpec extends SparkSpec {

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    .map(_.take(30))

  private def forAll[A](gen: Gen[A], n: Int = 20)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private def evalOn(words: Seq[String])(c: org.apache.spark.sql.Column): Any = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(words.mkString(" "))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .select(c.as("out")).collect()(0).get(0)
  }

  test("bigram shingles: n distinct tokens in a row of n words → ≤ n-1 shingles") {
    forAll(wordGen) { words =>
      whenever(words.size >= 2) {
        val n = evalOn(words)(size(bigramShingles(spaceTokens(col("text")))))
          .asInstanceOf[Int]
        assert(n >= 1 && n <= words.size - 1)
      }
    }
  }

  test("jaccard: identical arrays → 1.0; disjoint → 0.0") {
    val one = evalOn(Seq("a", "b", "c"))(
      jaccard(array_distinct(spaceTokens(col("text"))),
        array_distinct(spaceTokens(col("text"))))).asInstanceOf[Double]
    assert(one == 1.0)
    val zero = evalOn(Seq("a", "b"))(
      jaccard(array(lit("a"), lit("b")), array(lit("x"), lit("y"))))
      .asInstanceOf[Double]
    assert(zero == 0.0)
  }

  test("minhash: signature has k entries; identical inputs → identical sigs") {
    forAll(wordGen) { words =>
      whenever(words.size >= 2) {
        val sig = evalOn(words)(
          minhashSignature(bigramShingles(spaceTokens(col("text"))), 16))
          .asInstanceOf[scala.collection.Seq[Long]]
        val sig2 = evalOn(words)(
          minhashSignature(bigramShingles(spaceTokens(col("text"))), 16))
          .asInstanceOf[scala.collection.Seq[Long]]
        assert(sig.size == 16 && sig == sig2)
      }
    }
  }

  test("cosine: v·v/|v||v| == 1 for unit-scaled vectors") {
    val v = array((1 to 8).map(i => lit(i.toDouble)): _*)
    val c = evalOn(Seq("x"))(cosine(v, v)).asInstanceOf[Double]
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("wc tokens: ASCII behavior matches reference semantics (non-alpha splits)") {
    val got = evalOn(Seq("Hello,world_123foo", "Bar!baz"))(
      graft.operators.WordCount.tokens(col("text")))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSeq == Seq("hello", "world", "foo", "bar", "baz"))
  }
}
