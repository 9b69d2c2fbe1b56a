package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokens: lowercases, strips punctuation, drops empties") {
    val t = one("Hello, World!!  foo-bar 42")
      .select(TextAnalysis.tokens($"text")).as[Seq[String]].head()
    assert(t === Seq("hello", "world", "foo", "bar", "42"))
  }

  test("tokenEstimate grows with long words (BPE-ish length penalty)") {
    val short = one("cat dog fox")
      .select(TextAnalysis.tokenEstimate($"text")).as[Long].head()
    val long = one("internationalization extraterritoriality compartmentalization")
      .select(TextAnalysis.tokenEstimate($"text")).as[Long].head()
    assert(short === 3)
    assert(long > 3 * 3) // 3 words but many subword pieces
  }

  test("languageId picks the dominant stopword language") {
    assert(one("the cat and the dog in the house")
      .select(TextAnalysis.languageId($"text")).as[String].head() === "en")
    assert(one("der Hund und die Katze ist nicht da")
      .select(TextAnalysis.languageId($"text")).as[String].head() === "de")
    assert(one("le chat et la maison est ne")
      .select(TextAnalysis.languageId($"text")).as[String].head() === "fr")
    assert(one("xyzzy plugh")
      .select(TextAnalysis.languageId($"text")).as[String].head() === "und")
  }

  test("fingerprint is invariant to case/punctuation/whitespace") {
    val fps = Seq("Hello  World", "hello world!", "HELLO, world")
      .map(t => one(t).select(TextAnalysis.fingerprint($"text"))
        .as[String].head())
    assert(fps.distinct.size === 1)
    val other = one("goodbye world")
      .select(TextAnalysis.fingerprint($"text")).as[String].head()
    assert(other !== fps.head)
  }

  test("fingerprint64 matches fingerprint equivalence classes") {
    val a = one("Hello World").select(TextAnalysis.fingerprint64($"text"))
      .as[Long].head()
    val b = one("hello, world").select(TextAnalysis.fingerprint64($"text"))
      .as[Long].head()
    assert(a === b)
  }

  test("qualityFeatures: ratios in [0,1], score favors clean prose") {
    val clean = "the cat and the dog sat in the house and it is a good day " * 3
    val junk = "@@@@ #### 1234 %%%% !!!! 9999 ****"
    val df = Seq((1L, clean), (2L, junk)).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFeatures(df, "text")
      .select("doc_id", "alpha_ratio", "stopword_ratio", "quality_score")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) > out(2L).getDouble(3))
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getDouble(1) >= 0 && out(id).getDouble(1) <= 1)
      assert(out(id).getDouble(2) >= 0 && out(id).getDouble(2) <= 1)
    }
  }
}
