package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import TextExpressions.normalizeText

  private val composed = "Café"      // precomposed é
  private val combining = "Café"    // e + combining acute

  test("NFC unifies composed and combining forms; STRIP removes diacritics") {
    val df = Seq((composed, combining)).toDF("a", "b")
    val row = df.select(
      normalizeText(col("a")).as("na"),
      normalizeText(col("b")).as("nb"),
      normalizeText(col("a"), "strip").as("sa"),
      normalizeText(col("b"), "strip").as("sb")
    ).as[(String, String, String, String)].head()
    assert(row._1 === row._2)
    assert(row._3 === "Cafe")
    assert(row._4 === "Cafe")
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    val df = Seq(("ﬁle Ａ")).toDF("s") // ﬁ ligature, fullwidth A
    val out = df.select(normalizeText(col("s"), "nfkc")).as[String].head()
    assert(out === "file A")
  }

  test("text_normalize is registered for SQL with an optional mode literal") {
    val out = spark.sql(
      s"SELECT text_normalize('$combining') = text_normalize('$composed') AS eq, " +
        s"text_normalize('$combining', 'strip') AS st")
      .as[(Boolean, String)].head()
    assert(out._1)
    assert(out._2 === "Cafe")
  }

  test("null-safe and invalid mode rejected") {
    val out = Seq(Option.empty[String]).toDF("s")
      .select(normalizeText(col("s"))).as[Option[String]].head()
    assert(out.isEmpty)
    intercept[IllegalArgumentException] {
      normalizeText(lit("x"), "bogus")
    }
  }
}
