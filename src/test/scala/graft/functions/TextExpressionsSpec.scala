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

  test("minhash_sig and jaccard_sim are SQL-callable after registration") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT jaccard_sim(array('a b', 'b c'), array('a b', 'b c')) AS j,
                size(minhash_sig(array('a b', 'b c'), 16)) AS m""").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getInt(1) === 16)
    // SQL form equals the Column form bit-for-bit
    val viaCol = Seq(1).toDF("x")
      .select(TextExpressions.minhashSig(array(lit("a b"), lit("b c")), 16))
      .as[Seq[Long]].head()
    val viaSql = spark.sql("SELECT minhash_sig(array('a b', 'b c'), 16)")
      .as[Seq[Long]].head()
    assert(viaCol === viaSql)
  }
}
