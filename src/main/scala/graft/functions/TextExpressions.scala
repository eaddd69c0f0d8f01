package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for training-data pipelines: the same logical
  * document arrives as precomposed (é) or combining (e + U+0301) codepoints
  * — hash-based dedup misses the equivalence unless text is canonicalized
  * first. Modes: NFC (canonical compose), NFKC (compatibility — also folds
  * ligatures/width), STRIP (NFD then drop combining marks — "strip
  * accents"). Implemented as a Catalyst expression so it runs inside
  * whole-stage codegen like any built-in string function. */
object TextNormUtil {
  val NFC = 0
  val NFKC = 1
  val STRIP = 2

  private val marks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: UTF8String, mode: Int): UTF8String = {
    val str = s.toString
    val out = mode match {
      case NFC  => Normalizer.normalize(str, Normalizer.Form.NFC)
      case NFKC => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case _    => marks.matcher(Normalizer.normalize(str, Normalizer.Form.NFD)).replaceAll("")
    }
    UTF8String.fromString(out)
  }

  def modeOf(name: String): Int = name.toLowerCase match {
    case "nfc"   => NFC
    case "nfkc"  => NFKC
    case "strip" => STRIP
    case other   => throw new IllegalArgumentException(
      s"text_normalize mode must be nfc|nfkc|strip, got '$other'")
  }
}

case class NormalizeText(child: Expression, mode: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "text_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_normalize requires string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    TextNormUtil.normalize(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormUtil.normalize($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a shingle array, as ONE codegen'd expression.
  *
  * The declarative form — explode the shingles, aggregate
  * `min(xxhash64(s, i))` for i < numHashes — needs numHashes aggregate
  * buffers, which blows past the whole-stage-codegen field limit and drops
  * the aggregation to the interpreted path (measured ~12 s for 5k docs ×
  * 128 hashes even fully parallel). This expression computes the identical
  * values (seed chain `hashInt(i, hashUTF8String(s, 42))` — exactly
  * Spark's `xxhash64(s, lit(i))`) in a tight primitive loop per row: no
  * explode, no 128-buffer aggregate, no shuffle.
  */
object MinHashSigUtil {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def compute(arr: ArrayData, num: Int): ArrayData = {
    val out = new Array[Long](num)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val base = XXH64.hashUTF8String(s, 42L)
      var i = 0
      while (i < num) {
        val h = XXH64.hashInt(i, base)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigUtil.compute(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigUtil.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact Jaccard similarity of two DISTINCT-element string arrays, as one
  * codegen'd expression. The declarative `size(array_intersect)/…` routes
  * through the generic interpreted set machinery (type-dispatched element
  * reads, boxed null-check closures) at ~50 µs/pair — this is the brute-
  * force verify loop's entire cost. One specialized UTF8String hash-set
  * pass is ~10× cheaper. Value is identical: |∩| / (|a| + |b| − |∩|),
  * IEEE NaN when both sides are empty (matches 0/0 double division). */
object JaccardSimUtil {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na.toDouble + nb.toDouble - inter.toDouble)
  }
}

case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim requires (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimUtil.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardSimUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  /** NFC-normalize (default) or 'nfkc' / 'strip' a string column. */
  def normalizeText(c: Column, mode: String = "nfc"): Column =
    Bridge.column(NormalizeText(Bridge.expression(c), TextNormUtil.modeOf(mode)))

  /** MinHash signature (numHashes seeded minima) of a shingle array. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** Exact Jaccard over distinct-element string arrays (native loop). */
  def jaccardSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
}
