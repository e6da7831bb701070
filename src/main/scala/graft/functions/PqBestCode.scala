package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmax-cosine code assignment: the index of the codebook row
  * with the highest cosine against `vec[offset, offset+subDim)`, ties to
  * the LOWEST index — one tight codegen'd loop per row.
  *
  * This replaces the expression-tree formulation
  * `array_position(scores, array_max(scores)) - 1` over
  * `array(dot(slice(v),cb_0)/.., dot(slice(v),cb_1)/.., …)`: with a
  * 64-entry codebook that tree is 64 independent `slice`+`dot`+`norm`
  * chains evaluated PER ROW — hundreds of Catalyst nodes whose generated
  * code overflows the JIT's inlining budget and re-materializes the
  * subvector slice per code (measured ~1 ms/row at dim 64 — the actual
  * bottleneck of the PQ family, q158/q159/q162, and of every k-means
  * assignment pass). Here the whole argmax is ONE expression calling one
  * loop: O(codes·subDim) multiplies on primitive arrays, no slice
  * materialization, codegen-friendly (a single static-call line in the
  * generated stage).
  *
  * Arithmetic parity (the oracle replays scores bitwise): the numerator
  * is the left-to-right sequential dot of the subvector against the code
  * row; the denominator is `sqrt(Σv²) · sqrt(Σc²)` with both sums
  * sequential; the score is `num / (normSub · normCode)` — operation for
  * operation the same IEEE chain as the expression form it replaces, and
  * strictly-greater updates reproduce `array_position(max)`'s
  * first-maximum (= lowest code) tie-break.
  *
  * Doubles as the k-means/IVF CELL assignment (`offset = 0, subDim =
  * dim`, codebook = centroid matrix): cell and code argmax are the same
  * computation at different slicing.
  */
case class PqBestCode(child: Expression, codebook: Array[Array[Double]],
    offset: Int, subDim: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "pq_best_code"

  /** Pre-computed code norms — the same sequential Σc² fold the foldable
    * `sqrt(dot(cbLit, cbLit))` constant evaluated to. */
  private lazy val norms: Array[Double] = PqBestCode.rowNorms(codebook)

  private def isFloatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_best_code expects array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    PqBestCode.best(v.asInstanceOf[ArrayData], codebook, norms, offset,
      subDim, isFloatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][]")
    val nRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    val fl = if (isFloatElems) "true" else "false"
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PqBestCode.best($x, $cbRef, $nRef, " +
        s"$offset, $subDim, $fl);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqBestCode =
    copy(child = newChild)

  // the codebook participates in equality by content, not reference —
  // case-class equals on Array compares identity, which would break
  // attribute deduplication across identical projections
  override def equals(other: Any): Boolean = other match {
    case p: PqBestCode =>
      child == p.child && offset == p.offset && subDim == p.subDim &&
        codebook.length == p.codebook.length &&
        codebook.indices.forall(i =>
          java.util.Arrays.equals(codebook(i), p.codebook(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = child.hashCode() * 31 + offset
    h = h * 31 + subDim
    codebook.foreach(r => h = h * 31 + java.util.Arrays.hashCode(r))
    h
  }
}

object PqBestCode {

  private[functions] def rowNorms(cb: Array[Array[Double]]): Array[Double] =
    cb.map { c =>
      var ss = 0.0
      var j = 0
      while (j < c.length) { ss += c(j) * c(j); j += 1 }
      math.sqrt(ss)
    }

  /** The argmax loop the generated code calls — public because generated
    * classes live outside this package. */
  def best(v: ArrayData, cb: Array[Array[Double]], norms: Array[Double],
      offset: Int, subDim: Int, isFloat: Boolean): Int = {
    var ss = 0.0
    var j = 0
    while (j < subDim) {
      val x = if (isFloat) v.getFloat(offset + j).toDouble
        else v.getDouble(offset + j)
      ss += x * x
      j += 1
    }
    val normSub = math.sqrt(ss)
    var bestK = 0
    var bestS = Double.NegativeInfinity
    var k = 0
    while (k < cb.length) {
      val c = cb(k)
      var num = 0.0
      var i = 0
      while (i < subDim) {
        val x = if (isFloat) v.getFloat(offset + i).toDouble
          else v.getDouble(offset + i)
        num += x * c(i)
        i += 1
      }
      val s = num / (normSub * norms(k))
      // the exact ordering both replaced engines use (Spark's
      // SQLOrderingUtil / DuckDB sort): values equal under primitive ==
      // (so -0.0 ties 0.0 and the FIRST wins), otherwise Double.compare
      // (so NaN outranks every finite score — a zero-norm codebook row
      // scores NaN and must win exactly like array_max ranked it, or
      // encodes diverge from the oracle replay). A plain `s > bestS`
      // breaks both edge cases.
      if (s != bestS && java.lang.Double.compare(s, bestS) > 0) {
        bestS = s; bestK = k
      }
      k += 1
    }
    bestK
  }

  /** Column-API entry point: `offset`/`subDim` select the subvector
    * (`0, dim` for whole-vector cell assignment). */
  def column(vec: Column, codebook: Array[Array[Double]], offset: Int,
      subDim: Int): Column =
    GraftSqlBridge.column(PqBestCode(GraftSqlBridge.expression(vec),
      codebook, offset, subDim))
}
