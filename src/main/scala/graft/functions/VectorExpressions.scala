package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector kernels. Semantics are IDENTICAL to the
  * higher-order-function forms in [[VectorFunctions]] (cast each element to
  * double, accumulate left-to-right), so DuckDB oracles keep matching
  * bit-for-bit — but the loop is compiled, which is what makes
  * all-pairs/top-k scoring viable when the candidate set is 100 TB, not an
  * interpreted lambda per element.
  *
  * op ∈ dot | cosine | l2. Inputs: array<float> or array<double>.
  *
  * NULL-ELEMENT CAVEAT (deliberate): a null ELEMENT inside a vector reads
  * as 0.0 through the primitive getters — the kernels do not pay a
  * per-element isNullAt branch in the hot loop for a state the engine
  * never produces (canonical vectors and every generator emit
  * containsNull = false arrays; a null VECTOR null-propagates normally).
  * This diverges from the HOF forms, where a null element nulls the
  * aggregate: corpora ingested with genuinely null components should be
  * cleaned (`array_compact` / filter) before scoring.
  */
object VectorExpressions {
  def dot(a: Column, b: Column): Column = make(a, b, VectorKernel.Dot)
  def cosine(a: Column, b: Column): Column = make(a, b, VectorKernel.Cosine)
  def l2(a: Column, b: Column): Column = make(a, b, VectorKernel.L2)

  /** struct(scale, codes, max_err) — see [[Int8QuantizeExpr]]. */
  def int8Quantize(a: Column): Column =
    GraftColumnBridge.column(Int8QuantizeExpr(GraftColumnBridge.expression(a)))

  /** struct(idx, dist) of the nearest center — see [[NearestCenterExpr]].
    * `centers` must be sorted by the caller's center id; idx is the
    * position in that order (id-type agnostic — callers map idx back to
    * their id with a literal array lookup). */
  def nearestCenter(v: Column, centers: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestCenterExpr(GraftColumnBridge.expression(v), centers))

  /** struct(idx, residual) — nearest center plus v − center, the
    * IVF-PQ building block — see [[NearestResidualExpr]]. */
  def nearestResidual(v: Column, centers: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestResidualExpr(GraftColumnBridge.expression(v), centers))

  /** struct(max_cosine, nearest_eval_id) over a small eval embedding set —
    * see [[NearestEvalExpr]]. `ids` must be sorted ascending. */
  def nearestEval(v: Column, ids: Array[Long], vecs: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestEvalExpr(GraftColumnBridge.expression(v), ids, vecs))

  /** Spark's `round(x, 6)` for doubles, callable from generated code:
    * `BigDecimal(Double.toString(x))` (what `scala.BigDecimal(double)`
    * builds) with HALF_UP at scale 6 — NaN/±Inf pass through like Spark's
    * RoundBase. Parity with the SQL surface is pinned by RoundParitySpec. */
  def roundHalfUp6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(java.lang.Double.toString(x),
      java.math.MathContext.DECIMAL128)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def make(a: Column, b: Column, op: Int): Column =
    GraftColumnBridge.column(VectorKernel(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), op))
}

case class VectorKernel(left: Expression, right: Expression, op: Int)
  extends BinaryExpression {

  import VectorKernel._

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = op match {
    case Dot => "vec_dot"
    case Cosine => "vec_cosine"
    case L2 => "vec_l2"
  }

  private lazy val isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloatL) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (isFloatR) y.getFloat(i).toDouble else y.getDouble(i)
      op match {
        case Dot => dot += xi * yi
        case Cosine => dot += xi * yi; na += xi * xi; nb += yi * yi
        case L2 => dot += (xi - yi) * (xi - yi)
      }
      i += 1
    }
    op match {
      case Dot => dot
      case L2 => math.sqrt(dot)
      case Cosine =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) 0.0 else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloatL) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloatR) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val accum = op match {
        case Dot => s"$dot += $xi * $yi;"
        case Cosine => s"$dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;"
        case L2 => s"$dot += ($xi - $yi) * ($xi - $yi);"
      }
      val finish = op match {
        case Dot => s"${ev.value} = $dot;"
        case L2 => s"${ev.value} = Math.sqrt($dot);"
        case Cosine =>
          s"""double denom = Math.sqrt($na) * Math.sqrt($nb);
             |${ev.value} = (denom == 0.0) ? 0.0 : $dot / denom;""".stripMargin
      }
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $accum
         |}
         |$finish
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorKernel =
    copy(left = newLeft, right = newRight)
}

object VectorKernel {
  val Dot = 0
  val Cosine = 1
  val L2 = 2
}

/** Fused random-hyperplane bucket id: bit j of the result = sign of
  * v · planes(j). One compiled loop over bits×dim instead of `bits`
  * chained dot kernels OR-ed together — the bucket assignment is the
  * per-row hot path of LSH ANN, so the fusion matters. */
case class HyperplaneBucketExpr(child: Expression, planes: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // the bucket is one bit per plane in a long: a 65th plane's shift count
  // would MASK to bit 0 (Java shift semantics) and silently XOR its sign
  // into another plane's bit — wrong buckets, not just lower resolution
  require(planes.length <= 63,
    s"at most 63 hyperplanes fit the long bucket (got ${planes.length}) — " +
      "use fewer bits, or multiple seeded plane sets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      val n = math.min(v.numElements(), p.length)
      while (i < n) {
        dot += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
        i += 1
      }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val p = ctx.freshName("plane")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < ${planes.length}; $j++) {
         |  double[] $p = $pRef[$j];
         |  double $dot = 0.0;
         |  int $n = Math.min($v.numElements(), $p.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $get * $p[$i];
         |  }
         |  if ($dot > 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

/** Fused nearest-center argmin: score the vector against EVERY center of a
  * driver-collected codebook inside one compiled loop, returning
  * struct(cluster_id, dist). This replaces the crossJoin(broadcast(centers))
  * → min(struct(dist, id)) formulation of k-means assignment: that plan
  * inflates n×k rows and shuffles n of them through a groupBy; this one is
  * a PURE MAP — no join, no shuffle, no row inflation — with the centers as
  * a codegen reference object (k·dim doubles, the same bounded-collect
  * shape as the IVF cell literals).
  *
  * Semantics are bit-identical to the shuffle form: dist = the
  * [[VectorKernel]] L2 math (left-to-right double accumulation over
  * min(len) elements, then sqrt), ties break to the LOWEST index — i.e.
  * the lowest center id, because centers arrive sorted by id — and only a
  * strictly smaller squared distance replaces the incumbent (sqrt
  * preserves equality/order on non-negatives, so comparing the
  * accumulator is exact). Emitting the INDEX rather than an id keeps the
  * kernel id-type agnostic: canonical records carry STRING ids, and the
  * caller's `element_at(idLiteralArray, idx + 1)` lookup is a pure
  * column expression of whatever type the ids have.
  */
case class NearestCenterExpr(child: Expression, centers: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centers.nonEmpty, "nearest_center needs a non-empty center set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_center"

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestAcc = Double.PositiveInfinity
    var sawNonNaN = false
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - c(i)
        acc += d * d
        i += 1
      }
      if (!acc.isNaN) sawNonNaN = true
      if (acc < bestAcc) { bestAcc = acc; best = j }
      j += 1
    }
    // NaN parity with the shuffle twin: a NaN vector makes every acc NaN,
    // `acc < bestAcc` never fires, and bestAcc would leak +Infinity —
    // while crossJoin+min(struct) emits dist = NaN. Emitting NaN keeps a
    // downstream isnan(dist) corrupt-row filter working on either plan.
    val dist = if (sawNonNaN) math.sqrt(bestAcc) else Double.NaN
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, dist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val csRef = ctx.addReferenceObj("centers", centers, "double[][]")
      val best = ctx.freshName("best")
      val bestAcc = ctx.freshName("bestAcc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val sawNonNaN = ctx.freshName("sawNonNaN")
      s"""
         |int $best = 0;
         |double $bestAcc = Double.POSITIVE_INFINITY;
         |boolean $sawNonNaN = false;
         |for (int $j = 0; $j < ${centers.length}; $j++) {
         |  double[] $c = $csRef[$j];
         |  int $n = Math.min($v.numElements(), $c.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $get - $c[$i];
         |    $acc += $d * $d;
         |  }
         |  if (!Double.isNaN($acc)) $sawNonNaN = true;
         |  if ($acc < $bestAcc) { $bestAcc = $acc; $best = $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $best, $sawNonNaN ? Math.sqrt($bestAcc) : Double.NaN });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCenterExpr =
    copy(child = newChild)
}

/** [[NearestCenterExpr]]'s IVF-PQ sibling: same argmin loop (same
  * accumulation order, same lowest-index tie-break), but emitting
  * struct(idx, residual = v − nearest center) — the quantity PQ
  * codebooks are trained on in an IVFADC index (the residual's spread is
  * what's left AFTER the coarse quantizer, so the same code budget buys a
  * finer grid). One compiled pass: assign + subtract, no second scan. */
case class NearestResidualExpr(child: Expression, centers: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centers.nonEmpty, "nearest_residual needs a non-empty center set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("residual", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "nearest_residual"

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestAcc = Double.PositiveInfinity
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - c(i)
        acc += d * d
        i += 1
      }
      if (acc < bestAcc) { bestAcc = acc; best = j }
      j += 1
    }
    val bc = centers(best)
    val n = v.numElements()
    val res = new Array[Double](n)
    var i = 0
    while (i < n) {
      res(i) = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) -
        (if (i < bc.length) bc(i) else 0.0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val csRef = ctx.addReferenceObj("centers", centers, "double[][]")
      val best = ctx.freshName("best")
      val bestAcc = ctx.freshName("bestAcc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bc = ctx.freshName("bc")
      val res = ctx.freshName("res")
      val nv = ctx.freshName("nv")
      val get = (idx: String) =>
        if (isFloat) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      s"""
         |int $best = 0;
         |double $bestAcc = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < ${centers.length}; $j++) {
         |  double[] $c = $csRef[$j];
         |  int $n = Math.min($v.numElements(), $c.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${get(i)} - $c[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bestAcc) { $bestAcc = $acc; $best = $j; }
         |}
         |double[] $bc = $csRef[$best];
         |int $nv = $v.numElements();
         |double[] $res = new double[$nv];
         |for (int $i = 0; $i < $nv; $i++) {
         |  $res[$i] = ${get(i)} - (($i < $bc.length) ? $bc[$i] : 0.0);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $best,
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestResidualExpr =
    copy(child = newChild)
}

/** Fused symmetric int8 quantization: ONE compiled two-pass loop per vector
  * producing struct(scale, codes, max_err). Semantics identical to the
  * [[VectorFunctions.quantizeInt8]] HOF composition (s = max|x|/127,
  * q = floor(x/s + 0.5), err = max|q*s − x|; empty array → null, NaN is
  * greatest like array_max) — but the HOF form is interpreted per element
  * AND re-derives intermediates per output column; measured 128 µs/vector
  * (64-dim) vs a compiled loop. Quantizing a 100 TB collection is a bulk
  * pass over every vector, so this is a hot kernel, not a convenience. */
case class Int8QuantizeExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("max_err", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null // array_max of an empty array is null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (a.isNaN || a > maxAbs) maxAbs = a
      i += 1
    }
    val s = maxAbs / 127.0
    val codes = new Array[Int](n)
    var err = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = if (s == 0.0) 0 else math.floor(x / s + 0.5).toInt
      codes(i) = q
      val e = math.abs(q * s - x)
      if (e.isNaN || e > err) err = e
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s, org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes), err))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val s = ctx.freshName("s")
      val codes = ctx.freshName("codes")
      val err = ctx.freshName("err")
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      val a = ctx.freshName("a")
      val get = (idx: String) =>
        if (isFloat) s"(double) $v.getFloat($idx)" else s"$v.getDouble($idx)"
      s"""
         |int $n = $v.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $maxAbs = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $a = Math.abs(${get(i)});
         |    if (Double.isNaN($a) || $a > $maxAbs) $maxAbs = $a;
         |  }
         |  double $s = $maxAbs / 127.0;
         |  int[] $codes = new int[$n];
         |  double $err = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = ${get(i)};
         |    int $q = ($s == 0.0) ? 0 : (int) Math.floor($x / $s + 0.5);
         |    $codes[$i] = $q;
         |    double $e = Math.abs($q * $s - $x);
         |    if (Double.isNaN($e) || $e > $err) $err = $e;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $s,
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes),
         |      $err });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantizeExpr =
    copy(child = newChild)
}

/** Fused semantic-decontamination argmax: for one train/stream vector,
  * the best (rounded cosine, eval id) over a SMALL eval embedding set
  * carried as a codegen reference object — struct(max_cosine,
  * nearest_eval_id). Replaces both the crossJoin(broadcast(eval)) →
  * max(struct(c, −eid)) batch plan (n×|eval| row inflation + a groupBy
  * shuffle) and the interpreted `transform(evalLit, …)` streaming lambda
  * (higher-order functions are CodegenFallback): this is ONE compiled
  * loop per row, no join, no shuffle, no state.
  *
  * Parity contract (the DuckDB oracle replays it):
  *  - cosine is the [[VectorKernel]] math — cast each element to double,
  *    accumulate dot/na/nb left-to-right over min(len), 0.0 on zero norm;
  *  - the per-candidate cosine is rounded EXACTLY like Spark's
  *    `round(c, 6)` (BigDecimal of `Double.toString`, HALF_UP — pinned by
  *    RoundParitySpec), so scoring through this kernel or through the SQL
  *    surface is bit-identical;
  *  - `ids` must arrive sorted ascending and ties on the rounded cosine
  *    keep the FIRST (= lowest) eval id, matching
  *    `row_number() OVER (ORDER BY c DESC, eid ASC)`;
  *  - NaN cosines (corrupt embeddings) rank GREATEST, Spark's ordering —
  *    a row the engine cannot score flags `contaminated` (Spark's
  *    `NaN >= threshold` is true), never silently passes.
  *
  * Eval ids are widened to long by the caller (both decontamination faces
  * cast `idCol` to bigint), so batch and streaming emit the same
  * `nearest_eval_id` schema for any integral id column.
  */
case class NearestEvalExpr(child: Expression, ids: Array[Long], vecs: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(ids.nonEmpty && ids.length == vecs.length,
    "nearest_eval needs a non-empty eval set with one id per vector")
  require(ids.zip(ids.tail).forall { case (a, b) => a <= b },
    "nearest_eval ids must be sorted ascending (ties keep the first = lowest id)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("max_cosine", DoubleType, nullable = false),
    StructField("nearest_eval_id", LongType, nullable = false)))
  override def prettyName: String = "nearest_eval"

  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bestC = Double.NegativeInfinity
    var bestId = 0L
    var j = 0
    while (j < vecs.length) {
      val e = vecs(j)
      val n = math.min(v.numElements(), e.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val yi = e(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val rc = VectorExpressions.roundHalfUp6(if (denom == 0.0) 0.0 else dot / denom)
      // Spark ordering: NaN is GREATER than every double (a corrupt
      // embedding must flag contaminated — fail closed — exactly like the
      // retired max(struct) plan); NaN vs NaN keeps the first = lowest id
      if (if (rc.isNaN) !bestC.isNaN else rc > bestC) { bestC = rc; bestId = ids(j) }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, bestId))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val idRef = ctx.addReferenceObj("evalIds", ids, "long[]")
      val vecRef = ctx.addReferenceObj("evalVecs", vecs, "double[][]")
      val bestC = ctx.freshName("bestC")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val e = ctx.freshName("evalVec")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val rc = ctx.freshName("rc")
      val getX = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double $bestC = Double.NEGATIVE_INFINITY;
         |long $bestId = 0L;
         |for (int $j = 0; $j < ${vecs.length}; $j++) {
         |  double[] $e = $vecRef[$j];
         |  int $n = Math.min($v.numElements(), $e.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $getX;
         |    double $yi = $e[$i];
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |  double $rc = graft.functions.VectorExpressions.roundHalfUp6(
         |    ($denom == 0.0) ? 0.0 : $dot / $denom);
         |  if (Double.isNaN($rc) ? !Double.isNaN($bestC) : $rc > $bestC) {
         |    $bestC = $rc; $bestId = $idRef[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bestC, $bestId });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestEvalExpr =
    copy(child = newChild)
}
