package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for hot-path vector math.
  *
  * The HOF formulations in [[graft.ml.Distance]] are correct but evaluate
  * a lambda per element per pass (cosine = 3 passes); on O(millions) of
  * pairs that dominates (SURVEY.md §4: "custom Expression only if the HOF
  * formulation proves too slow at bench scale" — it did: the brute
  * near-dup pair scan). These generate a single fused whole-stage-codegen
  * loop per pair: no virtual calls, no per-element allocation.
  *
  * Exposure: Spark 4 made `Column(expression)` private[sql], so the
  * expressions register in the session FunctionRegistry (public API) and
  * surface through `call_function` — [[VectorExprs.register]] is invoked
  * lazily by every table load (graft.ops.Tables) and by the df-taking
  * library entry points.
  */
abstract class ArrayPairFold extends BinaryExpression {
  // callers cast operands to array<double>; no ExpectsInputTypes (that
  // trait's AbstractDataType signature is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType
}

/** Cosine similarity in one fused pass (dot + both norms together);
  * 1e-12 denominator floor matches Distance.cosineHof. */
case class ArrayCosine(left: Expression, right: Expression)
    extends ArrayPairFold {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / math.max(math.sqrt(nx) * math.sqrt(ny), 1e-12)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = $a.getDouble($i);
        |  double $yi = $b.getDouble($i);
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |${ev.value} = $dot / java.lang.Math.max(
        |  java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny), 1e-12);
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Squared euclidean distance, single fused loop. */
case class ArraySqEuclidean(left: Expression, right: Expression)
    extends ArrayPairFold {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $d = $a.getDouble($i) - $b.getDouble($i);
        |  $s += $d * $d;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Minkowski distance (Σ|aᵢ−bᵢ|^p)^(1/p) — reference H6 semantics
  * (vector_engine.py:18-19), fused loop. */
case class ArrayMinkowski(left: Expression, right: Expression, p: Double)
    extends ArrayPairFold {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += math.pow(math.abs(x.getDouble(i) - y.getDouble(i)), p); i += 1
    }
    math.pow(s, 1.0 / p)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += java.lang.Math.pow(
        |    java.lang.Math.abs($a.getDouble($i) - $b.getDouble($i)), $p);
        |}
        |${ev.value} = java.lang.Math.pow($s, ${1.0 / p});
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** |A ∩ B| for two SORTED string arrays — linear merge scan, no hash-set
  * allocation per row (array_intersect builds one per call). Callers sort
  * once per side with `array_sort` before the pairwise join, so the
  * O(n+m) merge replaces the O(n·m)-ish allocation-heavy path on the
  * near-dup pair scan. Jaccard = inter / (|A| + |B| − inter). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val cmp = ctx.freshName("cmp")
      s"""
        |int $i = 0, $j = 0, $c = 0;
        |int $n = $a.numElements(), $m = $b.numElements();
        |while ($i < $n && $j < $m) {
        |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
        |  if ($cmp == 0) { $c++; $i++; $j++; }
        |  else if ($cmp < 0) $i++;
        |  else $j++;
        |}
        |${ev.value} = $c;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Integer dot product over two int arrays (int8-quantized vectors), long
  * accumulator — the hot inner loop of quantized similarity search. Exact
  * by construction (no float accumulation), so the oracle can replay it
  * with any summation order. */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $dot = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (long) $a.getInt($i) * $b.getInt($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** One-pass int8 symmetric quantization of a double array:
  * `q_i = floor(127·x_i/m + 0.5)` with `m = max |x_i|` (zero vector →
  * all-zero codes), plus the integer squared norm, returned as
  * `struct<q: array<int>, n: bigint>`. A native expression because the
  * HOF formulation (abs-max + quantize + norm-aggregate) is three
  * lambda passes outside codegen — measured 10× slower at the ×100
  * stress scale; this is two tight primitive loops inside
  * whole-stage codegen. The op sequence `127*x/m + 0.5` is fixed IEEE
  * double math, bit-identical in the DuckDB oracle replay.
  *
  * Contract: elements must be non-null and finite (primitive getDouble
  * reads a null slot as 0.0 rather than propagating, and a NaN would
  * cast to code 0 on the JVM but error/NULL in an oracle replay —
  * embedding columns here are non-null finite by construction). */
case class ArrayQuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("q",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false)),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i))
      if (v > mx) mx = v
      i += 1
    }
    val q = new Array[Int](n)
    var norm = 0L
    if (mx > 0) {
      i = 0
      while (i < n) {
        val qi = math.floor(127.0 * x.getDouble(i) / mx + 0.5).toInt
        q(i) = qi
        norm += qi.toLong * qi
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
        norm))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val qi = ctx.freshName("qi")
      val norm = ctx.freshName("norm")
      s"""
        |int $n = $a.numElements();
        |double $mx = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = java.lang.Math.abs($a.getDouble($i));
        |  if ($v > $mx) $mx = $v;
        |}
        |int[] $q = new int[$n];
        |long $norm = 0L;
        |if ($mx > 0) {
        |  for (int $i = 0; $i < $n; $i++) {
        |    int $qi = (int) java.lang.Math.floor(
        |      127.0 * $a.getDouble($i) / $mx + 0.5);
        |    $q[$i] = $qi;
        |    $norm += (long) $qi * $qi;
        |  }
        |}
        |${ev.value} =
        |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |    new Object[] {
        |      new org.apache.spark.sql.catalyst.util.GenericArrayData($q),
        |      $norm });
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExprs {

  /** Idempotent per-session registration of the vector expressions. */
  // Sessions already registered — createOrReplaceTempFunction logs a
  // "replaced a previously registered function" warning on every repeat
  // call, and register() is invoked lazily from every table load, so
  // without this guard a bench run emits thousands of them. Weak keys:
  // must not pin a stopped session. The whole check-register-mark runs
  // under one lock: concurrent callers (Pq.fitCodebooks' parallel
  // subspace fits all call register) must not return before the
  // functions actually exist, and a registration that throws must NOT
  // leave the session marked done.
  private val registered: java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit = registered.synchronized {
    if (registered.contains(spark)) return
    doRegister(spark)
    registered.add(spark)
    ()
  }

  private def doRegister(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => ArrayCosine(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sq_euclidean",
      exprs => ArraySqEuclidean(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minkowski15",
      exprs => ArrayMinkowski(exprs(0), exprs(1), 1.5), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot_long",
      exprs => ArrayDotLong(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_quantize_int8",
      exprs => ArrayQuantizeInt8(exprs(0)), "built-in")
  }

  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def sqEuclidean(a: Column, b: Column): Column =
    call_function("graft_sq_euclidean", a, b)

  def euclidean(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.sqrt(sqEuclidean(a, b))

  /** Only p=1.5 (the reference's constant) is pre-registered; other p
    * fall back to the HOF formulation. */
  def minkowski(a: Column, b: Column, p: Double): Column =
    if (p == 1.5) call_function("graft_minkowski15", a, b)
    else graft.ml.Distance.minkowskiHof(a, b, p)

  /** Requires both operands pre-sorted (array_sort). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_size", a, b)

  /** Exact integer dot over int arrays (quantized-vector hot loop). */
  def dotLong(a: Column, b: Column): Column =
    call_function("graft_dot_long", a, b)

  /** One-pass int8 quantization: struct<q: array<int>, n: bigint>. */
  def quantizeInt8(v: Column): Column =
    call_function("graft_quantize_int8", v)
}
