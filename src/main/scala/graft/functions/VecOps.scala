package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Codegen'd float-vector kernels.
  *
  * The higher-order-function route (aggregate ∘ zip_with) evaluates a
  * lambda per element — correct but interpreted, and it dominated the
  * similarity-search bench (42s for 4M pairs at sf0.1). This custom
  * Catalyst Expression compiles the dot product to a tight Java loop via
  * doGenCode, the preferred extension point after built-ins
  * (custom codegen Expression > UDF).
  *
  * Accumulation is strictly left-to-right in double — identical to the
  * expression form, so results are bit-for-bit unchanged.
  */
case class FloatArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fdot expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: the expression may occur several times in one codegen
      // context (e.g. two fdot calls in a projection) — raw identifiers
      // would collide
      val n = ctx.freshName("fdotN")
      val s = ctx.freshName("fdotS")
      val i = ctx.freshName("fdotI")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance of two array<double> columns, compiled to a
  * tight Java loop. Accumulation is strictly left-to-right in double —
  * bit-identical to the aggregate∘zip_with expression form it replaces in
  * the k-NN pair loop (which evaluated an interpreted lambda per element
  * per candidate pair).
  */
case class DoubleArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsqdist expects (array<double>, array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("sqdN")
      val s = ctx.freshName("sqdS")
      val i = ctx.freshName("sqdI")
      val d = ctx.freshName("sqdD")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static forwarders for the SQ8 kernels — generated code calls these
  * directly, so the whole quantize / quantized-dot loop stays inside
  * whole-stage codegen (same pattern as TextKernels).
  */
object VecKernels {
  /** Per-vector 8-bit scalar quantization: q_i = round((x_i − min)/step),
    * step = (max − min)/255 in FLOAT (callers recompute the same scalars
    * with array_min/array_max and must match). Degenerate constant
    * vectors (step ≤ 0) quantize to all-zero bytes.
    */
  def quantize8(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    var mn = Float.MaxValue
    var mx = Float.MinValue
    var i = 0
    while (i < n) {
      val v = a.getFloat(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Byte](n)
    val step = (mx - mn) / 255.0f
    if (step > 0) {
      i = 0
      while (i < n) {
        val q = Math.round((a.getFloat(i) - mn) / step)
        out(i) = (if (q > 255) 255 else if (q < 0) 0 else q).toByte
        i += 1
      }
    }
    out
  }

  /** The (min, step) scalars [[quantize8]] quantized with, emitted by the
    * SAME float-precision arithmetic — callers reconstructing the dot
    * product must use these, never recompute them in double (Spark's
    * Divide promotes to double and can double-round a different step).
    */
  def qparams8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mn = Float.MaxValue
    var mx = Float.MinValue
    var i = 0
    while (i < n) {
      val v = a.getFloat(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    val step = (mx - mn) / 255.0f
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](mn, if (step > 0) step else 0f))
  }

  /** Σ (q_i · y_i) over the quantized corpus bytes and a float query —
    * the data-dependent term of the reconstructed dot product
    * dot(x, y) ≈ min·Σy + step·qdot8.
    */
  def qdot8(b: Array[Byte], q: ArrayData): Double = {
    val n = math.min(b.length, q.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += (b(i) & 0xff).toDouble * q.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** ADC lookup-sum over PQ codes: Σ_j lut[j·ks + codes[j]] with
    * ks = |lut| / |codes|.
    */
  def pqAdc(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    if (m == 0) return 0.0
    val ks = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * ks + (codes(j) & 0xff))
      j += 1
    }
    s
  }
}

/** binary SQ8 code of an array<float> vector (codegen). */
case class QuantizeFloat8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize8 expects array<float>, got ${other.simpleString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.quantize8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.quantize8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [min, step] scalars of the SQ8 quantization, float-exact (codegen). */
case class QuantizeParams8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qparams8 expects array<float>, got ${other.simpleString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.qparams8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.qparams8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ (q_i · y_i) of SQ8 bytes against a float query vector (codegen). */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdot8 expects (binary, array<float>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.qdot8(l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.qdot8($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Argmax centroid dot in one kernel call: returns struct(best dot, cell
  * index), ties to the lowest index. The expression-chain alternative
  * (greatest over k fdot-against-literal columns + a k-way when chain)
  * embeds k·dim literals TWICE in the generated code — a Janino
  * compile-time cliff at k=16, dim=64 — and re-evaluates dots when
  * subexpression elimination misses. Centroids live in the expression
  * (structural equality via Seq) and reach generated code through an
  * addReferenceObj handle.
  */
case class CentroidArgmax(child: Expression, cents: Seq[Seq[Float]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("best", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_argmax expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Float]] =
    cents.map(_.toArray).toArray

  /** Public for generated code. Accumulation is left-to-right double —
    * bit-identical to the fdot expression form it replaces.
    */
  def kernelEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var bestI = 0
    var bestD = Double.NegativeInfinity
    var c = 0
    while (c < mat.length) {
      val cent = mat(c)
      val n = math.min(dim, cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += arr.getFloat(i).toDouble * cent(i); i += 1 }
      if (d > bestD) { bestD = d; bestI = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestI))
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmax", this,
      classOf[CentroidArgmax].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.InternalRow) $ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-2 variant of [[CentroidArgmax]]: struct(best dot, argmax cell,
  * second-best dot, runner-up cell) in one kernel pass — the IVF
  * boundary-multi-assignment (cell spill) input: a vector whose
  * best/second margin is small sits near the Voronoi boundary, and
  * assigning it to BOTH cells lifts recall at unchanged probe counts
  * (~1.2× storage). With a single centroid, best2 = -Inf and cell2 =
  * cell — an infinite margin that never spills. Ties resolve to the
  * lowest index on both ranks (total, deterministic).
  */
case class CentroidArgmax2(child: Expression, cents: Seq[Seq[Float]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("best", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("best2", DoubleType, nullable = false),
    StructField("cell2", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_argmax2 expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Float]] =
    cents.map(_.toArray).toArray

  /** Public for generated code. Accumulation left-to-right double —
    * bit-identical to [[CentroidArgmax]] on the winning cell.
    */
  def kernelEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var bestI = 0
    var bestD = Double.NegativeInfinity
    var secI = 0
    var secD = Double.NegativeInfinity
    var c = 0
    while (c < mat.length) {
      val cent = mat(c)
      val n = math.min(dim, cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += arr.getFloat(i).toDouble * cent(i); i += 1 }
      if (d > bestD) {
        secD = bestD; secI = bestI; bestD = d; bestI = c
      } else if (d > secD) { secD = d; secI = c }
      c += 1
    }
    if (mat.length < 2) { secD = Double.NegativeInfinity; secI = bestI }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestI, secD, secI))
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidArgmax2", this,
      classOf[CentroidArgmax2].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.InternalRow) $ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign signature: bit b = (dot(v, plane_b) > 0).
  * Same rationale as [[CentroidArgmax]] — the per-bit
  * fdot-against-literal-array form embeds bits·dim literals in generated
  * code (compile cliff) and each dot is a separate expression.
  */
case class PlaneSignBits(child: Expression, planes: Seq[Seq[Float]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"plane_sign_bits expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Float]] =
    planes.map(_.toArray).toArray

  /** Public for generated code; accumulation left-to-right double, strict
    * `> 0` — bit-identical to the fdot expression form.
    */
  def kernelEval(a: Any): Long = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < mat.length) {
      val p = mat(b)
      val n = math.min(dim, p.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += arr.getFloat(i).toDouble * p(i); i += 1 }
      if (d > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeSignBits", this,
      classOf[PlaneSignBits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-probe hyperplane signatures: the primary sign signature of
  * [[PlaneSignBits]] PLUS every variant with a subset of the `flips`
  * lowest-|margin| bits flipped — 2^flips probe buckets per row. The
  * margin |dot(v, plane_b)| ranks bit confidence: a near-zero dot means
  * the true neighbour plausibly sits on the other side of that plane, so
  * flipping exactly those bits probes the most promising neighbouring
  * buckets (Lv et al., multi-probe LSH, VLDB'07). Query-side only —
  * extra probes multiply candidate LOOKUPS, never corpus rows or scans.
  *
  * Probe order is DETERMINISTIC — a row's probe array is a pure function
  * of (vector, planes, flips): the selection sort scans fixed index
  * order with strict `<`, the flip masks enumerate in fixed binary
  * order, and element 0 is always the primary signature. On exactly tied
  * margins the selected bit set is the sort's stable outcome, NOT
  * necessarily the lowest bit indices (a swap can displace a tied low
  * bit past later candidates) — don't re-derive the probe set from a
  * "lowest index wins" rule elsewhere.
  */
case class PlaneSignProbes(child: Expression, planes: Seq[Seq[Float]],
    flips: Int) extends UnaryExpression {

  // 2^flips probes per row: cap well before the Int shift and any
  // realistic candidate budget (16 bits = 65k lookups per query-table
  // is already far past useful multi-probe depth)
  require(flips <= 16, s"plane_sign_probes: flips=$flips > 16")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"plane_sign_probes expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Float]] =
    planes.map(_.toArray).toArray

  /** Public for generated code; dot accumulation left-to-right double,
    * strict `> 0` — the primary signature is bit-identical to
    * [[PlaneSignBits]] over the same planes.
    */
  def kernelEval(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val nb = mat.length
    val dots = new Array[Double](nb)
    var sig = 0L
    var b = 0
    while (b < nb) {
      val p = mat(b)
      val n = math.min(dim, p.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += arr.getFloat(i).toDouble * p(i); i += 1 }
      dots(b) = d
      if (d > 0) sig |= (1L << b)
      b += 1
    }
    val f = math.min(math.max(flips, 0), nb)
    // indices of the f smallest |margins| (partial selection sort; on
    // exactly tied margins the pick is the sort's stable-but-swap-order
    // outcome — deterministic, but NOT "lowest bit index wins": an
    // earlier swap can displace a tied low bit past later candidates
    // (see class scaladoc))
    val idx = Array.tabulate(nb)(identity)
    var s = 0
    while (s < f) {
      var m = s
      var j = s + 1
      while (j < nb) {
        if (math.abs(dots(idx(j))) < math.abs(dots(idx(m)))) m = j
        j += 1
      }
      val t = idx(s); idx(s) = idx(m); idx(m) = t
      s += 1
    }
    val nProbes = 1 << f
    val out = new Array[Long](nProbes)
    var mask = 0
    while (mask < nProbes) {
      var v = sig
      var k = 0
      while (k < f) {
        if ((mask & (1 << k)) != 0) v ^= (1L << idx(k))
        k += 1
      }
      out(mask) = v
      mask += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeSignProbes", this,
      classOf[PlaneSignProbes].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: the vector is split into
  * `books.length` contiguous subspaces and each sub-vector is replaced
  * by the index of its nearest (L2) codebook centroid — one byte per
  * subspace. Subspace widths come from the codebooks themselves, so a
  * trailing ragged subspace (dim not divisible by m) works unchanged.
  * Ties go to the lowest code. Same addReferenceObj/state-hashed-name
  * discipline as [[CentroidArgmax]].
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Array[Float]]] =
    books.map(_.map(_.toArray).toArray).toArray

  /** Public for generated code. */
  def kernelEval(a: Any): Array[Byte] = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val m = mat.length
    val out = new Array[Byte](m)
    var off = 0
    var j = 0
    while (j < m) {
      val book = mat(j)
      val sub = if (book.length > 0) book(0).length else 0
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < sub && off + i < dim) {
          val diff = arr.getFloat(off + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(j) = bestC.toByte
      off += sub
      j += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, c => s"(byte[]) $ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query PQ lookup table: lut[j·ks + c] = dot(q_subspace_j,
  * books(j)(c)) as flat array<double> — the asymmetric-distance
  * tables of ADC scoring. Runs once per QUERY row (the broadcast-tiny
  * side); the corpus side then scores via [[PqAdcDot]] without ever
  * touching floats.
  */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_lut expects array<float>, got ${other.simpleString}")
    }

  @transient private lazy val mat: Array[Array[Array[Float]]] =
    books.map(_.map(_.toArray).toArray).toArray

  /** Public for generated code. */
  def kernelEval(a: Any): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val m = mat.length
    val ks = if (m > 0) mat(0).length else 0
    val out = new Array[Any](m * ks)
    var off = 0
    var j = 0
    while (j < m) {
      val book = mat(j)
      val sub = if (book.length > 0) book(0).length else 0
      var c = 0
      while (c < ks) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < sub && off + i < dim) {
          d += arr.getFloat(off + i).toDouble * cent(i)
          i += 1
        }
        out(j * ks + c) = d
        c += 1
      }
      off += sub
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = kernelEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    defineCodeGen(ctx, ev,
      c => s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernelEval($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_j lut[j·ks + codes[j]], with ks inferred as
  * lut.length / codes.length — the codes column and the query's LUT
  * agree on (m, ks) by construction (same codebooks). Stateless, fixed
  * registry name.
  */
case class PqAdcDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (binary, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.pqAdc(l.asInstanceOf[Array[Byte]], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  /** The stateless SQL-callable kernels, as data: consumed by [[register]]
    * (runtime, per-session) and by `plans.GraftExtensions.injectFunction`
    * (session build — a pure-SQL session gets them with no Scala call).
    */
  val kernels: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fdot"      -> (exprs => FloatArrayDot(exprs(0), exprs(1))),
    "dsqdist"   -> (exprs => DoubleArraySqDist(exprs(0), exprs(1))),
    "quantize8" -> (exprs => QuantizeFloat8(exprs(0))),
    "qdot8"     -> (exprs => QuantizedDot(exprs(0), exprs(1))),
    "qparams8"  -> (exprs => QuantizeParams8(exprs(0))),
    "pq_adc"    -> (exprs => PqAdcDot(exprs(0), exprs(1))),
  )

  /** Register SQL-callable kernels once per session (lookup-before-create
    * via [[KernelRegistry.ensure]] — no replacement, no WARN spam).
    */
  def register(spark: SparkSession): Unit =
    kernels.foreach { case (n, b) => KernelRegistry.ensure(spark, n)(b) }

  /** Dot product of two array<float> columns (codegen'd). */
  def fdot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    // route through the registry so we never touch the private Column ctor
    call_function("fdot", a, b)
  }

  def fnorm(spark: SparkSession, a: Column): Column =
    sqrt(fdot(spark, a, a))

  /** SQ8 quantization of an array<float> column → binary (codegen'd). */
  def quantize8(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("quantize8", a)
  }

  /** Σ(q_i·y_i) of SQ8 bytes against a float query column (codegen'd). */
  def qdot8(spark: SparkSession, bytes: Column, query: Column): Column = {
    register(spark)
    call_function("qdot8", bytes, query)
  }

  /** [min, step] the SQ8 codes were quantized with, bit-identical to the
    * kernel's own float arithmetic (codegen'd).
    */
  def qparams8(spark: SparkSession, a: Column): Column = {
    register(spark)
    call_function("qparams8", a)
  }

  /** Squared euclidean distance of two array<double> columns (codegen'd). */
  def dsqdist(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("dsqdist", a, b)
  }

  /** 64-bit-max hyperplane sign signature against a fixed plane set.
    * The function name folds in a hash of the planes: resolution happens
    * at ANALYSIS time against the registry, so two different plane sets
    * in ONE plan (multi-table LSH!) must not share a name — a fixed name
    * silently resolved both to the last-registered set.
    *
    * Use the returned Column immediately (KernelRegistry use-immediately
    * contract): the transient name can be LRU-evicted after MaxTransient
    * further registrations; re-invoke this builder instead of caching
    * the Column.
    */
  def planeSignBits(spark: SparkSession, emb: Column,
      planes: Array[Array[Float]]): Column = {
    val planeSeq: Seq[Seq[Float]] = planes.toIndexedSeq.map(_.toIndexedSeq)
    val name = s"plane_sign_bits_${(planeSeq.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => PlaneSignBits(exprs(0), planeSeq))
    call_function(name, emb)
  }

  /** Multi-probe signature array (primary + lowest-|margin| bit flips)
    * against a fixed plane set — state-hashed name (the flip count is
    * part of the state), use-immediately contract as [[planeSignBits]].
    */
  def planeSignProbes(spark: SparkSession, emb: Column,
      planes: Array[Array[Float]], flips: Int): Column = {
    val planeSeq: Seq[Seq[Float]] = planes.toIndexedSeq.map(_.toIndexedSeq)
    val name = s"plane_sign_probes_" +
      s"${((planeSeq, flips).hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => PlaneSignProbes(exprs(0), planeSeq, flips))
    call_function(name, emb)
  }

  /** struct(best dot, argmax cell) against a fixed centroid set. State-
    * hashed name for the same analysis-time-resolution reason as
    * [[planeSignBits]] — same use-immediately contract, too.
    */
  def centroidArgmax(spark: SparkSession, emb: Column,
      cents: Array[Array[Float]]): Column = {
    val centSeq: Seq[Seq[Float]] = cents.toIndexedSeq.map(_.toIndexedSeq)
    val name = s"centroid_argmax_${(centSeq.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => CentroidArgmax(exprs(0), centSeq))
    call_function(name, emb)
  }

  /** struct(best, cell, best2, cell2) top-2 variant (boundary spill) —
    * state-hashed name, use-immediately contract as [[centroidArgmax]].
    */
  def centroidArgmax2(spark: SparkSession, emb: Column,
      cents: Array[Array[Float]]): Column = {
    val centSeq: Seq[Seq[Float]] = cents.toIndexedSeq.map(_.toIndexedSeq)
    val name = s"centroid_argmax2_${(centSeq.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => CentroidArgmax2(exprs(0), centSeq))
    call_function(name, emb)
  }

  private def bookSeq(books: Array[Array[Array[Float]]])
      : Seq[Seq[Seq[Float]]] =
    books.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))

  /** PQ code bytes against fixed per-subspace codebooks (codegen'd;
    * state-hashed name, use-immediately contract).
    */
  def pqEncode(spark: SparkSession, emb: Column,
      books: Array[Array[Array[Float]]]): Column = {
    val bs = bookSeq(books)
    val name = s"pq_encode_${(bs.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => PqEncode(exprs(0), bs))
    call_function(name, emb)
  }

  /** Per-query ADC lookup table for the same codebooks (codegen'd;
    * state-hashed name, use-immediately contract).
    */
  def pqLut(spark: SparkSession, emb: Column,
      books: Array[Array[Array[Float]]]): Column = {
    val bs = bookSeq(books)
    val name = s"pq_lut_${(bs.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => PqLut(exprs(0), bs))
    call_function(name, emb)
  }

  /** ADC score Σ_j lut[j·ks + codes[j]] (codegen'd, stateless). */
  def pqAdc(spark: SparkSession, codes: Column, lut: Column): Column = {
    register(spark)
    call_function("pq_adc", codes, lut)
  }
}
