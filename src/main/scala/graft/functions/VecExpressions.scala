package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity family.
  *
  * The embedding hot loops (dot products for cosine scoring and for
  * the sign-LSH hyperplane projections) were previously
  * `aggregate(zip_with(...))` higher-order functions — semantically
  * right, but HOFs are CodegenFallback: every row allocates a zipped
  * array and interprets the fold. At millions of candidate pairs ×
  * 64 dims that interpretation dominates the stage. `vec_dot` is a
  * proper Catalyst `BinaryExpression` WITH `doGenCode`: whole-stage
  * codegen emits a tight primitive loop, no allocation.
  *
  * Exactness: the generated loop accumulates in index order 0..n−1 —
  * the SAME IEEE operation sequence as the fold it replaces — so every
  * cosine/projection is bit-identical to the HOF form (the DuckDB
  * oracle rows prove it: they replay the same sequential dot).
  * Null semantics match the aggregate/zip_with fold it replaced: a
  * null ELEMENT in either array makes the whole dot product NULL
  * (null * x propagates through the fold) — and when both element
  * types are non-nullable the generated loop carries no null checks
  * at all. Lengths are min-clamped like zip_with's shared prefix.
  */
object VecExpressions {

  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    private def elemNullable(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

    override def nullable: Boolean =
      left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val checkNulls = elemNullable(left) || elemNullable(right)
      val lf = elemType(left) == FloatType
      val rf = elemType(right) == FloatType
      var s = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getX = if (elemType(left) == FloatType) s"(double) $x.getFloat($i)"
                   else s"$x.getDouble($i)"
        val getY = if (elemType(right) == FloatType) s"(double) $y.getFloat($i)"
                   else s"$y.getDouble($i)"
        val nullCheck =
          if (elemNullable(left) || elemNullable(right))
            s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
          else ""
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullCheck
           |  $acc += $getX * $getY;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** Deterministic pseudo-random hyperplane for (table, bit): `dim`
    * zero-mean components from a seeded SplitMix64. Shared by the
    * literal-array form (`Similarity.plane`, which the DuckDB oracles
    * embed verbatim) and the [[LshBuckets]] kernel — the two MUST stay
    * the same function or the certification replay breaks. */
  def plane(table: Int, bit: Int, dim: Int): Array[Double] = {
    var s = table.toLong * 0x9E3779B97F4A7C15L + bit * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    Array.fill(dim) {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble) // ~uniform in [-1, 1]
    }
  }

  /** All `tables` sign-LSH bucket ids of an embedding in ONE compiled
    * kernel: returns `array<long>` of length `tables`, where entry t
    * has bit b set iff `dot(emb, plane(t, b, dim)) >= 0`.
    *
    * Why this exists: the previous formulation projected
    * `array(bucketFor(t=0), …, bucketFor(t=T−1))` where each bucket id
    * was a sum of `bits` `when(vec_dot(emb, lit(plane)) >= 0, 1L<<b)`
    * terms — at the adaptive sizing a 10⁶-vector corpus picks
    * (8 tables × 17 bits = 136 dot products against 64-double literal
    * arrays) the generated projection blows Janino's method-size limit,
    * whole-stage codegen fails to compile, and the entire bucket stage
    * runs INTERPRETED — measured at ~10× the stage cost at 1M vectors.
    * This kernel emits one constant-size triple loop over a hyperplane
    * table attached as a codegen REFERENCE object (not code), so the
    * stage stays compiled at any (tables, bits, dim).
    *
    * Bit-exactness with the literal form it replaces (and therefore
    * with the DuckDB literal-hyperplane oracle replays): the inner
    * loop accumulates `emb[i] * plane[i]` in index order — the same
    * IEEE sequence as `vec_dot(emb, lit(plane))` — and the sign test
    * `acc >= 0` matches Column `>=`'s IEEE compare (−0.0 passes).
    * Null semantics also match the composition: a null ELEMENT made
    * every `vec_dot` NULL, so every `when` fell to `otherwise(0)` and
    * every bucket id was 0 — here a null element in the shared prefix
    * yields the same all-zero bucket array. Only a null CHILD is null. */
  case class LshBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
      extends UnaryExpression {

    require(tables >= 1 && bits >= 1 && bits <= 63 && dim >= 1,
      s"lsh_buckets: bad shape tables=$tables bits=$bits dim=$dim")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    private def elemNullable: Boolean = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    private def elemIsFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"lsh_buckets needs array<float|double> input, got $other")
      }

    /** Flat [table][bit][dim] hyperplane components, built once per
      * expression instance and shipped to codegen as a reference. */
    @transient private lazy val planes: Array[Double] = {
      val a = new Array[Double](tables * bits * dim)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < bits) {
          System.arraycopy(plane(t, b, dim), 0, a, (t * bits + b) * dim, dim)
          b += 1
        }
        t += 1
      }
      a
    }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), dim)
      val res = new Array[Long](tables)
      var hasNull = false
      if (elemNullable) {
        var i = 0
        while (i < n && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
      }
      if (!hasNull) {
        val isF = elemIsFloat
        var t = 0
        while (t < tables) {
          var bucket = 0L
          var b = 0
          while (b < bits) {
            val off = (t * bits + b) * dim
            var acc = 0.0
            var i = 0
            while (i < n) {
              acc += (if (isF) x.getFloat(i).toDouble else x.getDouble(i)) * planes(off + i)
              i += 1
            }
            if (acc >= 0.0) bucket |= (1L << b)
            b += 1
          }
          res(t) = bucket
          t += 1
        }
      }
      new GenericArrayData(res)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
        val n = ctx.freshName("n")
        val res = ctx.freshName("res")
        val hasNull = ctx.freshName("hasNull")
        val t = ctx.freshName("t")
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val off = ctx.freshName("off")
        val acc = ctx.freshName("acc")
        val bucket = ctx.freshName("bucket")
        val getX = if (elemIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val nullScan =
          if (elemNullable)
            s"""for (int $i = 0; $i < $n && !$hasNull; $i++) { $hasNull = $x.isNullAt($i); }"""
          else ""
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $dim);
           |long[] $res = new long[$tables];
           |boolean $hasNull = false;
           |$nullScan
           |if (!$hasNull) {
           |  for (int $t = 0; $t < $tables; $t++) {
           |    long $bucket = 0L;
           |    for (int $b = 0; $b < $bits; $b++) {
           |      int $off = ($t * $bits + $b) * $dim;
           |      double $acc = 0.0;
           |      for (int $i = 0; $i < $n; $i++) {
           |        $acc += $getX * $planesRef[$off + $i];
           |      }
           |      if ($acc >= 0.0) $bucket |= (1L << $b);
           |    }
           |    $res[$t] = $bucket;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
    override def prettyName: String = "lsh_buckets"
  }

  /** Top-`keep` max-cosine centroids of one embedding in ONE compiled
    * kernel: returns `array<long>` of the best `keep` centroid ids in
    * rank order (cosine desc, cent_id asc on ties).
    *
    * Why this exists: IVF assignment (and every Lloyd's round of the
    * k-means quantizer) previously scored via
    * `side.join(broadcast(cents))` + `row_number().over(partitionBy(id)
    * .orderBy(cs desc, cent_id))` — n·C scored rows materialized and
    * locally sorted before Spark's map-side WindowGroupLimit trims them
    * (10⁹ rows at 10⁶ vectors × 10³ lists; 10¹³⁺ at 10⁹ vectors — a
    * genuine scale-killer even though nothing shuffles). This kernel
    * folds the whole argmax/top-keep into the corpus scan: n rows in,
    * n rows out, no join, no sort. The centroid table (ids, flattened
    * embeddings, norms — the same √n-bounded set the broadcast carried)
    * rides codegen as REFERENCE objects, so generated code size is
    * constant in C·dim.
    *
    * Bit-exactness with the composition it replaces (and therefore with
    * the q_ann_ivf DuckDB replay): per centroid it computes
    * `vec_dot(emb, cent_emb) / (nrm * cent_nrm)` with the identical
    * IEEE sequence — index-order dot over the min-clamped shared
    * prefix, `nrm = sqrt(index-order self-dot over the FULL embedding)`
    * (Math.sqrt is correctly rounded, so inlining `l2norm` is exact) —
    * and ranks with Spark's double ordering (`x == y` first, so
    * −0.0 == 0.0; else Double.compare, so NaN sorts greatest), ties to
    * the smaller cent_id, exactly `orderBy(cs.desc, cent_id)`.
    * Null semantics: a null ELEMENT made every cosine NULL, so the
    * window ranked all-null rows by cent_id alone — here the same rows
    * yield the first `keep` centroid ids. Only a null CHILD is null.
    * One deliberate divergence: on a zero-NORM vector the composed
    * form's `Divide` raises ANSI DIVIDE_BY_ZERO, while the kernel
    * keeps plain IEEE arithmetic (NaN cosines, ranked NaN-greatest
    * exactly like Spark's double sort order) — a degenerate row
    * degrades gracefully instead of failing the whole 10⁹-row job. */
  case class CentTopK(child: Expression, centIds: Array[Long],
      centEmbs: Array[Double], centNrms: Array[Double], dim: Int, keep: Int)
      extends UnaryExpression {

    require(dim >= 1 && keep >= 1 && centIds.nonEmpty &&
      centEmbs.length == centIds.length * dim && centNrms.length == centIds.length,
      s"cent_topk: bad shape C=${centIds.length} dim=$dim keep=$keep")
    // the null-element path returns centIds(0..k-1) as "rank by
    // cent_id alone", and equal-cosine ties resolve by SCAN ORDER —
    // both silently assume strictly ascending ids, so enforce it here
    // rather than trust every caller to pre-sort like collectCents
    require(centIds.indices.tail.forall(i => centIds(i - 1) < centIds(i)),
      "cent_topk: centIds must be strictly ascending (ties + the " +
        "null-element path rank by position)")

    private def nCents: Int = centIds.length
    private def nKeep: Int = math.min(keep, nCents)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    private def elemNullable: Boolean = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    private def elemIsFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cent_topk needs array<float|double> input, got $other")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val len = x.numElements()
      val n = math.min(len, dim)
      val k = nKeep
      var hasNull = false
      if (elemNullable) {
        var i = 0
        while (i < len && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
      }
      val res = new Array[Long](k)
      if (hasNull) {
        // all cosines NULL in the composed form → rank by cent_id alone
        var j = 0
        while (j < k) { res(j) = centIds(j); j += 1 }
      } else {
        val isF = elemIsFloat
        // nrm over the FULL embedding, same as l2norm(emb)
        var sq = 0.0
        var i = 0
        while (i < len) {
          val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
          sq += xv * xv
          i += 1
        }
        val nrm = math.sqrt(sq)
        val topCs = new Array[Double](k)
        var filled = 0
        var c = 0
        while (c < nCents) {
          val off = c * dim
          var dot = 0.0
          i = 0
          while (i < n) {
            dot += (if (isF) x.getFloat(i).toDouble else x.getDouble(i)) * centEmbs(off + i)
            i += 1
          }
          val cs = dot / (nrm * centNrms(c))
          // first insertion slot: strictly better than the holder
          // (Spark double order; equal cs keeps the earlier cent_id)
          var j = 0
          while (j < filled &&
            !(if (cs == topCs(j)) false else java.lang.Double.compare(cs, topCs(j)) > 0)) j += 1
          if (j < k) {
            var m = math.min(filled, k - 1)
            while (m > j) { topCs(m) = topCs(m - 1); res(m) = res(m - 1); m -= 1 }
            topCs(j) = cs
            res(j) = centIds(c)
            if (filled < k) filled += 1
          }
          c += 1
        }
      }
      new GenericArrayData(res)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val idsRef = ctx.addReferenceObj("centIds", centIds, "long[]")
        val embsRef = ctx.addReferenceObj("centEmbs", centEmbs, "double[]")
        val nrmsRef = ctx.addReferenceObj("centNrms", centNrms, "double[]")
        val len = ctx.freshName("len")
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val hasNull = ctx.freshName("hasNull")
        val res = ctx.freshName("res")
        val topCs = ctx.freshName("topCs")
        val filled = ctx.freshName("filled")
        val sq = ctx.freshName("sq")
        val nrm = ctx.freshName("nrm")
        val c = ctx.freshName("c")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val cs = ctx.freshName("cs")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        val xv = ctx.freshName("xv")
        val getX = if (elemIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val nullScan =
          if (elemNullable)
            s"""for (int $i = 0; $i < $len && !$hasNull; $i++) { $hasNull = $x.isNullAt($i); }"""
          else ""
        s"""
           |int $len = $x.numElements();
           |int $n = java.lang.Math.min($len, $dim);
           |int $k = $nKeep;
           |boolean $hasNull = false;
           |$nullScan
           |long[] $res = new long[$k];
           |if ($hasNull) {
           |  for (int $j = 0; $j < $k; $j++) { $res[$j] = $idsRef[$j]; }
           |} else {
           |  double $sq = 0.0;
           |  for (int $i = 0; $i < $len; $i++) {
           |    double $xv = $getX;
           |    $sq += $xv * $xv;
           |  }
           |  double $nrm = java.lang.Math.sqrt($sq);
           |  double[] $topCs = new double[$k];
           |  int $filled = 0;
           |  for (int $c = 0; $c < $nCents; $c++) {
           |    int $off = $c * $dim;
           |    double $dot = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      $dot += $getX * $embsRef[$off + $i];
           |    }
           |    double $cs = $dot / ($nrm * $nrmsRef[$c]);
           |    int $j = 0;
           |    while ($j < $filled &&
           |        !(($cs == $topCs[$j]) ? false : java.lang.Double.compare($cs, $topCs[$j]) > 0)) {
           |      $j++;
           |    }
           |    if ($j < $k) {
           |      for (int $m = java.lang.Math.min($filled, $k - 1); $m > $j; $m--) {
           |        $topCs[$m] = $topCs[$m - 1];
           |        $res[$m] = $res[$m - 1];
           |      }
           |      $topCs[$j] = $cs;
           |      $res[$j] = $idsRef[$c];
           |      if ($filled < $k) { $filled++; }
           |    }
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
    override def prettyName: String = "cent_topk"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  def lsh_buckets(emb: Column, tables: Int, bits: Int, dim: Int): Column =
    column(LshBuckets(expression(emb), tables, bits, dim))

  def cent_topk(emb: Column, centIds: Array[Long], centEmbs: Array[Double],
      centNrms: Array[Double], dim: Int, keep: Int): Column =
    column(CentTopK(expression(emb), centIds, centEmbs, centNrms, dim, keep))
}
