package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 text-signature kernels for the dedup family.
  *
  * The portable (md5-family) signature stages were higher-order-
  * function compositions — semantically right, but each md5 call paid
  * a UTF8String concat allocation, a 32-char hex encode and an
  * interpreted lambda frame, and the min/fold structure allocated an
  * intermediate array per seed per row. These kernels run the same
  * arithmetic as ONE compiled loop per row: digests are compared as
  * raw 16-byte arrays (hex-lowercase lexicographic order ≡ unsigned
  * digest-byte order, since the nibble→hex map is monotone) and only
  * the winners are hex-encoded.
  *
  * Bit-exactness contract (pinned in TextHashKernelSpec against the
  * HOF compositions they replaced, which the DuckDB oracles replay):
  *   - minhash_md5(sh, k)[i] = MIN over shingles s of
  *     md5(i || ':' || s) as lowercase hex; null element when sh has
  *     no non-null shingle; null shingles skipped (array_min
  *     semantics); null input → null.
  *   - simhash_md5(toks) = the tf-weighted Charikar fold over the
  *     first 16 hex nibbles of md5(token), nibble-major bit order:
  *     bit b set iff 2·|{t : nibble(b/4)(t) has bit (3−b%4)}| > |toks|.
  *     Null tokens count in |toks| but never in a bit majority
  *     (filter-over-null semantics of the HOF form).
  *   - winnow_md5(grams, w) = array_distinct of the per-window minima
  *     of md5(gram) over every w-gram sliding window, first-occurrence
  *     order, null gram hashes skipped inside a window (array_min),
  *     all-null windows dropped; < w grams → empty array.
  *
  * Codegen: whole-stage codegen calls compute() on the expression
  * instance via addReferenceObj — the hot loop is compiled Scala (one
  * thread-local MessageDigest, zero per-hash allocation on the
  * non-improving path), and the surrounding stage stays one codegen
  * span (the LshBuckets/CentTopK discipline).
  */
object TextHashExpressions {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HEX: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")

  private def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HEX(d(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less16(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def arrayStringType(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"needs array<string> input, got $other")
  }

  /** k md5 min-hashes of a shingle array in one compiled pass —
    * element i is the minimum lowercase-hex md5("i:" + shingle). */
  case class MinhashMd5(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"minhash_md5: k must be positive, got $k")

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = arrayStringType(child)

    @transient private lazy val prefixes: Array[Array[Byte]] =
      Array.tabulate(k)(i => (i.toString + ":").getBytes("UTF-8"))

    def compute(x: ArrayData): ArrayData = {
      val md = mdLocal.get()
      val n = x.numElements()
      val mins = new Array[Array[Byte]](k)
      val buf = new Array[Byte](16)
      var j = 0
      while (j < n) {
        if (!x.isNullAt(j)) {
          val sb = x.getUTF8String(j).getBytes
          var i = 0
          while (i < k) {
            md.reset()
            md.update(prefixes(i))
            md.update(sb)
            md.digest(buf, 0, 16)
            if (mins(i) == null) mins(i) = buf.clone()
            else if (less16(buf, mins(i))) System.arraycopy(buf, 0, mins(i), 0, 16)
            i += 1
          }
        }
        j += 1
      }
      val out = new Array[AnyRef](k)
      var i = 0
      while (i < k) {
        if (mins(i) != null) out(i) = hex32(mins(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashMd5", this, classOf[MinhashMd5].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "minhash_md5"
  }

  /** tf-weighted Charikar SimHash over md5 nibbles, one compiled
    * pass: 64 bit-majorities over the first 8 digest bytes. */
  case class SimhashMd5(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = arrayStringType(child)

    def compute(x: ArrayData): Long = {
      val md = mdLocal.get()
      val n = x.numElements()
      val cnt = new Array[Int](64)
      val buf = new Array[Byte](16)
      var j = 0
      while (j < n) {
        if (!x.isNullAt(j)) {
          md.reset()
          md.update(x.getUTF8String(j).getBytes)
          md.digest(buf, 0, 16)
          var p = 0
          while (p < 16) {
            val by = buf(p >> 1)
            val nib = if ((p & 1) == 0) (by >> 4) & 0xF else by & 0xF
            val b0 = p << 2
            cnt(b0) += (nib >> 3) & 1
            cnt(b0 + 1) += (nib >> 2) & 1
            cnt(b0 + 2) += (nib >> 1) & 1
            cnt(b0 + 3) += nib & 1
            p += 1
          }
        }
        j += 1
      }
      var acc = 0L
      var b = 0
      while (b < 64) {
        if (2 * cnt(b) > n) acc |= (1L << b)
        b += 1
      }
      acc
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhashMd5", this, classOf[SimhashMd5].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "simhash_md5"
  }

  /** MOSS winnowing selection in one compiled pass: md5 per gram,
    * minimum per sliding window of `window` hashes, distinct in
    * first-occurrence order. */
  case class WinnowMd5(child: Expression, window: Int) extends UnaryExpression {
    require(window >= 1, s"winnow_md5: window must be positive, got $window")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = arrayStringType(child)

    def compute(x: ArrayData): ArrayData = {
      val md = mdLocal.get()
      val n = x.numElements()
      if (n < window) return new GenericArrayData(new Array[AnyRef](0))
      val digests = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) {
        if (!x.isNullAt(j)) {
          md.reset()
          md.update(x.getUTF8String(j).getBytes)
          val d = new Array[Byte](16)
          md.digest(d, 0, 16)
          digests(j) = d
        }
        j += 1
      }
      val seen = new java.util.HashSet[UTF8String]()
      val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
      var i = 0
      val last = n - window
      while (i <= last) {
        var min: Array[Byte] = null
        var w = 0
        while (w < window) {
          val d = digests(i + w)
          if (d != null && (min == null || less16(d, min))) min = d
          w += 1
        }
        if (min != null) {
          val h = hex32(min)
          if (seen.add(h)) out += h
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnowMd5", this, classOf[WinnowMd5].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "winnow_md5"
  }

  /** k xxhash64 min-hashes in one compiled pass — the FAST (scale
    * pipeline) family twin of [[MinhashMd5]]. Replicates
    * `array_min(transform(sh, s => xxhash64(s, i)))` exactly:
    * Spark's XxHash64 folds its children from seed 42, so
    * xxhash64(s, i) = hashInt(i, hashUnsafeBytes(s, 42)) — the string
    * hash is seed-independent, so the kernel computes it ONCE per
    * shingle and mixes k cheap hashInt steps (the HOF paid k full
    * string hashes). A null shingle contributes hashInt(i, 42)
    * (Spark's hash functions skip null children, leaving the seed) —
    * mirrored, not skipped. Signed long min, exactly array_min. */
  case class MinhashXx64(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, s"minhash_xx64: k must be positive, got $k")

    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = arrayStringType(child)

    def compute(x: ArrayData): ArrayData = {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val n = x.numElements()
      if (n == 0) return new GenericArrayData(new Array[AnyRef](k))
      val mins = new Array[Long](k)
      java.util.Arrays.fill(mins, Long.MaxValue)
      var j = 0
      while (j < n) {
        val h1 =
          if (x.isNullAt(j)) 42L
          else {
            val s = x.getUTF8String(j)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        var i = 0
        while (i < k) {
          val h = XXH64.hashInt(i, h1)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashXx64", this, classOf[MinhashXx64].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "minhash_xx64"
  }

  /** Fast-family SimHash twin of [[SimhashMd5]]: per-token 64-bit
    * xxhash64 (seed 42; a null token leaves the seed, mirrored), bit b
    * of the fingerprint = majority of (h >> b) & 1 — exactly the
    * aggregate/filter fold in [[graft.operators.Dedup.simhash]]. */
  case class SimhashXx64(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = arrayStringType(child)

    def compute(x: ArrayData): Long = {
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val n = x.numElements()
      val cnt = new Array[Int](64)
      var j = 0
      while (j < n) {
        val h =
          if (x.isNullAt(j)) 42L
          else {
            val s = x.getUTF8String(j)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        var b = 0
        while (b < 64) {
          cnt(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        j += 1
      }
      var acc = 0L
      var b = 0
      while (b < 64) {
        if (2 * cnt(b) > n) acc |= (1L << b)
        b += 1
      }
      acc
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhashXx64", this, classOf[SimhashXx64].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "simhash_xx64"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def minhash_md5(sh: Column, k: Int): Column =
    column(MinhashMd5(expression(sh), k))

  def simhash_md5(toks: Column): Column =
    column(SimhashMd5(expression(toks)))

  def winnow_md5(grams: Column, window: Int): Column =
    column(WinnowMd5(expression(grams), window))

  def minhash_xx64(sh: Column, k: Int): Column =
    column(MinhashXx64(expression(sh), k))

  def simhash_xx64(toks: Column): Column =
    column(SimhashXx64(expression(toks)))
}
