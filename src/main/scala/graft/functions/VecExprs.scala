package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen kernels for the hot array folds.
  *
  * Catalyst's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * INTERPRETED — each lambda step allocates and re-projects. For a per-pair
  * dot product or a per-doc k-wide minhash fold that interpretation dominates
  * the whole query (round-1: `ann_cosine_topk` 6.8 s, `dedup_simhash` 7.1 s
  * at sf0.1). These expressions generate a tight Java loop instead
  * (whole-stage codegen), with interpreted fallback for completeness.
  *
  * Numeric parity: each kernel accumulates in exactly the same left-to-right
  * IEEE order as the declarative formulation it replaces (and as the DuckDB
  * oracle), so hash-checked results do not change.
  */
object VecExprs {

  private def elemGet(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case other => throw new IllegalArgumentException(s"unsupported element type: $other")
  }

  private def elemVal(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported element type: $other")
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def argMaxCos(v: Column, cents: Seq[Seq[Double]], cnorms: Seq[Double]): Column =
    ColumnBridge.column(VecArgMaxCos(ColumnBridge.expression(v),
      cents.map(_.toArray).toArray, cnorms.toArray))

  def broadcastCentroids(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Double]], cnorms: Seq[Double]): org.apache.spark.broadcast.Broadcast[CentroidMatrix] =
    spark.sparkContext.broadcast(new CentroidMatrix(cents.map(_.toArray).toArray, cnorms.toArray))

  def argMaxCosBroadcast(v: Column,
      bc: org.apache.spark.broadcast.Broadcast[CentroidMatrix]): Column =
    ColumnBridge.column(VecArgMaxCosBroadcast(ColumnBridge.expression(v), bc))

  def minHashSig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes),
      OracleHash.coefA(k).toArray, OracleHash.coefB(k).toArray))

  def simHashSketch(hashes: Column): Column =
    ColumnBridge.column(SimHashSketch(ColumnBridge.expression(hashes)))

  def simHashBlockPairs(rows: Column, maxHamming: Int): Column =
    ColumnBridge.column(SimHashBlockPairs(ColumnBridge.expression(rows), maxHamming))

  /** In-order dot product of two numeric arrays (length = the shorter). */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(aa.numElements(), ba.numElements())
      var acc = 0.0; var i = 0
      while (i < n) { acc += elemVal(lt, aa, i) * elemVal(rt, ba, i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${elemGet(elemType(left), a, i)} * ${elemGet(elemType(right), b, i)};
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def fixedDotE6(a: Column, b: Column): Column =
    ColumnBridge.column(VecFixedDotE6(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** FIXED-POINT dot product on a 1e-6 integer grid: each per-element product
    * is rounded to a long once (half away from zero — same result as Spark's
    * `round()` [BigDecimal HALF_UP over the shortest decimal repr] and
    * DuckDB's `round()` on every double: 0.5-offsets are exactly
    * representable, so the decimal and binary comparisons against the tie
    * point can never disagree) and summed as longs, so the fold is
    * ACCUMULATION-ORDER-INDEPENDENT — a plain double fold is not, and at sf1
    * a last-ulp Spark-vs-DuckDB difference landed exactly on a round() tie.
    * Replaces the interpreted `zip_with`+`aggregate`+`round` formulation,
    * which ran per-pair in the near-dup verify stage at ~7× the cost
    * (embed_near_dup 9.7 s vs 1.3 s at sf0.1). */
  case class VecFixedDotE6(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(aa.numElements(), ba.numElements())
      var acc = 0L; var i = 0
      while (i < n) {
        val p = elemVal(lt, aa, i) * elemVal(rt, ba, i) * 1e6
        acc += (if (p >= 0) java.lang.Math.round(p) else -java.lang.Math.round(-p))
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc"); val p = ctx.freshName("p")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $p = ${elemGet(elemType(left), a, i)} * ${elemGet(elemType(right), b, i)} * 1e6;
           |  $acc += ($p >= 0) ? java.lang.Math.round($p) : -java.lang.Math.round(-$p);
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Index of the centroid maximizing round(cos(v, c_i)·1e9), ties → lowest
    * index — ONE kernel looping a baked C×D matrix instead of C unrolled
    * [[VecDot]] expressions + a window. The unrolled form's generated code
    * grows O(C·D) and its Janino compile alone dominated `ann_ivf_topk` at
    * bench scale; at real scale C ~ √N makes unrolling impossible. Scoring
    * math is bit-identical to the declarative form it replaces:
    * dot accumulated left-to-right, cos = dot/(sqrt(dot(v,v))·cnorm),
    * HALF_UP rounding away from zero at 1e9 (Spark round() semantics). */
  case class VecArgMaxCos(child: Expression, cents: Array[Array[Double]],
      cnorms: Array[Double]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      argMaxCosEval(v, elemType, cents, cnorms)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cRef = ctx.addReferenceObj("centsMatrix", cents, "double[][]")
        val nRef = ctx.addReferenceObj("centNorms", cnorms, "double[]")
        val vn = ctx.freshName("vn"); val d = ctx.freshName("d"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val cv = ctx.freshName("cv"); val acc = ctx.freshName("acc")
        val cos9 = ctx.freshName("cos9"); val best = ctx.freshName("best")
        val bestIdx = ctx.freshName("bestIdx"); val x = ctx.freshName("x")
        s"""
           |int $d = $a.numElements();
           |double $vn = 0.0;
           |for (int $i = 0; $i < $d; $i++) {
           |  double $x = ${elemGet(elemType, a, i)};
           |  $vn += $x * $x;
           |}
           |$vn = java.lang.Math.sqrt($vn);
           |long $best = java.lang.Long.MIN_VALUE; int $bestIdx = 0;
           |for (int $i = 0; $i < $cRef.length; $i++) {
           |  double[] $cv = $cRef[$i];
           |  int ${j}n = java.lang.Math.min($d, $cv.length);
           |  double $acc = 0.0;
           |  for (int $j = 0; $j < ${j}n; $j++) {
           |    $acc += ${elemGet(elemType, a, j)} * $cv[$j];
           |  }
           |  double ${x}c = $acc / ($vn * $nRef[$i]) * 1.0E9;
           |  long $cos9 = ${x}c >= 0
           |    ? (long) java.lang.Math.floor(${x}c + 0.5d)
           |    : (long) java.lang.Math.ceil(${x}c - 0.5d);
           |  if ($cos9 > $best) { $best = $cos9; $bestIdx = $i; }
           |}
           |${ev.value} = $bestIdx;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** [[VecArgMaxCos]] with the centroid matrix behind a Spark Broadcast
    * instead of baked into the expression: the task closure carries a
    * fixed-size handle, so at C ~ √N (10^4-10^5 centroids × 256+ dims —
    * 10-100 MB of doubles) the plan/closure stays flat and the matrix ships
    * to each executor ONCE over the torrent protocol rather than inside
    * every task's serialized closure. Scoring math is bit-identical
    * (delegates to the same [[argMaxCosEval]] loop). */
  case class VecArgMaxCosBroadcast(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[CentroidMatrix]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

    @transient private lazy val mat: CentroidMatrix = bc.value

    override def nullSafeEval(a: Any): Any =
      argMaxCosEval(a.asInstanceOf[ArrayData], elemType, mat.cents, mat.norms)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val bRef = ctx.addReferenceObj("centsBcast", bc,
          "org.apache.spark.broadcast.Broadcast")
        // resolve the broadcast once per operator instance, not per row
        val cm = ctx.addMutableState("graft.functions.CentroidMatrix",
          "graftCentMat", _ => "")
        val kind = elemType match {
          case FloatType => 0; case DoubleType => 1
          case IntegerType => 2; case LongType => 3
          case other => throw new IllegalArgumentException(s"unsupported element type: $other")
        }
        s"""
           |if ($cm == null) {
           |  $cm = (graft.functions.CentroidMatrix) $bRef.value();
           |}
           |${ev.value} = graft.functions.VecExprs.argMaxCosEvalJava($a, $kind, $cm.cents(), $cm.norms());
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Static entry for generated code (no DataType objects in codegen): same
    * loop as [[argMaxCosEval]]. Kind: 0=float 1=double 2=int 3=long. */
  def argMaxCosEvalJava(v: ArrayData, kind: Int,
      cents: Array[Array[Double]], cnorms: Array[Double]): Int = {
    val et: DataType = kind match {
      case 0 => FloatType; case 1 => DoubleType; case 2 => IntegerType; case _ => LongType
    }
    argMaxCosEval(v, et, cents, cnorms)
  }

  /** Interpreted twin of [[VecArgMaxCos]]'s generated loop (same IEEE order). */
  def argMaxCosEval(v: ArrayData, et: DataType,
      cents: Array[Array[Double]], cnorms: Array[Double]): Int = {
    val d = v.numElements()
    var vn = 0.0; var i = 0
    while (i < d) { val x = elemVal(et, v, i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    var best = Long.MinValue; var bestIdx = 0; i = 0
    while (i < cents.length) {
      val cv = cents(i)
      val n = math.min(d, cv.length)
      var acc = 0.0; var j = 0
      while (j < n) { acc += elemVal(et, v, j) * cv(j); j += 1 }
      val xc = acc / (vn * cnorms(i)) * 1e9
      val cos9 = if (xc >= 0) math.floor(xc + 0.5).toLong else math.ceil(xc - 0.5).toLong
      if (cos9 > best) { best = cos9; bestIdx = i }
      i += 1
    }
    bestIdx
  }

  def shingleH32(words: Column, text: Column, n: Int): Column =
    ColumnBridge.column(ShingleMd5Hash(ColumnBridge.expression(words),
      ColumnBridge.expression(text), n, pack62 = false))

  def shingleH62(words: Column, text: Column, n: Int): Column =
    ColumnBridge.column(ShingleMd5Hash(ColumnBridge.expression(words),
      ColumnBridge.expression(text), n, pack62 = true))

  private def md5HashOf(md: java.security.MessageDigest, bytes: Array[Byte], pack62: Boolean): Long = {
    md.reset()
    val d = md.digest(bytes)
    def u32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    if (pack62) (u32(0) & 0x7fffffffL) + (u32(4) & 0x7fffffffL) * 2147483648L
    else u32(0)
  }

  /** Static kernel body (also invoked from generated code): hash every
    * n-word shingle of `words` (joined by single spaces, byte-level — equal
    * to md5 of `concat_ws(" ", slice(words, i+1, n))`); fewer than n words ⇒
    * one hash of the whole original text (the `shingles()` contract). */
  def shingleMd5Hashes(words: ArrayData, text: org.apache.spark.unsafe.types.UTF8String,
      n: Int, pack62: Boolean): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array(md5HashOf(md, text.getBytes, pack62)))
    val wb = Array.tabulate(len)(j => words.getUTF8String(j).getBytes)
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var size = n - 1; var j = 0
      while (j < n) { size += wb(i + j).length; j += 1 }
      val buf = new Array[Byte](size); var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val w = wb(i + j)
        System.arraycopy(w, 0, buf, pos, w.length); pos += w.length
        j += 1
      }
      out(i) = md5HashOf(md, buf, pack62)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused shingle-construction + md5 hashing. The declarative form —
    * `transform(sequence(…), i -> concat_ws(" ", slice(words, …)))` with
    * `words = split(text)` — re-evaluates the free `split` subexpression for
    * EVERY lambda element (interpreted HOF semantics; pre-projecting the
    * words column does not help because CollapseProject re-inlines it), which
    * made shingling ~90% of the whole minhash query. Here `words` is
    * evaluated once per row and the shingles never materialize as strings. */
  case class ShingleMd5Hash(left: Expression, right: Expression, n: Int, pack62: Boolean)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(words: Any, text: Any): Any =
      shingleMd5Hashes(words.asInstanceOf[ArrayData],
        text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, pack62)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (w, t) =>
        s"${ev.value} = graft.functions.VecExprs.shingleMd5Hashes($w, $t, $n, $pack62);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def md5H32Array(strings: Column): Column =
    ColumnBridge.column(Md5HashArray(ColumnBridge.expression(strings), pack62 = false))

  def md5H62Array(strings: Column): Column =
    ColumnBridge.column(Md5HashArray(ColumnBridge.expression(strings), pack62 = true))

  /** md5-derived integer hash per array element, in one codegen loop.
    *
    * pack62=false: unsigned 32-bit from md5 bytes [0..3] — identical to
    * `conv(substr(md5(s),1,8),16,10)` (hex chars 1-8 ARE bytes 0-3).
    * pack62=true:  (b[0..3] & 0x7fffffff) + (b[4..7] & 0x7fffffff) * 2^31 —
    * identical to [[OracleHash.h62FromMd5Hex]] / [[OracleHash.sqlH62]].
    *
    * An interpreted `transform(arr, s -> conv(substr(md5(s),…)))` costs ~30 µs
    * per element (lambda re-projection + hex round-trip) and dominated the
    * whole minhash query; this loop hashes bytes directly. */
  case class Md5HashArray(child: Expression, pack62: Boolean) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    private def hashOf(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def u32(off: Int): Long =
        ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
          ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
      if (pack62) (u32(0) & 0x7fffffffL) + (u32(4) & 0x7fffffffL) * 2147483648L
      else u32(0)
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new Array[Long](arr.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = hashOf(arr.getUTF8String(i).getBytes)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
          v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                  |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                  |""".stripMargin)
        val out = ctx.freshName("out"); val i = ctx.freshName("i")
        val d = ctx.freshName("d"); val h1 = ctx.freshName("h1")
        val value =
          if (pack62)
            s"($h1 & 0x7fffffffL) + ((((($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) | " +
              s"(($d[6] & 0xffL) << 8) | ($d[7] & 0xffL)) & 0x7fffffffL) * 2147483648L)"
          else h1
        s"""
           |long[] $out = new long[$arr.numElements()];
           |for (int $i = 0; $i < $out.length; $i++) {
           |  $md.reset();
           |  byte[] $d = $md.digest($arr.getUTF8String($i).getBytes());
           |  long $h1 = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
           |             (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
           |  $out[$i] = $value;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(VecEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** number of equal positions of two array<long> (the minhash-signature
    * similarity estimator's numerator) — runs once per CANDIDATE pair, which
    * can be orders of magnitude more than the emitted pairs. */
  case class VecEqCount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(aa.numElements(), ba.numElements())
      var c = 0; var i = 0
      while (i < n) { if (aa.getLong(i) == ba.getLong(i)) c += 1; i += 1 }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $c++;
           |}
           |${ev.value} = $c;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** k-permutation minhash over an array<long> of base hashes:
    * sig[j] = min over h of (a_j*h + b_j) mod (2^61-1). a_j < 2^30 and
    * h < 2^32 keep the product positive inside a signed long, so Java `%`
    * equals the mathematical mod. */
  case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
      extends UnaryExpression {
    private val k = as.length
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % OracleHash.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val aRef = ctx.addReferenceObj("mhA", as, "long[]")
        val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
        val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
        s"""
           |long[] $mins = new long[$k];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i = 0; $i < $arr.numElements(); $i++) {
           |  long $h = $arr.getLong($i);
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${OracleHash.P}L;
           |    if ($v < $mins[$j]) $mins[$j] = $v;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 62-bit simhash sketch over an array<long> of packed 62-bit hashes:
    * bit b of the sketch is set iff the ±1 votes of bit b over all hashes sum
    * positive. */
  /** All within-hamming pairs of one pigeonhole BLOCK: input is the block's
    * collected rows `array<struct<doc, sketch: long>>` (bounded ≤ bucketCap
    * by [[TextDedup.dropOversizedBuckets]]), output
    * `array<struct<id_a, id_b, hamming: int>>` with id_a < id_b under the
    * doc type's natural ordering and hamming ≤ maxHamming — exactly the rows
    * the block's self-join `a.doc < b.doc AND bit_count(a.sketch ^ b.sketch)
    * <= maxHamming` produced, minus the ~cap² intermediate join-row
    * materialization: the nested loop emits SURVIVORS only. Interpreted eval
    * (CodegenFallback) is deliberate — one call per block amortizes the
    * expression overhead over ≤cap² primitive popcounts, and the projection
    * it sits in handles thousands of rows, not billions. Null docs are
    * skipped (join parity: `null < x` is null). */
  case class SimHashBlockPairs(child: Expression, maxHamming: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    private lazy val rowType: StructType =
      child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    private lazy val docType: DataType = rowType.fields(0).dataType
    @transient private lazy val docOrdering =
      org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(docType)

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id_a", docType), StructField("id_b", docType),
      StructField("hamming", IntegerType, nullable = false))), containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val docs = new Array[Any](n)
      val sketches = new Array[Long](n)
      var m = 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val r = arr.getStruct(i, 2)
          if (!r.isNullAt(0) && !r.isNullAt(1)) {
            docs(m) = r.get(0, docType) match {
              // defensive copy: an UnsafeRow view's string points into the
              // shared array buffer; the emitted rows outlive this struct
              case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
              case x => x
            }
            sketches(m) = r.getLong(1); m += 1
          }
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var a = 0
      while (a < m) {
        val sa = sketches(a)
        var b = a + 1
        while (b < m) {
          val h = java.lang.Long.bitCount(sa ^ sketches(b))
          if (h <= maxHamming) {
            val cmp = docOrdering.compare(docs(a), docs(b))
            if (cmp < 0)
              out += org.apache.spark.sql.catalyst.InternalRow(docs(a), docs(b), h)
            else if (cmp > 0)
              out += org.apache.spark.sql.catalyst.InternalRow(docs(b), docs(a), h)
          }
          b += 1
        }
        a += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class SimHashSketch(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Long](62)
      var i = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 62) { counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L); b += 1 }
        i += 1
      }
      var sk = 0L; var b = 0
      while (b < 62) { if (counts(b) > 0) sk |= 1L << b; b += 1 }
      sk
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val counts = ctx.freshName("counts"); val i = ctx.freshName("i")
        val b = ctx.freshName("b"); val h = ctx.freshName("h"); val sk = ctx.freshName("sk")
        s"""
           |long[] $counts = new long[62];
           |for (int $i = 0; $i < $arr.numElements(); $i++) {
           |  long $h = $arr.getLong($i);
           |  for (int $b = 0; $b < 62; $b++) {
           |    $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
           |  }
           |}
           |long $sk = 0L;
           |for (int $b = 0; $b < 62; $b++) { if ($counts[$b] > 0) $sk |= 1L << $b; }
           |${ev.value} = $sk;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}
