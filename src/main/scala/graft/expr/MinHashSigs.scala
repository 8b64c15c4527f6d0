package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All K MinHash signatures of a shingle set in ONE pass — the native
  * replacement for the higher-order-function pipeline in
  * `ops/TextSim.minhashLsh` (ceil(K/4) `transform(sh, md5(concat(...)))`
  * columns + an `aggregate` fold per digest).
  *
  * Bit-identical contract with the HOF/DuckDB formulation (asserted in
  * TextSimSpec): sig j = min over shingles x of
  * `substring(md5(concat(j/4, ":", x)), (j%4)*8+1, 8)` — this
  * implementation exploits that the lexicographic min of a fixed-width
  * lowercase-hex block equals the numeric min of its 4 digest bytes read
  * as an unsigned 32-bit int, so the whole computation is per-shingle:
  * ceil(K/4) MD5 digests and K unsigned compares, with ZERO intermediate
  * arrays or substring allocations; hex strings materialize only once at
  * the end (K values per document). Empty input yields NULL (the HOF
  * `array_min` of an empty transform), keeping empty docs out of every
  * LSH band.
  *
  * Codegen is a single static call (the Spark `StaticInvoke` pattern):
  * the projection stays inside WholeStageCodegen with no
  * interpreted-eval boundary.
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // NULL for empty shingle sets
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(in: Any): Any =
    MinHashSigs.compute(in.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MinHashSigs.compute($c, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  import DigestUtil.HexChars

  /** "m:" prefix byte tables, cached per digest count (pure function
    * of k — rebuilding per row was allocation noise).
    */
  private val PrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixesFor(nDigests: Int): Array[Array[Byte]] =
    PrefixCache.computeIfAbsent(nDigests,
      n => Array.tabulate(n)(m => s"$m:".getBytes("UTF-8")))

  /** Static kernel shared by interpreted eval and generated code.
    * NULL elements are SKIPPED — the same semantics as the HOF
    * formulation, where md5(concat(_, NULL)) is NULL and `array_min`
    * ignores NULL entries (the shingle builders never emit nulls, so
    * this is a safety contract, not a hot case); an all-null or empty
    * array yields NULL overall.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val nDigests = (k + 3) / 4
    val prefixes = prefixesFor(nDigests)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, 0xFFFFFFFFL)
    val md = DigestUtil.md5()
    var nonNull = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        nonNull += 1
        val bytes = arr.getUTF8String(i).getBytes
        var m = 0
        while (m < nDigests) {
          md.reset()
          md.update(prefixes(m))
          md.update(bytes)
          val d = md.digest()
          val blocks = math.min(4, k - 4 * m)
          var bk = 0
          while (bk < blocks) {
            val v = ((d(4 * bk) & 0xFFL) << 24) | ((d(4 * bk + 1) & 0xFFL) << 16) |
                    ((d(4 * bk + 2) & 0xFFL) << 8) | (d(4 * bk + 3) & 0xFFL)
            val j = 4 * m + bk
            if (v < mins(j)) mins(j) = v
            bk += 1
          }
          m += 1
        }
      }
      i += 1
    }
    if (nonNull == 0) return null
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) {
      val chars = new Array[Char](8)
      var b = 0
      while (b < 8) {
        chars(b) = HexChars(((mins(j) >>> ((7 - b) * 4)) & 0xF).toInt)
        b += 1
      }
      out(j) = UTF8String.fromString(new String(chars))
      j += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashFunctions {
  /** DataFrame-DSL entry point. */
  def minhash_sigs(shingles: Column, k: Int): Column =
    bridge.column(MinHashSigs(bridge.expression(shingles), k))
}
