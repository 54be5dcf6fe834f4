package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text signal (the corpus-quality heuristic behind
  * low-entropy filters: highly repetitive or templated documents deflate
  * far below natural prose). Runs the JDK's zlib Deflater per row inside
  * whole-stage codegen — no UDF, no Python, no external library.
  *
  * The ratio is deflated-size / raw-size over the UTF-8 bytes with raw
  * (nowrap) framing, so short documents aren't dominated by the zlib
  * header. Values are deterministic for a fixed JDK; queries that must
  * be engine-exact against the DuckDB oracle emit acceptance booleans
  * (bounds, relative ordering) rather than raw ratios — the q53 pattern.
  */
object CompressionExpr {

  /** Per-(thread, level) reused Deflater + output buffer (round-13
    * review): creating/destroying a native zlib state (~256 KB window
    * alloc) plus a fresh 8 KB buffer PER ROW dominated the corpus-scan
    * hot path for documents shorter than the setup itself. reset()
    * restores identical deflate state, so values are unchanged; levels
    * are a tiny fixed set (the q68 battery uses 1/6/9).
    *
    * Each thread's map registers a Cleaner on its OWNING THREAD that
    * `end()`s the pooled native states when the thread is collected
    * (round-13 ADVICE): long-lived executor pools never trigger it, but
    * under thread churn (test suites, local mode) the JDK's own
    * per-Deflater cleanup otherwise strands ~256 KB of native window
    * per abandoned thread until GC happens to notice the tiny heap
    * wrapper objects.
    */
  private val cleaner = java.lang.ref.Cleaner.create()

  private final class PoolCloser(
      m: java.util.HashMap[Int, java.util.zip.Deflater]) extends Runnable {
    override def run(): Unit = m.values().forEach(_.end())
  }

  private val pool =
    new ThreadLocal[java.util.HashMap[Int, java.util.zip.Deflater]] {
      override def initialValue() = {
        val m = new java.util.HashMap[Int, java.util.zip.Deflater]()
        cleaner.register(Thread.currentThread(), new PoolCloser(m))
        m
      }
    }
  private val bufPool = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](8192)
  }

  def deflateRatio(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val m = pool.get()
    var d = m.get(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level, /* nowrap = */ true)
      m.put(level, d)
    }
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = bufPool.get()
    var total = 0L
    while (!d.finished()) {
      val n = d.deflate(buf)
      if (n == 0 && !d.finished() && d.needsInput()) return 1.0 // defensive
      total += n
    }
    total.toDouble / bytes.length
  }
}

/** deflate(text).length / text.length as double; empty/null-safe. */
case class DeflateRatioExpr(child: Expression, level: Int)
  extends UnaryExpression with Serializable {
  require(level >= 1 && level <= 9, s"deflate level must be in [1,9], got $level")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(input: Any): Any =
    CompressionExpr.deflateRatio(input.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CompressionExpr.deflateRatio($c, $level)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}
