package graft.sources

/** Shared SVG/HTML text helpers for the render sinks ([[Maps]],
  * [[Charts]], [[Reports]]) — one copy of the coordinate format and the
  * markup escape so the escaping rules cannot drift between renders.
  */
private[graft] object Svg {

  /** 2-decimal fixed-point coordinates: enough for pixel geometry, and
    * short enough to keep goldens readable. Locale.ROOT is load-bearing:
    * the f-interpolator uses the default JVM locale, which under e.g.
    * de_DE emits comma decimals and breaks SVG path syntax (and with it
    * the byte-deterministic golden contract of every render).
    */
  def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

  /** Escapes for BOTH element-text and attribute context (quotes
    * included — harmless in text nodes, required in attributes).
    */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
