package graft.sources

/** Shared SVG/HTML text helpers for the render sinks ([[Maps]],
  * [[Charts]], [[Reports]]) — one copy of the coordinate format and the
  * markup escape so the escaping rules cannot drift between renders.
  */
private[sources] object Svg {

  /** 2-decimal fixed-point coordinates: enough for pixel geometry,
    * locale-independent, and short enough to keep goldens readable.
    */
  def fmt(d: Double): String = f"$d%.2f"

  /** Escapes for BOTH element-text and attribute context (quotes
    * included — harmless in text nodes, required in attributes).
    */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
