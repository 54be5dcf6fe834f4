package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presentation-layer chart outputs — the last of the reference's plot
  * scripts (SURVEY.md §2.1 K5 tail):
  *
  *  - stacked-area plankton-group biomass time series
  *    (code/plot/plot_PACE.R:31-68, one facet per cruise,
  *    `geom_area(position = "stack")`, Brewer Set2 fills, y clipped by
  *    `coord_cartesian`);
  *  - the poster's horizontal occurrence bars
  *    (code/plot/plots-poster.R:59-77, `reorder(class, count)` +
  *    `coord_flip`, black bar outlines, 5% headroom on the value axis);
  *  - the microscopy-comparison scatter facets
  *    (code/plot/compare_microscopy.R:139-162, one free-scaled panel
  *    per taxon, dark-blue points at alpha 0.7).
  *
  * Same rendering contract as [[Maps]]: the reference draws with
  * ggplot2/ragg; this engine emits self-contained, byte-deterministic
  * SVG a golden test can pin, with zero rendering dependencies. And the
  * same scale discipline: every input here is an ALREADY-AGGREGATED
  * small frame (per-group time series, per-class counts, per-station
  * pairs) — the 100 TB-side reduction happens in the oracle-checked
  * queries (q96/q97, q25/q14); only the plot-grain rows are collected.
  */
object Charts {

  /** RColorBrewer Set2 (plot_PACE.R:37 `scale_fill_brewer("Set2")`) —
    * published palette values, assigned to series in sorted-name order
    * exactly like ggplot assigns them to factor levels.
    */
  private[sources] val Set2 = Array(
    "#66c2a5", "#fc8d62", "#8da0cb", "#e78ac3",
    "#a6d854", "#ffd92f", "#e5c494", "#b3b3b3")

  private def fmt(d: Double): String = Svg.fmt(d)

  private def escape(s: String): String = Svg.escape(s)

  /** Stacked-area time series, one panel per facet value
    * (plot_PACE.R:31-47): series stack in sorted-name order (ggplot
    * stacks factor levels alphabetically), each facet gets its own
    * x-range (`scales = "free_x"` — the y-scale stays SHARED across
    * facets like ggplot's free_x, using the global stacked max when
    * `yMax` is unset), and the y-axis is CLIPPED at `yMax` without
    * dropping data — `coord_cartesian(ylim = c(0, 70))` semantics, not
    * a filter. Rows with a null facet/time/group are dropped (na.rm).
    *
    * @param series plot-grain frame: one row per
    *               (facet, time, group, value); value rows are summed
    *               if duplicated
    * @param yMax   coord_cartesian upper limit; pass
    *               `Double.PositiveInfinity` for an unclipped axis
    */
  def stackedAreaChartSvg(series: DataFrame, facetCol: String,
      timeCol: String, groupCol: String, valueCol: String,
      yMax: Double = Double.PositiveInfinity,
      panelW: Int = 360, panelH: Int = 240, perRow: Int = 3): String = {
    // null filters run on the CASTED values (the barChartSvg /
    // scatterFacetSvg discipline): an uncastable time string or an
    // all-null value group otherwise NPEs the primitive getters below
    // and kills the whole report render (round-11 review)
    val rows = series
      .select(col(facetCol).cast("string").as("f"),
        col(timeCol).cast("timestamp").as("t"),
        col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v0"))
      .filter(col("f").isNotNull && col("t").isNotNull &&
        col("g").isNotNull && col("v0").isNotNull)
      .groupBy(col("f"), col("t"), col("g"))
      .agg(sum(col("v0")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getDouble(3)))
      .sortBy(r => (r._1, r._2, r._3))
    val groups = rows.map(_._3).distinct.sorted
    val colorOf = groups.zipWithIndex
      .map { case (g, i) => g -> Set2(i % Set2.length) }.toMap
    val facets = rows.map(_._1).distinct.sorted
    val pad = 28
    val nRows = (facets.length + perRow - 1) / perRow
    val w = perRow * (panelW + pad) + pad
    val h = math.max(1, nRows) * (panelH + pad + 18) + pad
    // shared y-scale (free_x frees only x): global stacked max over ALL
    // facets when no explicit limit — a small facet must read small
    val top = math.max(
      if (yMax.isInfinity)
        rows.groupBy(r => (r._1, r._2)).values
          .map(_.map(_._4).sum).foldLeft(0.0)(math.max)
      else yMax, 1e-9)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
    facets.zipWithIndex.foreach { case (f, fi) =>
      val x0 = pad + (fi % perRow) * (panelW + pad)
      val y0 = pad + (fi / perRow) * (panelH + pad + 18)
      val fr = rows.filter(_._1 == f)
      val times = fr.map(_._2).distinct.sorted // free_x: per-facet range
      val byTg = fr.map(r => (r._2, r._3) -> r._4).toMap
      def px(t: Long): Double =
        if (times.length < 2 || times.last == times.head) x0 + panelW / 2.0
        else x0 + (t - times.head).toDouble / (times.last - times.head) * panelW
      def py(v: Double): Double =
        y0 + panelH - math.min(v, top) / top * panelH
      sb ++= s"""  <text x="${fmt(x0 + panelW / 2.0)}" y="${fmt(y0 - 8.0)}" text-anchor="middle" font-weight="bold" font-size="12">${escape(f)}</text>\n"""
      sb ++= s"""  <rect x="$x0" y="$y0" width="$panelW" height="$panelH" fill="white" stroke="#cccccc"/>\n"""
      // bottom-up: each band is the polygon between cumulative sums
      var below = times.map(_ => 0.0)
      groups.foreach { g =>
        val upper = times.zip(below).map { case (t, b) =>
          b + byTg.getOrElse((t, g), 0.0)
        }
        if (upper.zip(below).exists { case (u, b) => u != b }) {
          val fwd = times.zip(upper).map { case (t, v) =>
            s"${fmt(px(t))},${fmt(py(v))}" }
          val back = times.zip(below).reverse.map { case (t, v) =>
            s"${fmt(px(t))},${fmt(py(v))}" }
          sb ++= s"""  <polygon points="${(fwd ++ back).mkString(" ")}" fill="${colorOf(g)}" fill-opacity="0.8"><title>${escape(g)}</title></polygon>\n"""
        }
        below = upper
      }
    }
    // shared legend, one swatch per group in stacking order
    groups.zipWithIndex.foreach { case (g, i) =>
      val y = pad + i * 16
      sb ++= s"""  <rect x="${w - 16}" y="$y" width="10" height="10" fill="${colorOf(g)}"/><text x="${w - 20}" y="${y + 9}" text-anchor="end" font-size="10">${escape(g)}</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Horizontal bar chart of per-class counts (plots-poster.R:59-77):
    * bars sorted so the LARGEST count sits on top
    * (`reorder(class, count)` + `coord_flip`), black outlines, value
    * axis extended 5% past the max
    * (`expansion(mult = c(0, 0.05))`), no legend. Ties sort by label
    * so the render is deterministic.
    *
    * @param counts plot-grain frame: one row per (label, count)
    */
  def barChartSvg(counts: DataFrame, labelCol: String, valueCol: String,
      w: Int = 640, h: Int = 400): String = {
    val rows = counts.select(col(labelCol).cast("string"),
        col(valueCol).cast("long"))
      .filter(col(labelCol).isNotNull && col(valueCol).isNotNull) // na.rm, matching the other renders
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, v) => (-v, l) } // top row = largest
    if (rows.isEmpty)
      return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h"></svg>\n"""
    val labelW = 180
    // all-zero counts would give 0/0-width bars; 1 keeps the axis finite
    val axisMax = math.max(rows.map(_._2).max, 1L) * 1.05
    val barH = (h - 20).toDouble / rows.length
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
    rows.zipWithIndex.foreach { case ((label, v), i) =>
      val y = 10 + i * barH
      val bw = v / axisMax * (w - labelW - 20)
      val fill = Set2(i % Set2.length)
      sb ++= s"""  <text x="${labelW - 6}" y="${fmt(y + barH * 0.65)}" text-anchor="end" font-size="11" font-weight="bold">${escape(label)}</text>\n"""
      sb ++= s"""  <rect x="$labelW" y="${fmt(y + barH * 0.1)}" width="${fmt(bw)}" height="${fmt(barH * 0.8)}" fill="$fill" stroke="black"><title>$v</title></rect>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Scatter facets (compare_microscopy.R:139-162): one panel per facet
    * value (taxon), `scales = "free"` (each panel normalizes both axes
    * to its own data range), dark-blue points at alpha 0.7, `ncol`
    * panels per row, facet labels bold. A reference y = x diagonal is
    * drawn per panel (the comparison the reference's commented-out
    * `geom_smooth` line stood for) when the panel's ranges overlap.
    *
    * @param pairs plot-grain frame: one row per (facet, x, y); null
    *              coordinates are dropped like ggplot's na.rm
    */
  def scatterFacetSvg(pairs: DataFrame, facetCol: String, xCol: String,
      yCol: String, ncol: Int = 4, panelW: Int = 240, panelH: Int = 200)
      : String = {
    val rows = pairs.select(col(facetCol).cast("string"),
        col(xCol).cast("double"), col(yCol).cast("double"))
      .filter(col(facetCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(r => (r._1, r._2, r._3))
    val facets = rows.map(_._1).distinct.sorted
    val pad = 26
    val nRows = (facets.length + ncol - 1) / ncol
    val w = ncol * (panelW + pad) + pad
    val h = math.max(1, nRows) * (panelH + pad + 16) + pad
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
    facets.zipWithIndex.foreach { case (f, fi) =>
      val x0 = pad + (fi % ncol) * (panelW + pad)
      val y0 = pad + (fi / ncol) * (panelH + pad + 16)
      val fr = rows.filter(_._1 == f)
      // free scales: pad degenerate extents so a single point stays finite
      def range(vs: Array[Double]): (Double, Double) = {
        val (lo, hi) = (vs.min, vs.max)
        if (hi > lo) (lo, hi) else (lo - 0.5, hi + 0.5)
      }
      val (xLo, xHi) = range(fr.map(_._2))
      val (yLo, yHi) = range(fr.map(_._3))
      def px(v: Double): Double = x0 + (v - xLo) / (xHi - xLo) * panelW
      def py(v: Double): Double = y0 + panelH - (v - yLo) / (yHi - yLo) * panelH
      sb ++= s"""  <text x="${fmt(x0 + panelW / 2.0)}" y="${fmt(y0 - 6.0)}" text-anchor="middle" font-weight="bold" font-size="11">${escape(f)}</text>\n"""
      sb ++= s"""  <rect x="$x0" y="$y0" width="$panelW" height="$panelH" fill="white" stroke="#cccccc"/>\n"""
      val dLo = math.max(xLo, yLo)
      val dHi = math.min(xHi, yHi)
      if (dHi > dLo)
        sb ++= s"""  <line x1="${fmt(px(dLo))}" y1="${fmt(py(dLo))}" x2="${fmt(px(dHi))}" y2="${fmt(py(dHi))}" stroke="#999999" stroke-dasharray="4 3"/>\n"""
      fr.foreach { case (_, x, y) =>
        sb ++= s"""  <circle cx="${fmt(px(x))}" cy="${fmt(py(y))}" r="3" fill="#00008b" fill-opacity="0.7"/>\n"""
      }
    }
    sb ++= "</svg>\n"
    sb.toString
  }
}
