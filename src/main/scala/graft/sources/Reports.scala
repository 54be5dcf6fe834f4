package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame

/** K5/K6 report and templated-text sinks (SURVEY.md §2.1).
  *
  * K5: the per-year QC flag summary the reference renders with
  * `knitr::kable` (ifcb-data-pipeline.Rmd:686-699) — here an HTML table
  * from an aggregated frame. The AGGREGATION runs distributed; only the
  * few summary rows are collected for rendering, so this stays safe at
  * any input scale.
  *
  * K6: the delivery-note text template (Rmd:1503-1519) — ordered
  * key/value lines rendered from caller-supplied values (dates and
  * contacts are parameters, never Sys calls, so runs are reproducible).
  */
/** Mail-transport seam for the notification sinks (reference:
  * code/ifcb_hab_alert.R:292-299 — `send_mail(mail_from, mail_rcpt,
  * message, smtp_server, use_ssl)`). The pipeline renders subject + HTML
  * ([[graft.jobs.HabAlert]]); *delivery* is an injected effect so a
  * deployment plugs an SMTP transport and specs plug [[RecordingMailer]].
  * Actually speaking SMTP stays outside the library (zero-egress build,
  * and the reference treats the server as deploy-time config too).
  */
trait Mailer extends Serializable {
  def send(from: String, to: Seq[String], subject: String, html: String): Unit
}

/** Test/dry-run transport: records every send in order. */
final class RecordingMailer extends Mailer {
  import scala.collection.mutable
  val sent: mutable.ArrayBuffer[(String, Seq[String], String, String)] =
    mutable.ArrayBuffer.empty
  override def send(from: String, to: Seq[String], subject: String,
      html: String): Unit =
    synchronized { sent += ((from, to, subject, html)) }
}

object Reports {

  /** K5: renders an already-aggregated summary frame as a minimal HTML
    * table (header from column names). Collects only the summary rows.
    */
  def htmlSummary(summary: DataFrame, caption: String, maxRows: Int = 1000): String =
    htmlTable(summary.columns, summary.limit(maxRows).collect(), caption)

  /** Rows-based variant for callers that already collected the (small)
    * summary — e.g. a foreachBatch sink rendering several per-day tables
    * from one collect, instead of re-evaluating the batch per day.
    */
  def htmlTable(cols: Seq[String], rows: Seq[org.apache.spark.sql.Row],
      caption: String): String = {
    val sb = new StringBuilder
    sb ++= "<table>\n"
    sb ++= s"  <caption>${escape(caption)}</caption>\n"
    sb ++= cols.map(c => s"<th>${escape(c)}</th>").mkString("  <tr>", "", "</tr>\n")
    for (r <- rows) {
      sb ++= cols.indices.map { i =>
        val v = r.get(i)
        s"<td>${escape(if (v == null) "" else v.toString)}</td>"
      }.mkString("  <tr>", "", "</tr>\n")
    }
    sb ++= "</table>\n"
    sb.toString
  }

  /** K5: flag summary report — the PSD Q-flag counts by descending
    * frequency (Rmd:688-693), aggregated in Spark, rendered to HTML.
    */
  def flagSummaryHtml(flags: DataFrame, flagCol: String, caption: String): String = {
    import org.apache.spark.sql.functions._
    val summary = flags
      .groupBy(col(flagCol).as("Q-flag"))
      .agg(count(lit(1)).as("Number of samples"))
      .orderBy(col("Number of samples").desc, col("Q-flag").asc)
    htmlSummary(summary, caption)
  }

  /** K6: delivery-note template — ordered (key, value) lines in the
    * reference's `key: value` format (Rmd:1503-1519); keys with empty
    * values still emit the bare `key:` line (the reference's
    * "kommentarer:" row).
    */
  def deliveryNote(entries: Seq[(String, String)]): String =
    entries.map {
      case (k, "") => s"$k:"
      case (k, v)  => s"$k: $v"
    }.mkString("", "\n", "\n")

  /** Writes text to a file, creating parent directories. */
  def writeText(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, content,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def escape(s: String): String = Svg.escape(s)
}
