package graft.sources

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K4 archive sink (SURVEY.md §2.1): binary payloads + a manifest packed
  * into size-capped zip parts (reference: PNG export zips with
  * `max_size = 500` MB + MANIFEST, ifcb-image-export-pipeline.Rmd:839-915,
  * 1010).
  *
  * Spark shape: part numbers are planned from a *metadata-only* pass
  * (name, size) — entry-grain rows, collected once (an archive's entry
  * list is driver-small, like the map renders' summary frames) so
  * neither the assignment join nor the returned manifest ever re-scans
  * payload bytes. Payloads join the tiny broadcast plan by name and
  * each part writes one zip from `foreachPartition`, executors in
  * parallel, nothing collected to the driver. (The reference loops
  * sequentially on one node.)
  *
  * Writer discipline: rows arrive sorted by (part, name), so the writer
  * STREAMS — at most one payload is in memory at a time, even when hash
  * partitioning co-locates several ~maxPartBytes parts in one task —
  * and each finished zip is renamed atomically from a temp file onto
  * its final name, so a speculative or replayed task attempt can never
  * leave a half-written archive at the published path (racing attempts
  * each complete their own temp file; the last rename wins whole).
  */
object ZipSink {

  /** @param df        rows with `nameCol` (entry name, unique) + `bytesCol`
    * @param maxPartBytes soft cap per zip part (uncompressed payload)
    * @param dir       local/DFS-mounted output directory
    * @return manifest DataFrame (part, entry, n_bytes)
    */
  def write(
      df: DataFrame, nameCol: String, bytesCol: String,
      dir: String, maxPartBytes: Long): DataFrame = {
    require(maxPartBytes > 0,
      s"ZipSink: maxPartBytes must be positive, got $maxPartBytes")
    new File(dir).mkdirs()
    val spark = df.sparkSession
    import spark.implicits._
    // one metadata pass: cumulative size in name order decides the part
    // split (the reference's running max_size roll, Rmd:859-866)
    val entries = df
      .select(col(nameCol).cast("string"), length(col(bytesCol)).cast("long"))
      .as[(String, Long)].collect().sortBy(_._1)
    // entry names must be unique: the payload→plan equi-join by name
    // would otherwise fan out (each payload row matching every same-name
    // plan row), duplicating entries across parts and inflating the
    // manifest. Fail loudly rather than write a corrupt archive.
    require(entries.iterator.map(_._1).toSet.size == entries.length, {
      val dup = entries.groupBy(_._1).collect { case (n, g) if g.length > 1 => n }
      s"ZipSink: duplicate entry names in '$nameCol': ${dup.take(5).mkString(", ")}"
    })
    // the manifest entry name is reserved: a payload row named like it
    // would collide only at part-CLOSE time (ZipException after the
    // whole part is written, orphaned .tmp left behind) — fail fast
    // with the sink's own diagnostic instead (round-12 review)
    require(!entries.exists(_._1 == "MANIFEST.txt"),
      s"ZipSink: entry name 'MANIFEST.txt' is reserved for the part manifest")
    var cum = 0L
    val plan = entries.map { case (name, len) =>
      cum += len
      (name, (cum / maxPartBytes).toInt, len)
    }
    val partPlan = plan.map { case (n, p, _) => (n, p) }.toSeq
      .toDF(nameCol, "__part")
    val assigned = df.join(broadcast(partPlan), nameCol)
      .select(col(nameCol), col(bytesCol), col("__part"))
      .repartition(col("__part"))
      .sortWithinPartitions(col("__part"), col(nameCol))
    assigned.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      var zos: ZipOutputStream = null
      var tmp: File = null
      var cur = Int.MinValue
      val manifest = new StringBuilder
      def closeCurrent(): Unit = if (zos != null) {
        zos.putNextEntry(new ZipEntry("MANIFEST.txt"))
        zos.write(manifest.toString.getBytes("UTF-8"))
        zos.closeEntry()
        zos.close()
        // REPLACE_EXISTING alongside ATOMIC_MOVE: without it, replacing
        // an existing part (re-run over the same dir, or a replayed
        // attempt racing a completed one) is filesystem-specific — only
        // POSIX rename semantics made the documented last-rename-wins
        // behavior true (round-12 review; MatSink's discipline)
        java.nio.file.Files.move(tmp.toPath,
          new File(s"$dir/part-$cur.zip").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        zos = null
        tmp = null
        manifest.setLength(0)
      }
      // try/finally (round-12 review): a mid-write failure (null bytes
      // column, disk full) otherwise leaks the open stream AND leaves
      // the .zip.tmp orphaned in the user-visible archive dir — one per
      // retried attempt
      try {
        it.foreach { r =>
          val part = r.getAs[Int]("__part")
          if (part != cur) {
            closeCurrent()
            cur = part
            tmp = File.createTempFile(s"part-$part-", ".zip.tmp", new File(dir))
            zos = new ZipOutputStream(new FileOutputStream(tmp))
          }
          val name = r.getAs[String](nameCol)
          val bytes = r.getAs[Array[Byte]](bytesCol)
          require(bytes != null, s"ZipSink: null bytes for entry '$name'")
          zos.putNextEntry(new ZipEntry(name))
          zos.write(bytes)
          zos.closeEntry()
          manifest.append(s"$name\t${bytes.length}\n")
        }
        closeCurrent()
      } finally if (zos != null) {
        scala.util.Try(zos.close())
        if (tmp != null) scala.util.Try(tmp.delete())
      }
    }
    plan.map { case (n, p, len) => (p, n, len) }.toSeq
      .toDF("part", "entry", "n_bytes")
  }
}
