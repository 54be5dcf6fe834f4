package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K4 archive sink (SURVEY.md §2.1): binary payloads + a manifest packed
  * into size-capped zip parts (reference: PNG export zips with
  * `max_size = 500` MB + MANIFEST, ifcb-image-export-pipeline.Rmd:839-915,
  * 1010).
  *
  * Spark shape: part numbers are planned on a *metadata-only* frame
  * (name, size) — the single-partition cumulative-sum window never moves
  * payload bytes; payloads join the plan by name and each part writes one
  * zip from `foreachPartition`, executors in parallel, nothing collected
  * to the driver. (The reference loops sequentially on one node.)
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
    new java.io.File(dir).mkdirs()
    // plan parts over metadata only; the payload column stays put
    val meta = df.select(col(nameCol), length(col(bytesCol)).cast("long").as("__len"))
    val w = Window.orderBy(col(nameCol))
    val partPlan = meta
      .withColumn("__cum", sum(col("__len")).over(w))
      .withColumn("__part", (col("__cum") / maxPartBytes).cast("int"))
      .select(col(nameCol), col("__part"))
    val assigned = df.join(broadcast(partPlan), nameCol)
      .select(col(nameCol), col(bytesCol), col("__part"))
      .repartition(col("__part"))
    assigned.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      // hash partitioning can co-locate several part ids → one zip each
      it.toSeq.groupBy(_.getAs[Int]("__part")).foreach { case (part, rows) =>
        val zos = new ZipOutputStream(
          new FileOutputStream(s"$dir/part-$part.zip"))
        try {
          val manifest = new StringBuilder
          rows.sortBy(_.getAs[String](nameCol)).foreach { r =>
            val name = r.getAs[String](nameCol)
            val bytes = r.getAs[Array[Byte]](bytesCol)
            zos.putNextEntry(new ZipEntry(name))
            zos.write(bytes)
            zos.closeEntry()
            manifest.append(s"$name\t${bytes.length}\n")
          }
          zos.putNextEntry(new ZipEntry("MANIFEST.txt"))
          zos.write(manifest.toString.getBytes("UTF-8"))
          zos.closeEntry()
        } finally zos.close()
      }
    }
    partPlan.join(meta, nameCol)
      .select(col("__part").as("part"), col(nameCol).as("entry"),
        col("__len").as("n_bytes"))
  }
}
