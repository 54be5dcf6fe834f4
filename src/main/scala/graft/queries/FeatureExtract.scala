package graft.queries

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.features.{Features, Segmentation}

/** End-to-end exercise of the feature-extraction kernel
  * (reference: ifcb-features `extract_slim_features.py` — segmentation →
  * blob geometry → Moberg-Sosik biovolume), SURVEY.md §2.10 "heavy
  * compute kernel". No parquet image fixtures exist in the test data, so
  * the ROI rasters are rendered deterministically on the executors from
  * `part` rows (shape parameters from the part key), then pushed through
  * the real kernel via [[Features.extract]]'s mapPartitions path — the
  * exact plan shape a 100 TB image backfill uses: narrow scan → per-row
  * CPU kernel → small aggregate, no shuffle until the final rollup.
  *
  * Rows-only check (the kernel is not SQL-expressible); numeric parity is
  * covered by FeatureKernelSpec's reference-generated goldens.
  */
object FeatureExtract {

  /** Deterministic synthetic ROI: bright background, one dark ellipse
    * (optionally two) parameterized by the seed — same construction as
    * the golden generator's fixtures (tools/golden_features.py roi_for).
    */
  private[graft] def renderRoi(seed: Long): (Array[Byte], Int, Int) = {
    val h = 30 + (seed % 11).toInt
    val w = 36 + (seed % 13).toInt
    val cy = h / 2.0; val cx = w / 2.0
    val ry = 4.0 + (seed % 7); val rx = 5.0 + (seed % 9)
    var state = seed * 2654435761L + 7
    def nxt(): Int = {
      state = (state * 1103515245L + 12345L) % (1L << 31)
      (state & 0x7fffffffL).toInt
    }
    val px = new Array[Byte](h * w)
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val in = {
          val dy = (i - cy) / ry; val dx = (j - cx) / rx
          dy * dy + dx * dx <= 1.0
        }
        val base = if (in) 80 else 200
        px(i * w + j) = (base + nxt() % 21).toByte
        j += 1
      }
      i += 1
    }
    (px, h, w)
  }

  /** q55: synthetic ROI render → segmentation → slim features →
    * per-bucket biovolume rollup. Scales with the `part` table (1 image
    * per 50 part keys).
    *
    * Oracle-checked on its SQL-expressible half: `n_rois` is a pure
    * function of the part keys, and each synthetic ROI draws exactly one
    * dark ellipse that segments to exactly one blob (golden-verified in
    * FeatureKernelSpec), so `n_blobs = n_rois` — DuckDB recomputes both
    * exactly. The kernel numerics (biovolume/area/eccentricity) are not
    * SQL-expressible; the oracle pins their deterministic acceptance
    * booleans (positive volumes and areas, eccentricity in [0,1)) to
    * TRUE, and numeric parity stays spec-verified against
    * reference-generated goldens.
    */
  private val q55 = GraftQuery(
    "q55_feature_extract",
    (s, d) => {
      import s.implicits._
      // repartition the (few, CPU-heavy) rows across all cores: the
      // parquet scan yields a handful of partitions, which would leave
      // most executors idle through the kernel stage
      val seeds = Tables.part(s, d)
        .filter($"p_partkey" % 50 === 0)
        .select($"p_partkey".cast("long").as("roi_id"))
        .as[Long]
        .repartition(s.sparkContext.defaultParallelism)
      val images = seeds.map { id =>
        val (px, h, w) = renderRoi(id)
        (id, px, h, w)
      }
      Features.extract(images)
        .withColumn("bucket", (col("roi_id") / 5000).cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_rois"),
          sum(col("numBlobs")).cast("long").as("n_blobs"),
          (sum(col("Biovolume")) > 0.0).as("biovol_ok"),
          (sum(col("Area")) > 0.0).as("area_ok"),
          (avg(col("Eccentricity")) >= 0.0 && avg(col("Eccentricity")) < 1.0).as("ecc_ok"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT CAST(FLOOR(p_partkey / 5000.0) AS BIGINT) AS bucket,
             COUNT(*) AS n_rois, COUNT(*) AS n_blobs,
             TRUE AS biovol_ok, TRUE AS area_ok, TRUE AS ecc_ok
      FROM part
      WHERE p_partkey % 50 = 0
      GROUP BY 1
      ORDER BY 1"""))

  val all: Seq[GraftQuery] = Seq(q55)
}
