package graft.features

import graft.SparkSpec
import org.apache.spark.sql.functions.{concat, lit}

/** Distributed extraction paths: slim and full (extended) feature frames
  * over synthetic ROI renders.
  */
class FeaturesExtractSpec extends SparkSpec {
  import spark.implicits._

  private def images = spark.createDataset(Seq(50L, 150L, 250L).map { id =>
    val (px, h, w) = graft.queries.FeatureExtract.renderRoi(id)
    (id, px, h, w)
  })

  test("extract produces one slim row per image with found blobs") {
    val df = Features.extract(images)
    assert(df.count() == 3)
    assert(df.columns.contains("Biovolume"))
    assert(df.filter($"numBlobs" > 0).count() == 3)
  }

  test("extractFull adds the extended tail in stable order") {
    val df = Features.extractFull(images)
    assert(df.count() == 3)
    // slim + 108 extended columns
    assert(ExtendedFeatures.keys.forall(df.columns.contains))
    val r = df.collect().head
    assert(!r.isNullAt(r.fieldIndex("hog01")))
    assert(r.getAs[Double]("rotated_area") > 0)
    // extended frame feeds EcoTaxa directly
    val eco = graft.jobs.EcoTaxaExport.project(
      df.withColumn("image", concat($"roi_id".cast("string"), lit(".png")))
        .withColumn("subfolder", lit("test_class")))
    assert(eco.count() == 3)
    assert(eco.select("object_hog01").as[Double].collect().forall(_ > 0))
  }
}
