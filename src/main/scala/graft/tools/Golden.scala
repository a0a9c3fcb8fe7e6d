package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkEntry

/** Golden-hash regression harness (SURVEY §5.2.2): canonical md5 per
  * query at sf0.001, committed to test resources, so `sbt test`
  * detects any value regression offline — the oracle gate at sf0.01
  * proves correctness; goldens protect refactors between oracle runs.
  */
object Golden {

  /** Canonical digest: columns sorted by name, rows in query order,
    * cells rendered deterministically. */
  def digest(df: DataFrame): String = {
    val cols = df.columns.sorted.toIndexedSeq
    val projected = df.select(cols.head, cols.tail: _*)
    val md = MessageDigest.getInstance("MD5")
    projected.collect().foreach { row =>
      val line = (0 until row.length).map { i =>
        row.get(i) match {
          case null                     => "NULL"
          case t: java.sql.Timestamp    => t.toInstant.toString
          case d: java.math.BigDecimal  => d.toPlainString
          case v                        => v.toString
        }
      }.mkString("|")
      md.update((line + "\n").getBytes(StandardCharsets.UTF_8))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  val goldenPath = "src/test/resources/goldens-sf0.001.txt"
  val curateGoldenPath = "src/test/resources/golden-curate-sf0.001.txt"
  val mediaGoldenPath = "src/test/resources/golden-curate-media-sf0.001.txt"

  /** Canonical digest of the MEDIA curation pipeline at default
    * settings over the deterministic fixture corpus (one image + one
    * audio + one video row per doc id — the p63/p64/p65 fixtures, so
    * planted dups exist in every modality): survivors digest (payload
    * by md5, metadata verbatim) + data-card digest, space-joined. The
    * run persists all three fingerprint indexes to a scratch root so
    * the card's index_* side-effect rows (rows landed per modality)
    * are under golden too — the end-to-end composition golden for
    * `pipelines.CurateMedia`, like [[curateDigest]] for the text
    * pipeline. */
  def curateMediaDigest(spark: SparkSession, sf: String): String = {
    import org.apache.spark.sql.functions.{col, md5}
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val media = graft.operators.Multimodal.pHashImageFixtures(docs)
      .unionByName(graft.operators.Multimodal
        .spectralAudioFixtures(docs)
        .map(r => r.copy(doc_id = r.doc_id + 1000000L)))
      .unionByName(graft.operators.Multimodal.videoFixtures(docs)
        .map(r => r.copy(doc_id = r.doc_id + 2000000L)))
    val idxRoot = Files.createTempDirectory("golden-media-idx")
    try {
      val (out, st) = graft.pipelines.CurateMedia.run(media,
        indexRoot = Some(idxRoot.toString), stats = true)
      val survivors = digest(out.select(col("doc_id"),
          md5(col("payload")).as("p"), col("kind"), col("width"),
          col("height"), col("duration_ms"))
        .orderBy("doc_id"))
      val card = digest(graft.pipelines.CurateMedia.dataCard(spark, st.get))
      s"$survivors $card"
    } finally deleteRecursively(idxRoot)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally walk.close()
    }
  }

  /** Canonical digest of the flagship 17-stage curation pipeline's
    * PACKED output at default settings — the end-to-end golden the
    * per-stage oracles can't give (a stage-ordering or seed regression
    * changes the composition while every stage stays individually
    * green). Rows sorted by every column for a deterministic digest;
    * stats off (CurateSpec law: identical packed output). */
  def curateDigest(spark: SparkSession, sf: String): String = {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source")
    val (packed, _) = graft.pipelines.Curate.run(docs, stats = false)
    import org.apache.spark.sql.functions.col
    digest(packed.orderBy(packed.columns.sorted.map(col).toIndexedSeq: _*))
  }

  /** Regenerate the golden files: `runMain graft.tools.Golden`. */
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8, "golden-gen")
    val sf = "/root/testdata/sf0.001"
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      s"$name ${digest(fn(spark, sf))}"
    }
    Files.createDirectories(Paths.get("src/test/resources"))
    Files.writeString(Paths.get(goldenPath), lines.mkString("\n") + "\n")
    println(s"wrote ${lines.size} goldens to $goldenPath")
    Files.writeString(Paths.get(curateGoldenPath),
      curateDigest(spark, sf) + "\n")
    println(s"wrote curate golden to $curateGoldenPath")
    Files.writeString(Paths.get(mediaGoldenPath),
      curateMediaDigest(spark, sf) + "\n")
    println(s"wrote curate-media golden to $mediaGoldenPath")
    spark.stop()
  }
}
