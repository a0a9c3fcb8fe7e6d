package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over corpus grams — the mergeable bounded-memory
  * frequency summary (Cormode & Muthukrishnan). The production use at
  * 100 TB is the SUMMARY ARTIFACT: build one depth×width sketch per
  * ingest batch (a few hundred KB regardless of corpus size), merge
  * sketches by elementwise sum (exact — no accuracy is lost in the
  * merge), and answer "how often does this n-gram occur?" for ANY gram
  * without rescanning a byte of text. Estimates never undercount;
  * overcounts are bounded by collisions (~N/width per row, min over
  * depth rows).
  *
  * Spark-first shape: the sketch is built DECLARATIVELY — each gram
  * explodes into its depth cells, one partial-aggregable cell count,
  * and a single bounded (depth·width)-row fold into the array — no
  * custom buffer class, so map-side combine crushes hot grams before
  * the shuffle and the only wide state is the cell table itself.
  * Hashing is md5-derived (two 60-bit halves feeding a universal
  * family), so sketches are reproducible across engines, runs, and
  * partitionings.
  */
object Sketch {

  private def hashA(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")
  private def hashB(g: Column): Column =
    conv(substring(md5(g), 16, 15), 16, 10).cast("long")

  /** Cell index of gram `g` in row j: j·width + (a + j·b) mod width.
    * a, b < 2^60 and j ≤ 7, so a + j·b stays well inside Long. */
  private def cell(g: Column, j: Int, width: Int): Column =
    lit(j.toLong * width) + pmod(hashA(g) + lit(j.toLong) * hashB(g), lit(width.toLong))

  /** Build one sketch row over a gram frame (one row per gram
    * INSTANCE — pre-aggregate to (gram, weight) yourself and explode
    * if instances are expensive). Output: sketch array<long> of
    * length depth·width, depth, width. */
  def cmsBuild(grams: DataFrame, gramCol: String = "gram", depth: Int = 4,
      width: Int = 8192): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth must be in [1, 8]")
    require(width >= 16, "width must be at least 16")
    val g = grams.select(col(gramCol).cast("string").as("g"))
    // Densify by unioning an all-cells zero frame and folding the
    // SORTED (cell, cnt) pairs — O(dw·log dw) on one bounded row. (The
    // obvious map_from_arrays + element_at-per-position form is
    // quadratic: element_at on a map is a linear scan, and 32k probes
    // of a 32k map measured ~80 s at sf0.1.)
    g.select(explode(array((0 until depth).map(j => cell(col("g"), j, width)): _*))
        .as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .unionByName(grams.sparkSession.range(depth.toLong * width)
        .select(col("id").as("cell"), lit(0L).as("cnt")))
      .groupBy("cell").agg(sum("cnt").as("cnt"))
      .agg(transform(sort_array(collect_list(struct(col("cell"), col("cnt")))),
        s => s.getField("cnt")).as("sketch"))
      .select(col("sketch"), lit(depth).as("depth"), lit(width).as("width"))
  }

  /** Merge sketch rows of IDENTICAL (depth, width) by elementwise sum —
    * exact: cms(A ∪ B) == merge(cms(A), cms(B)) cell for cell, which
    * is what makes per-batch sketches composable into a corpus-lifetime
    * summary. Bounded work: (rows × depth × width) cells. */
  def cmsMerge(sketches: DataFrame): DataFrame =
    sketches
      .select(col("depth"), col("width"),
        posexplode(col("sketch")).as(Seq("pos", "v")))
      .groupBy("depth", "width", "pos").agg(sum("v").as("v"))
      .groupBy("depth", "width")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("sketch"))
      .select(col("sketch"), col("depth"), col("width"))

  /** Point estimate for a gram column against a COLLECTED sketch (the
    * artifact is depth·width longs — driver-sized by construction;
    * embedding it as a literal is the broadcast). min over the depth
    * rows; never under the true count. */
  def cmsEstimate(sketch: Seq[Long], depth: Int, width: Int)(gram: Column): Column = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val arr = typedLit(sketch)
    least((0 until depth).map(j =>
      element_at(arr, (cell(gram, j, width) + 1).cast("int"))): _*)
  }

  /** Word n-grams WITH multiplicity (the counting form — the dedup
    * shingle path is distinct-set semantics, this one is frequency
    * semantics). Output: doc_id, gram. */
  def wordNgrams(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, "n must be positive")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, greatest(size(t) - ${n - 1}, 0)), " +
          s"i -> array_join(slice(t, i, $n), ' '))")).as("gram"))
  }

  /** Convenience: the corpus n-gram sketch in one call. */
  def ngramCms(docs: DataFrame, n: Int = 3, depth: Int = 4, width: Int = 8192,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    cmsBuild(wordNgrams(docs, n, idCol, textCol), depth = depth, width = width)
}
