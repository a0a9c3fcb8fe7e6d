package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Fanout
import graft.sources.Tables

/** Micro-A/B of the exact-decimal covariance cell aggregation
  * (Ann.covarianceCells): where does the CPU go — the per-element
  * struct allocation in the triangular explode, or the decimal(38)
  * sum? All variants must produce the IDENTICAL (i, j, sxy) table
  * (asserted) — only the representation inside the aggregation moves.
  * Usage: CovProbe [sfDir] [reps] */
object CovProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Sessions.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32), "covprobe")
    @volatile var taskTimeMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
    })
    val vecs = Tables.load(spark, sfDir, "embeddings")
    def q: DataFrame = Fanout(vecs.select(col("vec_id").as("vid"),
        col("embedding").as("v")).filter(col("v").isNotNull), "vid")
      .select(expr("transform(v, x -> CAST(x * 1000000.0D AS BIGINT))").as("q"))

    // current form: triangular struct explode + decimal(38) sum
    def cellsStruct: DataFrame = q.select(explode(expr(
        """flatten(transform(sequence(0, size(q) - 1), i ->
          |  transform(sequence(i, size(q) - 1), j ->
          |    struct(i AS i, j AS j, q[i] * q[j] AS p))))""".stripMargin))
        .as("z"))
      .select(col("z.i").as("i"), col("z.j").as("j"), col("z.p").as("p"))
      .groupBy("i", "j")
      .agg(sum(col("p").cast("decimal(38,0)")).as("sxy"))

    // flat long array + posexplode + broadcast (pos -> i, j) map
    def cellsFlat: DataFrame = {
      val d = 64
      val posMap = spark.range(0, d.toLong * (d + 1) / 2).toDF("pos")
        .select(col("pos"),
          expr(s"CAST(FLOOR((${2 * d + 1} - sqrt(CAST(${(2 * d + 1) * (2 * d + 1)} - 8 * pos AS DOUBLE))) / 2) AS INT)").as("i0"))
        .select(col("pos"),
          col("i0").cast("int").as("i"),
          (col("pos") - (col("i0") * (lit(2 * d + 1) - col("i0")) / 2)
            + col("i0")).cast("int").as("j"))
      q.select(posexplode(expr(
          """flatten(transform(sequence(0, size(q) - 1), i ->
            |  transform(sequence(i, size(q) - 1), j -> q[i] * q[j])))""".stripMargin))
          .as(Seq("pos", "p")))
        .join(broadcast(posMap), Seq("pos"))
        .groupBy("i", "j")
        .agg(sum(col("p").cast("decimal(38,0)")).as("sxy"))
    }

    // struct explode + long sum (NOT scale-safe past ~9e6 rows/value —
    // measurement-only variant to isolate the decimal cost)
    def cellsLong: DataFrame = q.select(explode(expr(
        """flatten(transform(sequence(0, size(q) - 1), i ->
          |  transform(sequence(i, size(q) - 1), j ->
          |    struct(i AS i, j AS j, q[i] * q[j] AS p))))""".stripMargin))
        .as("z"))
      .select(col("z.i").as("i"), col("z.j").as("j"), col("z.p").as("p"))
      .groupBy("i", "j")
      .agg(sum(col("p")).cast("decimal(38,0)").as("sxy"))

    // hi/lo split: two LONG sums, recombined exactly (floor-div split
    // keeps lo in [0, 2^32), so both partial sums stay in range for
    // any per-group count < 2^31)
    def cellsSplit: DataFrame = q.select(explode(expr(
        """flatten(transform(sequence(0, size(q) - 1), i ->
          |  transform(sequence(i, size(q) - 1), j ->
          |    struct(i AS i, j AS j, q[i] * q[j] AS p))))""".stripMargin))
        .as("z"))
      .select(col("z.i").as("i"), col("z.j").as("j"),
        expr("CAST(FLOOR(z.p / 4294967296.0D) AS BIGINT)").as("hi"),
        expr("z.p - 4294967296L * CAST(FLOOR(z.p / 4294967296.0D) AS BIGINT)").as("lo"))
      .groupBy("i", "j")
      .agg((sum(col("hi")).cast("decimal(38,0)") * lit(4294967296L) +
        sum(col("lo")).cast("decimal(38,0)")).cast("decimal(38,0)").as("sxy"))

    def run(label: String)(f: => DataFrame): Seq[org.apache.spark.sql.Row] = {
      var out: Array[org.apache.spark.sql.Row] = null
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        taskTimeMs = 0L
        val t0 = System.nanoTime()
        out = f.orderBy("i", "j").collect()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"$label%-14s rep$i wall=${wall}%6.2f s taskTime=${taskTimeMs / 1000.0}%7.2f s rows=${out.length}")
      }
      out.toSeq
    }
    val a = run("struct_decimal")(cellsStruct)
    val b = run("flat_posmap")(cellsFlat)
    val c = run("struct_long")(cellsLong)
    val e = run("hi_lo_split")(cellsSplit)
    require(a == b, "flat_posmap mismatch")
    require(a == c, "struct_long mismatch")
    require(a == e, "hi_lo_split mismatch")
    println("all variants identical")
    spark.stop()
  }
}
