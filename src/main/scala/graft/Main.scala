package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{abs, col}
import graft.gen.DataGen
import graft.operators.Quality
import graft.sources.{Lake, Tables}
import graft.streaming.Ingest

/** CLI entry point (SURVEY §7.1 app module) — the pipeline stages a
  * reference user runs via Airflow DAGs, as engine subcommands:
  *
  *   inventory <sfDir> <outDir>      run every declared query -> parquet
  *   gen <outDir> <nCustomers>       deterministic OLTP corpus (X6)
  *   quality <dataDir> <nowTs>       silver-layer quality report
  *   ingest <srcDir> <outDir> <ck>   checkpointed incremental bronze ingest
  *   bronze <sfDir> <root> <batchTs> write fixture tables as a bronze batch
  */
object Main {

  private def usage(): Nothing = {
    System.err.println(
      """usage: graft.Main <command> [args]
        |  inventory <sfDir> <outDir>
        |  gen <outDir> <nCustomers>
        |  quality <dataDir> <nowTs e.g. 2024-01-31 00:00:00>
        |  ingest <srcDir> <outDir> <checkpointDir>
        |  bronze <sfDir> <lakeRoot> <batchTs>
        |  northwind <outDir>
        |  dedup <sfDir> <outDir>
        |  dedup-against <newDir> <refDir> <outDir>
        |  decontaminate-spans <trainDir> <heldoutDir> <outDir> [nGram]
        |  strip-boilerplate <sfDir> <outDir> [maxDocs]
        |  cdc-dedup <sfDir> <outDir>
        |  curate <sfDir> <outDir>
        |  curate-stream <srcDir> <outDir> <indexDir> <stateDir> <ck> <budgetTokens>
        |  bpe-train <sfDir> <nMerges>
        |  quality-train <sfDir>
        |  domain-train <sfDir>
        |  quality-fixture [outDir]
        |  ivf-build <sfDir> <indexDir> <nCentroids>
        |  pq-search <sfDir> <nQueries> <k>
        |  hash-split <sfDir> <outDir> [train,val,test fracs e.g. 0.8,0.1,0.1]
        |  corpus-diff <oldDir> <newDir> <outDir>
        |  report <sfDir> <outDir>
        |  dsir-select <sfDir> <outDir> <n> [targetLang]
        |  bm25-index <sfDir> <indexDir>
        |  bm25-search <sfDir> <indexDir> <nQueries> <k>
        |  hybrid-search <sfDir> <nQueries> <k>
        |  embed-stats <sfDir> <outDir>
        |  embed-drift <sfDir> <outDir> [groupCol]
        |  embed-drift-against <refDir> <curDir> <outDir>
        |  snapshot-cells <sfDir> <outDir>
        |  drift-gate <sfDir> <snapshotDir> <outDir> [maxAbsZ] [ratioLo] [ratioHi]
        |  gold-mart <sfDir> <outRoot>
        |  pca-project <sfDir> <outDir> <k>
        |  pca-project-by <sfDir> <outDir> <k> [groupCol]
        |  pca-outliers <sfDir> <outDir> <k> <residThresh> <mahaThresh>
        |  pca-outliers-by <sfDir> <outDir> <k> <residThresh> <mahaThresh> [groupCol]
        |  sem-decon <sfDir> <outDir> <threshold> [nprobe]
        |  corpus-health <sfDir> <outDir>
        |  pii-scan <sfDir> <outDir>
        |  sql <sfDir> <statement>""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) usage()
    val spark: SparkSession = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, s"graft-${args(0)}")
    try args.toList match {
      case "inventory" :: sfDir :: outDir :: Nil =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          println(s"wrote $outDir/$name")
        }
      case "gen" :: outDir :: n :: Nil =>
        val nc = n.toLong
        DataGen.customers(spark, nc).write.mode("overwrite").parquet(s"$outDir/customers")
        DataGen.accounts(spark, nc, nc).write.mode("overwrite").parquet(s"$outDir/accounts")
        DataGen.transactions(spark, nc, nc * 10).write.mode("overwrite")
          .parquet(s"$outDir/transactions")
        println(s"generated corpus at $outDir (customers=$nc, tx=${nc * 10})")
      case "quality" :: dataDir :: now :: Nil =>
        val report = Quality.report(
          spark.read.parquet(s"$dataDir/customers"),
          spark.read.parquet(s"$dataDir/accounts"),
          spark.read.parquet(s"$dataDir/transactions"), now)
        report.show(truncate = false)
      case "ingest" :: srcDir :: outDir :: ck :: Nil =>
        val schema = spark.read.parquet(srcDir).schema
        Ingest.incrementalIngest(spark, schema, srcDir, outDir, ck)
        println(s"ingested new files from $srcDir -> $outDir")
      case "bronze" :: sfDir :: root :: batchTs :: Nil =>
        Tables.all.foreach { t =>
          Lake.writeBronze(Tables.load(spark, sfDir, t), root, t, batchTs)
          println(s"bronze $root/$t/batch_ts=$batchTs")
        }
      case "northwind" :: outDir :: Nil =>
        graft.sources.Northwind.materialize(spark, outDir = outDir)
        println(s"northwind fixture at $outDir (${graft.sources.Northwind.schemas.size} tables)")
      case "dedup" :: sfDir :: outDir :: Nil =>
        // End-to-end near-dup dedup: corpus in, survivor corpus out.
        graft.operators.Dedup.dedupCorpus(Tables.load(spark, sfDir, "documents"))
          .write.mode("overwrite").parquet(outDir)
        println(s"deduplicated corpus at $outDir")
      case "dedup-against" :: newDir :: refDir :: outDir :: Nil =>
        // Cross-corpus screen: keep new-corpus docs with no verified
        // near-dup in the reference corpus (kept column reports all).
        graft.operators.Dedup.dedupAgainst(
            Tables.load(spark, newDir, "documents"),
            Tables.load(spark, refDir, "documents"))
          .write.mode("overwrite").parquet(outDir)
        println(s"cross-corpus screen report at $outDir")
      case "decontaminate-spans" :: trainDir :: heldDir :: outDir :: rest
          if rest.size <= 1 =>
        // Span-level decontamination: leaked sentences scrubbed from
        // the train corpus, docs kept (doc_id, n_sent, n_kept,
        // clean_text). Default 8-grams, the realistic overlap size.
        val n = rest.headOption.map(_.toInt).getOrElse(8)
        graft.operators.Dedup.decontaminateSpans(
            Tables.load(spark, trainDir, "documents"),
            Tables.load(spark, heldDir, "documents"), n)
          .write.mode("overwrite").parquet(outDir)
        println(s"span-decontaminated corpus report at $outDir")
      case "strip-boilerplate" :: sfDir :: outDir :: rest if rest.size <= 1 =>
        // Remove passages shared by more than maxDocs distinct docs.
        val maxDocs = rest.headOption.map(_.toInt).getOrElse(1)
        graft.operators.Dedup.stripBoilerplate(
            Tables.load(spark, sfDir, "documents"), maxDocs)
          .write.mode("overwrite").parquet(outDir)
        println(s"boilerplate-stripped corpus at $outDir (maxDocs=$maxDocs)")
      case "cdc-dedup" :: sfDir :: outDir :: Nil =>
        // Sub-document exact-substring dedup (content-defined chunks).
        graft.operators.Dedup.cdcChunkDedup(Tables.load(spark, sfDir, "documents"))
          .write.mode("overwrite").parquet(outDir)
        println(s"CDC-deduplicated corpus at $outDir")
      case "curate" :: sfDir :: outDir :: Nil =>
        // The whole curation pipeline: gate -> dedup -> prune ->
        // resample -> pack, with stage accounting printed.
        val (packed, stats) = graft.pipelines.Curate.run(
          Tables.load(spark, sfDir, "documents")
            .select("doc_id", "text", "lang", "source"))
        packed.write.mode("overwrite").parquet(outDir)
        println(s"curated corpus at $outDir; stats=${stats.get}")
        graft.pipelines.Curate.dataCard(spark, stats.get).show(20, false)
      case "curate-stream" :: srcDir :: outDir :: idx :: st :: ck :: budget :: Nil =>
        // Incremental curation: drain newly-arrived document files
        // through gate -> band-index dedup -> token budget.
        val schema = spark.read.parquet(srcDir).schema
        Ingest.curateIngestStream(spark, schema, srcDir, outDir, idx, st, ck,
          budget.toLong)
        println(s"curated stream drained: $srcDir -> $outDir (budget $budget tokens/domain)")
      case "bpe-train" :: sfDir :: n :: Nil =>
        val merges = graft.functions.Bpe.train(
          Tables.load(spark, sfDir, "documents"), n.toInt)
        merges.zipWithIndex.foreach { case ((a, b), i) =>
          println(f"$i%3d  $a%-8s + $b%-8s -> ${a + b}")
        }
      case "quality-train" :: sfDir :: Nil =>
        // Distill the rule gate into the learned filter (the workflow
        // that produced PipelineInventory.P41Weights) and report
        // training-set agreement.
        import org.apache.spark.sql.functions.{col => c}
        val docs = Tables.load(spark, sfDir, "documents")
        val feats = graft.functions.TextAnalysis.qualityFeatures(docs)
        val labels = graft.functions.TextAnalysis.qualityGate(docs)
          .select(c("doc_id"), c("kept").cast("int").as("label"))
        val w = graft.functions.TextAnalysis.trainQualityLogreg(feats, labels)
        println("weights (bias, " +
          graft.functions.TextAnalysis.qualityFeatureCols.mkString(", ") + "):")
        println(w.map(_.toString).mkString(", "))
        val scored = graft.functions.TextAnalysis.scoreQualityLogreg(feats, w)
          .join(labels, "doc_id")
        val agree = scored.filter(c("kept") === (c("label") === 1)).count()
        println(s"gate agreement: $agree/${scored.count()}")
      case "domain-train" :: sfDir :: Nil =>
        // Fit the one-vs-rest domain classifier on the source column
        // (the workflow that produced PipelineInventory.P51Weights)
        // and report training-set argmax accuracy.
        import org.apache.spark.sql.functions.{col => c}
        val docs = Tables.load(spark, sfDir, "documents")
        val feats = graft.functions.TextAnalysis.qualityFeatures(docs)
        val labels = docs.select(c("doc_id"), c("source").as("domain"))
        val w = graft.functions.TextAnalysis.trainDomainLogreg(feats, labels)
        println("class weights (bias, " +
          graft.functions.TextAnalysis.qualityFeatureCols.mkString(", ") + "):")
        w.foreach { case (cls, ws) =>
          println(s"  $cls: ${ws.map(_.toString).mkString(", ")}")
        }
        val scored = graft.functions.TextAnalysis.scoreDomains(feats, w)
          .select(c("doc_id"), c("domain").as("pred"))
          .join(docs.select(c("doc_id"), c("source")), "doc_id")
        val right = scored.filter(c("pred") === c("source")).count()
        println(s"argmax accuracy: $right/${scored.count()}")
      case "quality-fixture" :: rest if rest.lengthCompare(1) <= 0 =>
        // Explicit fixture materialization (q42's corpus) — queries only
        // READ the committed fixture; regeneration is this command.
        val dir = rest.headOption.getOrElse(DataGen.qualityCorpusDir)
        DataGen.materializeQualityCorpus(spark, dir)
        println(s"quality corpus fixture at $dir")
      case "sql" :: sfDir :: stmt :: Nil =>
        // SQL entry point over the registered corpus (SELECT-only, the
        // P11 classifier guards against statement injection into a
        // read-only surface).
        require(graft.sources.Meta.isSelectStatement(spark, stmt),
          "only SELECT statements are accepted")
        Tables.registerAll(spark, sfDir)
        spark.sql(stmt).show(100, truncate = false)
      case "hash-split" :: sfDir :: outDir :: rest if rest.size <= 1 =>
        // Deterministic train/val/test assignment, written partitioned
        // by split so downstream readers prune to their slice.
        val fracs = rest.headOption.getOrElse("0.8,0.1,0.1")
          .split(',').map(_.trim.toDouble)
        require(fracs.length == 3, "expected three fractions train,val,test")
        graft.operators.Mix.hashSplit(
            Tables.load(spark, sfDir, "documents"),
            Seq("train", "val", "test").zip(fracs.toSeq))
          .write.mode("overwrite").partitionBy("split").parquet(outDir)
        println(s"split corpus at $outDir (${fracs.mkString("/")}, partitioned by split)")
      case "corpus-diff" :: oldDir :: newDir :: outDir :: Nil =>
        // Snapshot audit: docs added/removed/changed between versions.
        graft.operators.Quality.corpusDiff(
            Tables.load(spark, oldDir, "documents"),
            Tables.load(spark, newDir, "documents"))
          .write.mode("overwrite").parquet(outDir)
        println(s"corpus diff report at $outDir")
      case "report" :: sfDir :: outDir :: Nil =>
        // Corpus audit bundle — the numbers a data card quotes:
        // distinct-n diversity, exact top-20 tokens, and the
        // (lang, source) mixture with natural shares.
        val docs = Tables.load(spark, sfDir, "documents")
        graft.functions.TextAnalysis.distinctNgrams(docs)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/diversity")
        graft.functions.Sketch.heavyHitters(docs, k = 20, budget = 4096)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/heavy_hitters")
        graft.operators.Mix.temperatureWeights(docs, Seq("lang", "source"), tau = 1.0)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/mixture")
        println(s"corpus report (diversity, heavy_hitters, mixture) at $outDir")
      case "dsir-select" :: sfDir :: outDir :: n :: rest if rest.size <= 1 =>
        // DSIR data selection: the raw corpus scored against its own
        // targetLang slice (default en), top-n written out.
        val docs = Tables.load(spark, sfDir, "documents")
        val lang = rest.headOption.getOrElse("en")
        graft.operators.Mix.dsirSelect(docs,
            docs.filter(org.apache.spark.sql.functions.col("lang") === lang),
            n = n.toInt)
          .write.mode("overwrite").parquet(outDir)
        println(s"top-$n DSIR selection (target lang=$lang) at $outDir")
      case "bm25-index" :: sfDir :: indexDir :: Nil =>
        graft.functions.TextAnalysis.writeBm25Index(
          Tables.load(spark, sfDir, "documents"), indexDir)
        println(s"BM25 index (token-sorted postings) at $indexDir")
      case "bm25-search" :: sfDir :: indexDir :: nQueries :: k :: Nil =>
        val docs = Tables.load(spark, sfDir, "documents")
        val q = docs.filter(
            org.apache.spark.sql.functions.col("doc_id") < nQueries.toLong)
          .select(org.apache.spark.sql.functions.col("doc_id").as("q_id"),
            org.apache.spark.sql.functions.col("text").as("qtext"))
        graft.functions.TextAnalysis.bm25SearchIndex(spark, indexDir, q, k = k.toInt)
          .orderBy("q_id", "rn").show(5 * k.toInt, truncate = false)
      case "hybrid-search" :: sfDir :: nQueries :: k :: Nil =>
        // BM25 ∪ dense cosine, fused by reciprocal rank.
        val docs = Tables.load(spark, sfDir, "documents")
        val q = docs.filter(
            org.apache.spark.sql.functions.col("doc_id") < nQueries.toLong)
          .select(org.apache.spark.sql.functions.col("doc_id").as("q_id"),
            org.apache.spark.sql.functions.col("text").as("qtext"))
        graft.operators.Retrieval.hybridTopK(docs,
            Tables.load(spark, sfDir, "embeddings"), q, k = k.toInt)
          .orderBy("q_id", "rn").show(5 * k.toInt, truncate = false)
      case "pq-search" :: sfDir :: nQueries :: k :: Nil =>
        // Product-quantization ANN end to end: train codebooks, encode
        // the corpus, ADC-search the first nQueries vectors.
        val emb = Tables.load(spark, sfDir, "embeddings")
        val queries = emb.filter(
          org.apache.spark.sql.functions.col("vec_id") < nQueries.toLong)
        graft.operators.Ann.pqTopK(emb, queries, k = k.toInt)
          .orderBy("q_id", "rn").show(5 * k.toInt, truncate = false)
      case "ivf-build" :: sfDir :: indexDir :: k :: Nil =>
        val emb = Tables.load(spark, sfDir, "embeddings")
        graft.operators.Ann.writeIvfIndex(emb,
          emb.filter(org.apache.spark.sql.functions.col("vec_id") < k.toLong), indexDir)
        println(s"IVF index at $indexDir (cluster-partitioned, $k centroids)")
      case "embed-stats" :: sfDir :: outDir :: Nil =>
        // exact covariance + correlation long-form (the r106/r111 rows)
        // as a persisted, batch-mergeable artifact
        val cells = graft.operators.Ann.covarianceCells(
          Tables.load(spark, sfDir, "embeddings"))
        graft.operators.Ann.correlationFromCells(cells)
          .write.mode("overwrite").parquet(outDir)
        println(s"embedding covariance/correlation cells at $outDir")
      case "embed-drift" :: sfDir :: outDir :: rest if rest.size <= 1 =>
        // Per-group embedding drift vs the pooled corpus (r114): the
        // monitoring report a data card quotes per source/class.
        val groupCol = rest.headOption.getOrElse("label")
        graft.operators.Ann.embeddingDriftBy(
            Tables.load(spark, sfDir, "embeddings"), groupCol)
          .write.mode("overwrite").parquet(outDir)
        println(s"per-$groupCol embedding drift report at $outDir")
      case "embed-drift-against" :: refDir :: curDir :: outDir :: Nil =>
        // Release-gate drift: current corpus vs a frozen reference
        // snapshot (r115).
        graft.operators.Ann.embeddingDriftAgainst(
            Tables.load(spark, refDir, "embeddings"),
            Tables.load(spark, curDir, "embeddings"))
          .write.mode("overwrite").parquet(outDir)
        println(s"embedding drift vs reference at $outDir")
      case "snapshot-cells" :: sfDir :: outDir :: Nil =>
        // Freeze the corpus's embedding distribution as d diagonal
        // summary cells — the persisted reference artifact the drift
        // gate scores later corpora against (Ann.diagCells; batches
        // appended later merge by addition).
        graft.operators.Ann.diagCells(Tables.load(spark, sfDir, "embeddings"))
          .write.mode("overwrite").parquet(outDir)
        println(s"frozen embedding snapshot cells at $outDir")
      case "drift-gate" :: sfDir :: snapDir :: outDir :: rest
          if rest.size <= 3 =>
        // The release-gate verdict (the Curate.DriftGate stage as a
        // standalone report): current corpus vs the frozen snapshot,
        // with the drifted predicate materialized per dimension.
        val maxZ = rest.headOption.map(_.toDouble).getOrElse(4.0)
        val lo = rest.drop(1).headOption.map(_.toDouble).getOrElse(0.25)
        val hi = rest.drop(2).headOption.map(_.toDouble).getOrElse(4.0)
        val rep = graft.operators.Ann.embeddingDriftAgainstCells(
            spark.read.parquet(snapDir),
            Tables.load(spark, sfDir, "embeddings"))
          .withColumn("drifted",
            col("n_ref").isNull || col("n_cur").isNull ||
              abs(col("mean_z")) > maxZ ||
              col("var_ratio") < lo || col("var_ratio") > hi ||
              (col("mean_z").isNull && !(col("mean_cur") <=> col("mean_ref"))))
        rep.write.mode("overwrite").parquet(outDir)
        val n = rep.filter(col("drifted")).count()
        println(s"drift-gate report at $outDir: $n drifted dims" +
          (if (n > 0) " — RETRAIN/INVESTIGATE before release" else " (gate passes)"))
      case "gold-mart" :: sfDir :: outRoot :: Nil =>
        // Materialize the reference's declared dashboard set (README
        // 34-40) — one parquet dir per panel query.
        for ((panel, frames) <- graft.queries.GoldMart.all(spark, sfDir);
             (q, df) <- frames) {
          df.write.mode("overwrite").parquet(s"$outRoot/$panel/$q")
          println(s"$panel/$q materialized")
        }
        println(s"gold mart at $outRoot")
      case "pca-project" :: sfDir :: outDir :: k :: Nil =>
        val emb = Tables.load(spark, sfDir, "embeddings")
        val (means, eigs, comps) =
          graft.operators.Ann.pcaComponents(emb, k.toInt)
        graft.operators.Ann.pcaProject(emb, means, comps)
          .write.mode("overwrite").parquet(outDir)
        println(s"top-$k PCA projection at $outDir " +
          s"(eigenvalues ${eigs.map(e => f"$e%.4f").mkString(", ")})")
      case "pca-project-by" :: sfDir :: outDir :: k :: rest
          if rest.size <= 1 =>
        // Stratified PCA (the r112 grouped-cells consumer): fit one
        // deterministic eigensolve per group from a single grouped
        // cell pass, score every vector against ITS group's fit — the
        // per-source drift-direction report for a data card.
        val groupCol = rest.headOption.getOrElse("label")
        val emb = Tables.load(spark, sfDir, "embeddings")
        val fits = graft.operators.Ann.pcaComponentsBy(emb, groupCol, k.toInt)
        graft.operators.Ann.pcaProjectBy(emb, groupCol, fits)
          .write.mode("overwrite").parquet(outDir)
        fits.toSeq.sortBy(_._1.map(_.toString)).foreach { case (g, (_, eigs, _)) =>
          println(s"group ${g.getOrElse("NULL")}: eigenvalues " +
            eigs.map(e => f"$e%.4f").mkString(", "))
        }
        println(s"per-$groupCol top-$k PCA projection at $outDir")
      case "pca-outliers" :: sfDir :: outDir :: k :: rt :: mt :: Nil =>
        // The two complementary embedding outlier axes in one report:
        // residual (junk OFF the corpus subspace) + Mahalanobis
        // (extremes ALONG it, σ-weighted) — each a narrow
        // broadcast-literal map, joined on the id.
        val emb = Tables.load(spark, sfDir, "embeddings")
        val (means, eigs, comps) =
          graft.operators.Ann.pcaComponents(emb, k.toInt)
        graft.operators.Ann.pcaResiduals(emb, means, comps, rt.toDouble)
          .withColumnRenamed("outlier", "resid_outlier")
          .join(graft.operators.Ann.pcaMahalanobis(emb, means, eigs,
              comps, mt.toDouble)
            .withColumnRenamed("outlier", "maha_outlier"), "vec_id")
          .write.mode("overwrite").parquet(outDir)
        println(s"PCA outlier report (resid >= $rt, maha >= $mt) at $outDir")
      case "pca-outliers-by" :: sfDir :: outDir :: k :: rt :: mt :: rest
          if rest.size <= 1 =>
        // Stratified: each vector judged against ITS group's fit —
        // catches the cross-source junk a pooled subspace reconstructs
        // perfectly (it spans every source's manifold at once).
        val groupCol = rest.headOption.getOrElse("label")
        val emb = Tables.load(spark, sfDir, "embeddings")
        val fits = graft.operators.Ann.pcaComponentsBy(emb, groupCol, k.toInt)
        graft.operators.Ann.pcaOutliersBy(emb, groupCol, fits,
            rt.toDouble, mt.toDouble)
          .write.mode("overwrite").parquet(outDir)
        println(s"per-$groupCol PCA outlier report at $outDir")
      case "sem-decon" :: sfDir :: outDir :: threshold :: rest
          if rest.size <= 1 =>
        // eval slice = vec_id % 5 == 0 (the r109 convention); nprobe
        // given -> IVF scale path over trained centroids
        val emb = Tables.load(spark, sfDir, "embeddings")
        val c = org.apache.spark.sql.functions.col("vec_id")
        val (train, eval) = (emb.filter(c % 5 =!= 0), emb.filter(c % 5 === 0))
        val scored = rest match {
          case Nil => graft.operators.Ann.semDecontaminate(
            train, eval, threshold.toDouble)
          case np :: Nil =>
            // trainCentroids emits (c_id, cemb); the ANN entry points
            // take centroids in corpus schema (vec_id, embedding)
            val cents = graft.operators.Ann.trainCentroids(train, 16)
              .select(org.apache.spark.sql.functions.col("c_id").as("vec_id"),
                org.apache.spark.sql.functions.col("cemb").as("embedding"))
            graft.operators.Ann.semDecontaminateIvf(
              train, eval, cents, threshold.toDouble, np.toInt)
        }
        scored.write.mode("overwrite").parquet(outDir)
        println(s"semantic decontamination verdicts at $outDir")
      case "corpus-health" :: sfDir :: outDir :: Nil =>
        // the corpus-level health checks: Zipf fit + per-doc
        // readability + n-gram commonality, one artifact each
        val docs = Tables.load(spark, sfDir, "documents")
        graft.functions.TextAnalysis.zipfFit(docs)
          .write.mode("overwrite").parquet(s"$outDir/zipf")
        graft.functions.TextAnalysis.readability(docs)
          .write.mode("overwrite").parquet(s"$outDir/readability")
        graft.operators.Dedup.ngramCommonality(docs)
          .write.mode("overwrite").parquet(s"$outDir/commonality")
        println(s"corpus health artifacts (zipf/readability/commonality) under $outDir")
      case "pii-scan" :: sfDir :: outDir :: Nil =>
        graft.functions.TextAnalysis.scrubPiiExtended(
            Tables.load(spark, sfDir, "documents"))
          .write.mode("overwrite").parquet(outDir)
        println(s"structured-identifier PII scan (Luhn cards + IPv4) at $outDir")
      case _ => usage()
    } finally spark.stop()
  }
}
