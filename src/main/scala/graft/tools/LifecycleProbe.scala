package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.model.{IndexKind, IndexSchema}
import graft.store.CollectionStore

/** Stage-level wall breakdown of the lifecycle-dominated gates the
  * round-12 verdict flagged for re-profiling (item #4): w7_backup_restore,
  * w5_bulk_ingest, w1_write_path and pipeline_curation. Each leg is timed
  * separately (guide §1 — find WHERE the seconds go before touching
  * anything); results print as `[probe] <gate>.<leg> <sec>`.
  * Usage: `runMain graft.tools.LifecycleProbe [sfDir] [rounds]`.
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      spark.sparkContext.setJobDescription(null)
      r
    }

    for (round <- 1 to rounds) {
      println(s"== round $round ==")
      // ---- w7_backup_restore --------------------------------------------
      locally {
        val dir = Files.createTempDirectory("graft_probe_bk_").toString
        val db = graft.Graft(spark, dir)
        val part = Tables.part(spark, sfDir).select(
          col("p_partkey").cast("string").as("_id"),
          col("p_name"),
          col("p_size").cast("long").as("p_size"))
        t("w7.create")(db.createCollection("parts", IndexSchema(
          "p_name" -> IndexKind.Str(),
          "p_size" -> IndexKind.Integer), part.filter(col("p_size") <= 10)))
        val seq = t("w7.backup")(db.backup("parts").get)
        val doomed = t("w7.collect_doomed")(part.filter(col("p_size") <= 4)
          .select("_id").as[String].collect().toSeq)
        t(s"w7.deletes_x${(doomed.size + 99) / 100}")(
          doomed.grouped(CollectionStore.MaxDeleteBatch).foreach(b => db.delete("parts", b)))
        val blanked = t("w7.collect_blanked")(part.filter(col("p_size") === 7)
          .select("_id").as[String].collect().toSeq)
        t(s"w7.updates_x${(blanked.size + 99) / 100}")(
          blanked.grouped(CollectionStore.MaxUpdateBatch).foreach { b =>
            db.update("parts",
              b.map(id => (id, CollectionStore.DeleteSentinel)).toDF("_id", "p_name"))
          })
        t("w7.insert_junk")(db.insert("parts",
          Seq(("zzz_junk", "junk row", 99L)).toDF("_id", "p_name", "p_size")))
        t("w7.restore")(db.restore("parts", seq))
        t("w7.readback")(
          db.collection("parts").df.select("_id", "p_name", "p_size")
            .orderBy("_id").localCheckpoint().count())
        graft.Fs.deleteTree(java.nio.file.Paths.get(dir))
      }
      // ---- w5_bulk_ingest -----------------------------------------------
      locally {
        val dir = Files.createTempDirectory("graft_probe_w5_").toString
        val store = new CollectionStore(spark, dir)
        val ord = Tables.orders(spark, sfDir).select(
          col("o_orderkey").cast("string").as("_id"),
          col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        t("w5.create")(store.create("ord", IndexSchema(
          "o_orderstatus" -> IndexKind.Str(),
          "o_totalprice" -> IndexKind.Float),
          ord.filter(col("o_orderkey") % 10 === 0)))
        t("w5.ingest")(store.ingestBatch("ord", ord.filter(col("o_orderkey") % 10 =!= 0)))
        t("w5.readback_agg")(
          store.load("ord").df.groupBy("o_orderstatus")
            .agg(count(lit(1)), sum(col("o_totalprice")))
            .localCheckpoint().count())
        graft.Fs.deleteTree(java.nio.file.Paths.get(dir))
      }
      // ---- w1_write_path ------------------------------------------------
      locally {
        val dir = Files.createTempDirectory("graft_probe_w1_").toString
        val store = new CollectionStore(spark, dir)
        val part = Tables.part(spark, sfDir).select(
          col("p_partkey").cast("string").as("_id"),
          col("p_name"),
          col("p_size").cast("long").as("p_size"),
          col("p_retailprice"))
        t("w1.create")(store.create("parts", IndexSchema(
          "p_name" -> IndexKind.Str(),
          "p_size" -> IndexKind.Integer,
          "p_retailprice" -> IndexKind.Float), part.filter(col("p_size") <= 10)))
        t("w1.insert")(store.insert("parts", part.filter(col("p_size").between(11, 12))))
        val priceUpdates = t("w1.collect_updates")(part.filter(col("p_size") <= 3)
          .select(col("_id"), (col("p_retailprice") + 100).as("p_retailprice"))
          .as[(String, Double)].collect().toSeq)
        t(s"w1.updates_x${(priceUpdates.size + 99) / 100}")(
          priceUpdates.grouped(CollectionStore.MaxUpdateBatch).foreach { b =>
            store.update("parts", b.toDF("_id", "p_retailprice"))
          })
        val nameDeletes = t("w1.collect_sentinels")(part.filter(col("p_size") === 5)
          .select("_id").as[String].collect().toSeq)
        t(s"w1.sentinels_x${(nameDeletes.size + 99) / 100}")(
          nameDeletes.grouped(CollectionStore.MaxUpdateBatch).foreach { b =>
            store.update("parts",
              b.map(id => (id, CollectionStore.DeleteSentinel)).toDF("_id", "p_name"))
          })
        val doomed = t("w1.collect_doomed")(part.filter(col("p_size").between(9, 10))
          .select("_id").as[String].collect().toSeq)
        t(s"w1.deletes_x${(doomed.size + 99) / 100}")(
          doomed.grouped(CollectionStore.MaxDeleteBatch).foreach(b => store.delete("parts", b)))
        t("w1.readback")(
          store.load("parts").df.orderBy("_id").localCheckpoint().count())
        graft.Fs.deleteTree(java.nio.file.Paths.get(dir))
      }
      // ---- pipeline_curation stages --------------------------------------
      locally {
        import graft.operators.{Dedup, TextAnalysis}
        val docs = Tables.documents(spark, sfDir)
        val tokd = t("cur.tokenize_persist")({
          val f = docs.select(col("doc_id"), col("text"), col("source"),
            coalesce(Dedup.tokens(col("text")), array().cast("array<string>"))
              .as("_toks")).persist()
          f.count(); f
        })
        val kept1 = t("cur.admission_checkpoint")({
          val langExpr = TextAnalysis.predLangExpr(col("_toks"))
          val qualExpr = graft.queries.dround(
            TextAnalysis.qualityExpr(col("text"), col("_toks")), 4)
          val k = tokd
            .filter(langExpr === "en" && qualExpr >= 0.5)
            .select(col("doc_id"), col("text"), col("source"))
            .localCheckpoint()
          tokd.unpersist(false); k
        })
        val kept2 = t("cur.exact_dedup")({
          val canon = kept1.groupBy(md5(col("text")).as("_k"))
            .agg(min(col("doc_id")).as("doc_id"))
          val k = kept1.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
            .localCheckpoint()
          k
        })
        val pairs = t("cur.ngram_jaccard_pairs")({
          val p = Dedup.ngramJaccardPairs(kept2, col("doc_id"), col("text"),
            n = 3, threshold = 0.5).localCheckpoint()
          p
        })
        val dropIds = t("cur.connected_components")({
          Dedup.connectedComponents(pairs, col("id_a"), col("id_b"))
            .filter(col("node") =!= col("component"))
            .select(col("node").as("doc_id")).localCheckpoint()
        })
        t("cur.final_agg")(
          kept2.join(dropIds, Seq("doc_id"), "left_anti")
            .groupBy("source")
            .agg(count(lit(1)).as("n_kept"),
              sum(ceil(length(col("text")).cast("double") / 4.0).cast("long")))
            .localCheckpoint().count())
      }
    }
    spark.stop()
  }
}
