package graft

import graft.ops.VectorSim
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch recall measurement for the LSH ANN tuning. */
object DebugAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"ANN_CORPUS n=${emb.count()} dim=" +
      emb.select(size(col("embedding"))).head().getInt(0))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val bf = VectorSim.topKBruteForce(queries, corpus, 3, native = true)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((planes, h, tables) <- Seq((6, 2, 1), (6, 2, 2), (6, 2, 4),
        (8, 2, 4), (8, 2, 6), (10, 2, 8))) {
      val t0 = System.nanoTime()
      val ann = VectorSim.topKAnn(queries, corpus, 3, planes, h,
          native = true, tables = tables)
        .select(col("q_id"), col("n_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bf.intersect(ann).size.toDouble / bf.size
      println(f"ANN planes=$planes h=$h tables=$tables recall=$recall%.3f " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
