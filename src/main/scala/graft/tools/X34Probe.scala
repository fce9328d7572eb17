package graft.tools
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.sources.Tables
import graft.operators.{Dedup, Similarity => S}
import graft.functions.{VectorFunctions => V}
object X34Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("x34probe")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, dir)
    val keyed = S.withBandKeys(emb)
      .select(col("vec_id") +: (0 until S.Bands).map(b => col(s"k$b")) :+
        V.asDouble(col("embedding")).as("v"): _*)
    val rows = keyed.withColumn("ks", array((0 until S.Bands).map(b => col(s"k$b")): _*))
      .select(col("vec_id"), col("ks"), col("v"))
      .select(explode(expr(s"transform(sequence(0, ${S.Bands - 1}), b -> struct(CAST(b AS INT) AS band, ks[b] AS key))")).as("bk"), col("vec_id"), col("ks"), col("v"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("vec_id"), col("ks"), col("v"))
    val parts = rows
      .repartition(spark.sparkContext.defaultParallelism, col("band"), col("key"))
      .sortWithinPartitions("band", "key", "vec_id")
      .as[(Int, Long, Long, Array[Long], Array[Double])]
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        var nrows = 0L; var pairs = 0L; var dots = 0L; var hits = 0L
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val keys = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
        var curBand = 0; var curKey = 0L; var has = false
        var dotNanos = 0L
        def flush(): Unit = if (has) {
          val n = vecs.length
          val vv = vecs.toArray; val kv = keys.toArray
          val norms = new Array[Double](n)
          var i = 0
          while (i < n) { norms(i) = math.sqrt(Dedup.dotArr(vv(i), vv(i))); i += 1 }
          val b = curBand
          var j = 1
          while (j < n) {
            val vj = vv(j); val kj = kv(j); val nj = norms(j)
            var i2 = 0
            while (i2 < j) {
              pairs += 1
              val ki = kv(i2)
              var t = 0; var firstHere = true
              while (firstHere && t < b) { if (ki(t) == kj(t)) firstHere = false; t += 1 }
              if (firstHere) {
                dots += 1
                val td = System.nanoTime()
                val cos = Dedup.round4(Dedup.dotArr(vv(i2), vj) / (norms(i2) * nj))
                dotNanos += System.nanoTime() - td
                if (cos.isNaN || cos >= 0.3) hits += 1
              }
              i2 += 1
            }
            j += 1
          }
          ids.clear(); keys.clear(); vecs.clear()
        }
        it.foreach { case (band, key, id, ks, v) =>
          nrows += 1
          if (!has || band != curBand || key != curKey) { flush(); curBand = band; curKey = key; has = true }
          ids += id; keys += ks; vecs += v
        }
        flush()
        Iterator((nrows, pairs, dots, hits, (System.nanoTime()-t0)/1e9, dotNanos/1e9))
      }.collect()
    parts.sortBy(-_._5).take(8).foreach(p => println(s"[probe] part rows=${p._1} pairs=${p._2} dots=${p._3} hits=${p._4} secs=${f"${p._5}%.2f"} dotSecs=${f"${p._6}%.2f"}"))
    println(s"[probe] total pairs=${parts.map(_._2).sum} dots=${parts.map(_._3).sum} hits=${parts.map(_._4).sum} maxTaskSecs=${f"${parts.map(_._5).max}%.2f"}")
    spark.stop()
  }
}
