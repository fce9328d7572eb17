package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** x102 crossover measurement (VERDICT r10 directive 5): the bloom
  * decontamination route exists for the corpus-sized regime — its recorded
  * numbers so far are only the LOCAL price (~1.18× vs the exact route at
  * sf0.1, where the train side is small enough that the exact distinct
  * shuffle doesn't hurt). This probe scales the TRAIN side R× past that
  * regime with a FIXED small eval suite, forcing both routes same-JVM
  * (route forcing via the maxBloomItems knob — sizing is
  * correctness-neutral by the operator's contract), and reports the first
  * R where the bloom route wins.
  *
  * Train replication uses make_sf1.py's letter-rotation trick (a
  * length-preserving permutation per replica k: rotate 'etaoinshrd' by
  * k%10), so cross-replica shingle overlap collapses and the distinct
  * train-shingle population — the exact route's shuffle payload — grows
  * ~linearly in R, exactly the variable the routes differ on.
  *
  * Run on an otherwise idle machine (measurement discipline: no
  * concurrent JVMs). Args: [sfDir] [replicas...] — defaults
  * /root/repo/testdata_sf1 and R ∈ 1 2 4 8 16. */
object X102Probe {
  private val Rot = "etaoinshrd"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val rs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
             else Seq(1, 2, 4, 8, 16)
    val spark = GraftSession.getOrCreate("x102probe")

    val docs = Tables.documents(spark, sfDir).withColumn("h",
      graft.functions.TextHashFunctions.fingerprint(col("text")) % 100)
    // fixed small eval suite (~2% of the h>=90 split) — the realistic
    // shape: the benchmark suite does NOT grow with the train corpus
    val eval = docs.where(col("h") >= 90 && col("doc_id") % 43 === 0)
      .select("doc_id", "text").localCheckpoint()
    val nEval = eval.count()
    // expected eval shingles: docs × ≤512 shingles/doc upper bound, the
    // operator's sizing contract (correctness-neutral)
    val est = nEval * 512
    require(est <= Dedup.MaxBloomItems,
      s"eval suite too large for the bloom cap: $est")
    println(s"[x102probe] sf=$sfDir evalDocs=$nEval estShingles=$est")

    def rotated(k: Int): Column = {
      val to = Rot.drop(k % 10) + Rot.take(k % 10)
      translate(col("text"), Rot, to)
    }
    for (r <- rs) {
      val variants = (0 until r).foldLeft(lit(null).cast("string")) {
        (acc, k) => when(col("k") === k, rotated(k)).otherwise(acc)
      }
      val train = docs.where(col("h") < 80)
        .crossJoin(spark.range(r).select(col("id").cast("int").as("k")))
        .select((col("doc_id") * r + col("k")).as("doc_id"),
          variants.as("text"))
      def run(route: String, maxItems: Long): Double = {
        val t0 = System.nanoTime()
        val out = Dedup.contaminationCounts(train, eval, est,
            maxBloomItems = maxItems)
          .agg(count(lit(1)), sum("n_shared")).head()
        val secs = (System.nanoTime() - t0) / 1e9
        assert(Dedup.lastDecontamRoute == route,
          s"expected $route, got ${Dedup.lastDecontamRoute}")
        println(f"[x102probe] R=$r%2d $route%5s: $secs%7.2f s " +
          s"(flagged=${out.get(0)}, sumShared=${out.get(1)})")
        secs
      }
      // alternate route order and keep best-of-2 per route so JIT/page
      // cache drift cannot bias one side
      val b1 = run("bloom", Dedup.MaxBloomItems)
      val e1 = run("exact", 0)
      val b2 = run("bloom", Dedup.MaxBloomItems)
      val e2 = run("exact", 0)
      val (b, e) = (math.min(b1, b2), math.min(e1, e2))
      println(f"[x102probe] R=$r%2d best: bloom=$b%.2f exact=$e%.2f " +
        f"ratio=${b / e}%.2f ${if (b < e) "<-- bloom wins" else ""}")
    }
    spark.stop()
  }
}
