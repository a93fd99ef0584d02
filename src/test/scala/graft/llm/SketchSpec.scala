package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable-sketch kernels: KMV's two branches and error bound, CMS's
  * one-sided error, Bloom's no-false-negative guarantee plus the
  * bit-identical serving twin, and the binned quantile estimator's
  * bin-width error bound.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV: unsaturated sketch (n < k) reports the exact distinct count") {
    val df = (1 to 40).map(i => ("g", i % 10)).toDF("grp", "v")
    val out = Sketches.kmvDistinct(df, col("grp"), col("v"), k = 64).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(1) === 10.0)
  }

  test("KMV: saturated estimate lands within 4/sqrt(k) of the truth") {
    val n = 5000
    val df = (1 to n).map(i => ("g", i)).toDF("grp", "v")
    val k = 256
    val est = Sketches.kmvDistinct(df, col("grp"), col("v"), k)
      .collect().head.getDouble(1)
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 4.0 / math.sqrt(k), s"KMV off by $relErr (est $est vs $n)")
  }

  test("KMV: groups are sketched independently") {
    val df = ((1 to 100).map(i => ("a", i)) ++ (1 to 7).map(i => ("b", i)))
      .toDF("grp", "v")
    val out = Sketches.kmvDistinct(df, col("grp"), col("v"), k = 512)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 100.0 && out("b") === 7.0)
  }

  test("KMV: per-shard hash sketches fold to the whole-corpus estimate") {
    val df = (1 to 3000).map(i => ("g", i, i % 4)).toDF("grp", "v", "shard")
    val k = 128
    val shardHashes = (0 until 4).map(sh =>
      Sketches.kmvHashes(df.where($"shard" === sh), col("grp"), col("v"), k))
    shardHashes.foreach(h => assert(h.count() <= k))
    val folded = Sketches.kmvFromHashes(
      shardHashes.reduce(_ unionByName _).distinct(), k)
      .collect().head.getDouble(1)
    val global = Sketches.kmvDistinct(
      df.select(col("grp"), col("v").cast("string").as("v")), col("grp"), col("v"), k)
      .collect().head.getDouble(1)
    assert(folded === global, s"merged KMV $folded != global $global")
  }

  test("HLL: small cardinality takes the linear-counting branch accurately") {
    val df = (1 to 2000).map(i => ("g", i % 100)).toDF("grp", "v")
    val est = Sketches.hllDistinct(df, col("grp"), col("v"), p = 8)
      .collect().head.getDouble(1)
    // 100 distinct into 256 registers: raw estimate <= 2.5m, V > 0 → LC.
    // LC std error at λ = n/m ≈ 0.39 is ~6% of n; this deterministic hash
    // realization lands at 10.9%, i.e. within 2σ — bound at 3σ.
    val relErr = math.abs(est - 100.0) / 100.0
    assert(relErr < 0.2, s"HLL linear counting off by $relErr (est $est vs 100)")
  }

  test("HLL: saturated estimate lands within 4 sigma of the truth") {
    val n = 5000
    val df = (1 to n).map(i => ("g", i)).toDF("grp", "v")
    val est = Sketches.hllDistinct(df, col("grp"), col("v"), p = 8)
      .collect().head.getDouble(1)
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 4 * 1.04 / 16.0, s"HLL off by $relErr (est $est vs $n)")
  }

  test("HLL: register relation is bounded and groups are independent") {
    val df = ((1 to 3000).map(i => ("a", i)) ++ (1 to 50).map(i => ("b", i)))
      .toDF("grp", "v")
    val regs = Sketches.hllRegisters(df, col("grp"), col("v"), p = 8)
    val perGrp = regs.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGrp("a") <= 256 && perGrp("b") <= 256)
    val out = Sketches.hllFromRegisters(regs, p = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // group b alone is tiny → linear counting is near-exact there
    assert(math.abs(out("b") - 50.0) / 50.0 < 0.1, s"group b est ${out("b")}")
    assert(math.abs(out("a") - 3000.0) / 3000.0 < 4 * 1.04 / 16.0)
  }

  test("HLL: per-shard register sketches fold to the whole-corpus estimate") {
    val df = (1 to 4000).map(i => ("g", i, i % 4)).toDF("grp", "v", "shard")
    val shardRegs = (0 until 4).map(sh =>
      Sketches.hllRegisters(df.where($"shard" === sh), col("grp"), col("v"), p = 8))
    val folded = Sketches.hllFromRegisters(Sketches.hllMerge(shardRegs), p = 8)
      .collect().head.getDouble(1)
    val global = Sketches.hllDistinct(df, col("grp"), col("v"), p = 8)
      .collect().head.getDouble(1)
    assert(folded === global, s"merged HLL $folded != global $global")
  }

  test("KMV overlap: unsaturated sketches give the exact pairwise Jaccard") {
    // a = 1..60, b = 31..90 (overlap 30/90), c = 1..30 (c ⊂ a)
    val df = ((1 to 60).map(i => ("a", i)) ++ (31 to 90).map(i => ("b", i)) ++
      (1 to 30).map(i => ("c", i))).toDF("grp", "v")
    val hashes = Sketches.kmvHashes(df, col("grp"), col("v"), k = 256)
    val out = Sketches.kmvOverlap(hashes, k = 256)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b")) === math.rint(30.0 / 90.0 * 1e4) / 1e4)
    assert(out(("a", "c")) === 0.5)   // 30 / 60
    assert(out(("b", "c")) === 0.0)   // disjoint
  }

  test("KMV overlap: saturated estimate tracks the true Jaccard") {
    // two 4000-element sets sharing 2000 → J = 2000/6000 = 1/3
    val df = ((1 to 4000).map(i => ("a", i)) ++ (2001 to 6000).map(i => ("b", i)))
      .toDF("grp", "v")
    val k = 256
    val est = Sketches.kmvOverlap(Sketches.kmvHashes(df, col("grp"), col("v"), k), k)
      .collect().head.getDouble(2)
    assert(math.abs(est - 1.0 / 3.0) < 4.0 / math.sqrt(k),
      s"overlap estimate $est vs 0.333")
  }

  test("KMV cross-snapshot Jaccard: exact when unsaturated, 0 for one-sided groups") {
    // grp g: A = 1..50, B = 26..75 → J = 25/75; grp only_a exists in A alone
    val a = ((1 to 50).map(i => ("g", i)) ++ (1 to 10).map(i => ("only_a", i)))
      .toDF("grp", "v")
    val b = (26 to 75).map(i => ("g", i)).toDF("grp", "v")
    val k = 256
    val out = Sketches.kmvJaccardAcross(
      Sketches.kmvHashes(a, col("grp"), col("v"), k),
      Sketches.kmvHashes(b, col("grp"), col("v"), k), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("g") === math.rint(25.0 / 75.0 * 1e4) / 1e4)
    assert(out("only_a") === 0.0)
  }

  test("KMV cross-snapshot Jaccard: saturated estimate tracks the truth") {
    // 4000-element snapshots sharing 3000 → J = 3000/5000 = 0.6
    val a = (1 to 4000).map(i => ("g", i)).toDF("grp", "v")
    val b = (1001 to 5000).map(i => ("g", i)).toDF("grp", "v")
    val k = 256
    val est = Sketches.kmvJaccardAcross(
      Sketches.kmvHashes(a, col("grp"), col("v"), k),
      Sketches.kmvHashes(b, col("grp"), col("v"), k), k)
      .collect().head.getDouble(1)
    assert(math.abs(est - 0.6) < 4.0 / math.sqrt(k), s"drift estimate $est vs 0.6")
  }

  test("fixed-grid histogram: shard cells fold to the global histogram; outliers clamp") {
    val df = ((1 to 900).map(i => (i.toDouble, i % 3)) ++
      Seq((-50.0, 0), (5000.0, 1))).toDF("v", "shard")
    val lo = 0.0; val hi = 1000.0; val nBins = 50
    val global = Sketches.fixedBins(df, col("v"), lo, hi, nBins)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = Sketches.binsMerge((0 until 3).map(sh =>
      Sketches.fixedBins(df.where($"shard" === sh), col("v"), lo, hi, nBins)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded === global, "shard-folded histogram diverged from the global one")
    assert(global.keySet.max <= 49 && global.keySet.min >= 0)
    // bin 0 = [0,20): in-range 1..19 plus the clamped -50; bin 49 =
    // [980,1000): nothing in range (max value 900), only the clamped 5000
    assert(global(0L) === 20L)
    assert(global(49L) === 1L)
  }

  test("fixed-grid quantiles: estimates within one bin width of the exact quantile") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val lo = 0.0; val hi = 1000.0; val nBins = 50
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val bins = Sketches.fixedBins(df, col("v"), lo, hi, nBins)
    val est = Sketches.quantilesFromBins(bins, lo, hi, nBins, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = Sketches.exactQuantiles(df, col("v"), qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val w = (hi - lo) / nBins
    qs.foreach { q =>
      assert(math.abs(est(q) - exact(q)) <= w,
        s"q=$q est ${est(q)} vs exact ${exact(q)} (bin width $w)")
    }
  }

  test("histogram PSI: identical sketches score exactly zero") {
    val df = (1 to 500).map(_.toDouble).toDF("v")
    val bins = Sketches.fixedBins(df, col("v"), 0.0, 500.0, 25)
    val rows = Drift.psiFromBins(bins, bins, 25).collect()
    assert(rows.length === 25)
    assert(rows.forall(_.getAs[Double]("term") === 0.0))
    assert(rows.head.getAs[Double]("psi") === 0.0)
  }

  test("histogram PSI: a shifted distribution crosses the 0.25 alert line") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val live = (1 to 1000).map(i => i.toDouble + 400.0).toDF("v")
    val (lo, hi, n) = (0.0, 1500.0, 30)
    val psi = Drift.psiFromBins(
      Sketches.fixedBins(ref, col("v"), lo, hi, n),
      Sketches.fixedBins(live, col("v"), lo, hi, n), n)
      .collect().head.getAs[Double]("psi")
    assert(psi > 0.25, s"shifted PSI $psi should exceed the alert threshold")
  }

  test("bottom-k sample: invariant under repartitioning") {
    val df = (1 to 500).map(i => (s"s${i % 3}", i.toLong)).toDF("src", "id")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sketches.bottomKSample(d, col("src"), col("id"), k = 7)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val base = ids(df)
    assert(base.groupBy(_._1).forall(_._2.size == 7))
    assert(ids(df.repartition(17)) === base)
    assert(ids(df.repartition(1)) === base)
  }

  test("bottom-k sample: global sample equals the fold of shard samples") {
    val df = (1 to 600).map(i => (s"s${i % 2}", i.toLong, i % 4)).toDF("src", "id", "shard")
    val shardSamples = (0 until 4).map(sh =>
      Sketches.bottomKSample(df.where($"shard" === sh), col("src"), col("id"), k = 9))
    val folded = Sketches.bottomKSample(
      shardSamples.reduce(_ unionByName _), col("src"), col("id"), k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val global = Sketches.bottomKSample(df, col("src"), col("id"), k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(folded === global, "shard-folded sample diverged from the global sample")
  }

  test("bottom-k sample: membership is sticky across corpus growth") {
    // every sampled row of the big corpus that exists in the subset must
    // also be sampled in the subset (holdouts never churn on growth)
    val big = (1 to 800).map(i => ("g", i.toLong)).toDF("src", "id")
    val sub = big.where($"id" % 3 =!= 0)
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sketches.bottomKSample(d, col("src"), col("id"), k = 11)
        .collect().map(_.getLong(1)).toSet
    val fromBig = ids(big).filter(_ % 3 != 0)
    assert(fromBig.subsetOf(ids(sub)),
      s"rows ${fromBig -- ids(sub)} left the sample when the corpus shrank")
  }

  test("sketch sidecar: every persisted sketch folds to the direct batch sketch") {
    val df = (1 to 400).map(i =>
      (s"g${i % 3}", s"content $i", Seq(s"tok${i % 25}", s"tok${(i + 1) % 25}"),
        i.toLong, (i % 900).toDouble))
      .toDF("grp", "content", "toks", "id", "len")
    val path = java.nio.file.Files.createTempDirectory("sidecar").toString
    val conf = SketchSidecar.Conf(
      grp = col("grp"), content = col("content"), items = col("toks"),
      key = col("id"), value = col("len"), lo = 0.0, hi = 1000.0, nBins = 20)
    SketchSidecar.write(df, path, conf)

    def kmvMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kmvMap(Sketches.kmvRead(spark, SketchSidecar.kmvPath(path), conf.kmvK)) ===
      kmvMap(Sketches.kmvDistinct(df, col("grp"), col("content"), conf.kmvK)))
    assert(kmvMap(Sketches.hllRead(spark, SketchSidecar.hllPath(path), conf.hllP)) ===
      kmvMap(Sketches.hllDistinct(df, col("grp"), col("content"), conf.hllP)))
    def cellSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(cellSet(Sketches.cmsRead(spark, SketchSidecar.cmsPath(path))) ===
      cellSet(Sketches.cmsCells(df.select(explode(col("toks")).as("t")),
        col("t"), conf.cmsDepth, conf.cmsWidth)))
    def posSet(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.getLong(0)).toSet
    assert(posSet(Sketches.bloomRead(spark, SketchSidecar.bloomPath(path))) ===
      posSet(Sketches.bloomBits(df, col("id"), conf.bloomHashes, conf.bloomBits)))
    def binMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binMap(Sketches.binsRead(spark, SketchSidecar.binsPath(path))) ===
      binMap(Sketches.fixedBins(df, col("len"), conf.lo, conf.hi, conf.nBins)))
    val meta = SketchSidecar.readMeta(spark, path)
    assert(meta.getAs[Int]("kmv_k") === conf.kmvK)
    assert(meta.getAs[Int]("n_bins") === conf.nBins)
    assert(meta.getAs[String]("_generated_at_utc").nonEmpty)
  }

  private val zipfy: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill(61 - i)(s"tok$i"))

  test("CMS: estimates never undercount, and a wide sketch is exact") {
    val items = zipfy.toDF("it")
    val truth = items.groupBy($"it").agg(count(lit(1)).as("true_cnt"))

    // narrow sketch: collisions certain (60 keys into 16 buckets)
    val narrow = Sketches.cmsCells(items, col("it"), depth = 3, width = 16)
    val estN = Sketches.cmsEstimate(truth, col("it"), narrow, 3, 16).collect()
    estN.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"),
        s"CMS undercounted ${r.getAs[String]("it")}")
    }

    // wide sketch: collision-free, so every estimate is exact
    val wide = Sketches.cmsCells(items, col("it"), depth = 4, width = 65536)
    val estW = Sketches.cmsEstimate(truth, col("it"), wide, 4, 65536).collect()
    estW.foreach { r =>
      assert(r.getAs[Long]("est_cnt") === r.getAs[Long]("true_cnt"))
    }
  }

  test("CMS: cells folded from a counts relation equal the streamed cells") {
    val items = zipfy.toDF("it")
    val counts = items.groupBy($"it").agg(count(lit(1)).as("cnt"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) -> r.getAs[Long]("total")
    val streamed = Sketches.cmsCells(items, col("it"), 3, 16)
      .collect().map(key).toMap
    val folded = Sketches.cmsCellsFromCounts(counts, col("it"), col("cnt"), 3, 16)
      .collect().map(key).toMap
    assert(folded === streamed)
  }

  test("merge: per-shard CMS and Bloom sketches compose to the whole-corpus sketch") {
    val all = zipfy.zipWithIndex.map { case (it, i) => (it, i % 3) }.toDF("it", "shard")
    def cellKey(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("seed"), r.getAs[Long]("bucket")) -> r.getAs[Long]("total")

    val shardCells = (0 until 3).map(sh =>
      Sketches.cmsCells(all.where($"shard" === sh), col("it"), 3, 16))
    val merged = Sketches.cmsMerge(shardCells).collect().map(cellKey).toMap
    val global = Sketches.cmsCells(all, col("it"), 3, 16).collect().map(cellKey).toMap
    assert(merged === global)

    val shardBits = (0 until 3).map(sh =>
      Sketches.bloomBits(all.where($"shard" === sh), col("it"), 4, 512))
    val mergedBits = Sketches.bloomMerge(shardBits)
      .collect().map(_.getAs[Long]("pos")).toSet
    val globalBits = Sketches.bloomBits(all, col("it"), 4, 512)
      .collect().map(_.getAs[Long]("pos")).toSet
    assert(mergedBits === globalBits)
  }

  test("Bloom: no false negatives, and the BitSet serving twin matches the join form") {
    val build = (1 to 300).map(i => s"key$i").toDF("k")
    val probes = (1 to 600).map(i => s"key$i").toDF("k")
    val bits = Sketches.bloomBits(build, col("k"), hashes = 6, bits = 4096)

    val joined = Sketches.bloomProbe(probes, col("k"), bits, 6, 4096)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Boolean]("bloom_hit")).toMap
    // every built key must hit
    (1 to 300).foreach(i => assert(joined(s"key$i"), s"false negative on key$i"))
    // unseen keys mostly miss (filter sized for ~2% fp at 300 keys)
    val fp = (301 to 600).count(i => joined(s"key$i"))
    assert(fp < 60, s"$fp false positives out of 300 — filter badly undersized?")

    val served = Sketches.bloomProbeSet(probes, col("k"), bits, 6, 4096)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Boolean]("bloom_hit")).toMap
    assert(served === joined, "BitSet kernel diverged from the join formulation")
  }

  test("binned quantiles: estimates within one bin width; exact arm is type-1") {
    val vals = (1 to 1000).map(v => Tuple1(v.toLong)).toDF("v")
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketches.binnedQuantiles(vals, col("v"), nBins = 50, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val ex = Sketches.exactQuantiles(vals, col("v"), qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val binWidth = 999.0 / 50.0
    qs.foreach { q =>
      // type-1 exact: value at rank ceil(q*n) over 1..1000
      assert(ex(q) === math.ceil(q * 1000).toLong)
      assert(math.abs(est(q) - ex(q)) <= binWidth + 1e-9,
        s"q=$q est ${est(q)} vs exact ${ex(q)} beyond one bin width")
    }
  }

  test("binned quantiles: constant column degenerates to the constant") {
    val vals = Seq.fill(20)(Tuple1(7L)).toDF("v")
    val out = Sketches.binnedQuantiles(vals, col("v"), nBins = 8, Seq(0.5, 0.99))
      .collect().map(_.getDouble(1))
    assert(out.length === 2 && out.forall(_ === 7.0))
  }

  test("fixed-grid histogram: nulls and NaN are excluded, not filed as edge mass") {
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, null, null, Double.NaN)
      .toDF("v")
    val cells = Sketches.fixedBins(df, col("v"), 0.0, 10.0, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells.values.sum === 3L, "null/NaN rows leaked into the histogram")
    assert(!cells.contains(4L), "nulls were filed as hi-edge outlier mass")
  }

  test("PSI and quantiles accept a raw appended bin log (duplicate bin rows fold)") {
    val df = (1 to 500).map(_.toDouble).toDF("v")
    val folded = Sketches.fixedBins(df, col("v"), 0.0, 500.0, 25)
    // a raw two-batch sink log: two rows per bin, half the count each
    val rawLog = folded.withColumn("cnt", col("cnt") / 2)
      .unionByName(folded.withColumn("cnt", col("cnt") - col("cnt") / 2))
    assert(Drift.psiFromBins(rawLog, folded, 25)
      .collect().head.getAs[Double]("psi") === 0.0,
      "duplicate bin rows double-counted inside psiFromBins")
    val qs = Seq(0.5, 0.9)
    val fromLog = Sketches.quantilesFromBins(rawLog, 0.0, 500.0, 25, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val fromCells = Sketches.quantilesFromBins(folded, 0.0, 500.0, 25, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(fromLog === fromCells && fromLog.size === 2,
      "raw log quantiles diverged (or emitted duplicate rows)")
  }

  test("bottom-k sample: graft.debug.checks rejects a non-unique key loudly") {
    val dup = Seq(("g", 1L), ("g", 1L), ("g", 2L)).toDF("src", "id")
    spark.conf.set("graft.debug.checks", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Sketches.bottomKSample(dup, col("src"), col("id"), k = 2).collect()
      }
      assert(e.getMessage.contains("duplicate key"))
      // unique keys still pass under the check
      val ok = Seq(("g", 1L), ("g", 2L)).toDF("src", "id")
      assert(Sketches.bottomKSample(ok, col("src"), col("id"), k = 2).count() === 2)
    } finally spark.conf.unset("graft.debug.checks")
  }

  test("sketch sidecar: rewrite swaps atomically and leaves no staging debris") {
    val df1 = (1 to 100).map(i => (s"g${i % 2}", s"c$i", Seq(s"t${i % 5}"),
      i.toLong, i.toDouble)).toDF("grp", "content", "toks", "id", "len")
    val df2 = (1 to 200).map(i => (s"g${i % 2}", s"c$i", Seq(s"t${i % 5}"),
      i.toLong, i.toDouble)).toDF("grp", "content", "toks", "id", "len")
    val dir = java.nio.file.Files.createTempDirectory("sidecar-swap").toString
    val path = s"$dir/side"
    val conf = SketchSidecar.Conf(
      grp = col("grp"), content = col("content"), items = col("toks"),
      key = col("id"), value = col("len"), lo = 0.0, hi = 250.0, nBins = 10)
    SketchSidecar.write(df1, path, conf)
    SketchSidecar.write(df2, path, conf) // overwrite of an existing sidecar
    val cnt = Sketches.binsRead(spark, SketchSidecar.binsPath(path))
      .agg(sum("cnt")).collect().head.getLong(0)
    assert(cnt === 200L, "rewrite did not fully replace the previous sidecar")
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.contains(".staging-"))
    assert(leftovers.isEmpty, s"staging debris left behind: ${leftovers.mkString(",")}")
  }
}
