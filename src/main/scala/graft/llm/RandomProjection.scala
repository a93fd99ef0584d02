package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: d-dim float embeddings to
  * k-dim sketches via a Rademacher (±1) sign matrix, preserving pairwise
  * L2 distances within (1±ε) for k = O(log n / ε²).
  *
  * At 100 TB the projection is the cheap half of every downstream ANN /
  * clustering / dedup pass: one narrow O(d·k) kernel per row, no shuffle,
  * and the 4× (64→16 dims) smaller vectors shrink every later exchange
  * and index by the same factor. The sign matrix is a deterministic
  * function of (input dim, output dim) — nothing to broadcast but a seed,
  * and any engine can regenerate it bit-for-bit (the oracle replays the
  * same polynomial in SQL).
  */
object RandomProjection {

  /** Deterministic Rademacher sign for input dim `i`, output dim `j`:
    * +1 when `((i*37 + j*61) * 127 mod 101)` is even, else −1. A fixed
    * small-prime polynomial rather than a seeded hash so the matrix is
    * reproducible in plain SQL; swap in any sign source with the same
    * signature for production seeds.
    */
  def polySign(i: Int, j: Int): Double =
    if ((((i * 37 + j * 61) * 127) % 101) % 2 == 0) 1.0 else -1.0

  /** The k×d sign matrix as a JVM array (k and d are tiny — 16×64 —
    * so it lives in the closure; no broadcast needed).
    */
  def signMatrix(d: Int, k: Int): Array[Array[Double]] =
    Array.tabulate(k, d)((j, i) => polySign(i, j))

  /** Projected vector column: `array<double>` of length k, each component
    * `round(Σ_i vec[i]·sign(i,j), 6)`. One while-loop kernel per row
    * (the repo's measured-faster-than-column-algebra discipline for
    * per-row numeric folds); ascending-i summation so any oracle summing
    * in index order reproduces the identical doubles before the 6-dp
    * round.
    */
  def project(vec: Column, d: Int, k: Int): Column = {
    val signs = signMatrix(d, k)
    val kernel = udf { (v: Seq[Float]) =>
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        val row = signs(j)
        var acc = 0.0
        var i = 0
        while (i < d) { acc += v(i).toDouble * row(i); i += 1 }
        out(j) = math.floor(acc * 1e6 + 0.5) / 1e6
        j += 1
      }
      out
    }
    kernel(vec)
  }

  /** Squared L2 between a projected row and a fixed projected query
    * (length k), rounded 6 dp — same shape as
    * [[ProductQuant.exactTopK]]'s kernel.
    */
  def dist2(proj: Column, query: Array[Double]): Column = {
    val kernel = udf { (p: Seq[Double]) =>
      var dsum = 0.0
      var i = 0
      while (i < query.length) { val t = p(i) - query(i); dsum += t * t; i += 1 }
      math.floor(dsum * 1e6 + 0.5) / 1e6
    }
    kernel(proj)
  }

  /** Norm-preservation ratio `(‖p‖²/k) / ‖x‖²` — the JL guarantee says
    * this concentrates around 1. Zero-norm inputs → ratio 0.
    */
  def normRatio(vec: Column, proj: Column, k: Int): Column = {
    val kernel = udf { (v: Seq[Float], p: Seq[Double]) =>
      var nx = 0.0
      var i = 0
      while (i < v.length) { nx += v(i).toDouble * v(i).toDouble; i += 1 }
      var np = 0.0
      var j = 0
      while (j < p.length) { np += p(j) * p(j); j += 1 }
      if (nx == 0.0) 0.0 else (np / k) / nx
    }
    kernel(vec, proj)
  }
}
