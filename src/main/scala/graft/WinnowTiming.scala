package graft

import org.apache.spark.unsafe.types.UTF8String

/** Dev tool: micro-bench of the winnowing kernel across (k, w) — the
  * point of the O(n) rewrite is that runtime no longer scales with k·w.
  * Pure-JVM loop over the kernel (no Spark session: the expression is a
  * static call, so this times exactly what codegen executes). A naive
  * O(n·k + n·w) mirror runs beside it for the before/after factor.
  */
object WinnowTiming {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val mod = 1L << 25
    val rnd = new scala.util.Random(7)
    val text = UTF8String.fromString(
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)

    // the r3 implementation verbatim (O(n·k) gram loop, O(n·w) window
    // rescan, same first-seen dedup) so the factor isolates the loops
    def naive(s: String, k: Int, w: Int): Int = {
      val len = s.length
      val m = len - k + 1
      val hs = new Array[Long](m)
      var i = 0
      while (i < m) {
        var a = 0L; var j = 0
        while (j < k) { a = (a * 31L + s.charAt(i + j)) % mod; j += 1 }
        hs(i) = a; i += 1
      }
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      var p = 0
      while (p + w <= m) {
        var mn = hs(p); var q = p + 1
        while (q < p + w) { if (hs(q) < mn) mn = hs(q); q += 1 }
        out.add(mn); p += 1
      }
      out.size
    }

    val s = text.toString
    // JIT both kernels before any measurement (C2 needs thousands of
    // inner-loop iterations; the first measured pair would otherwise
    // pay compilation inside its timing)
    (1 to 3).foreach { _ =>
      graft.functions.WinnowFingerprints.compute(text, 8, 4, mod)
      naive(s, 8, 4)
    }
    for ((k, w) <- Seq((8, 4), (32, 16), (64, 64))) {
      // warm + measure, min of 3
      def time(f: => Any): Double =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val rolled = time(
        graft.functions.WinnowFingerprints.compute(text, k, w, mod))
      val quad = time(naive(s, k, w))
      println(f"WINNOW k=$k%-3d w=$w%-3d rolling=$rolled%7.3f s  " +
        f"naive=$quad%7.3f s  factor=${quad / rolled}%5.1fx")
    }
  }
}
