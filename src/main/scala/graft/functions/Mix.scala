package graft.functions

/** Shared splitmix64 finalizer — the deterministic integer mixer behind
  * every literal constant family (min-hash coefficients, LSH hyperplanes,
  * k-means init centroids). One definition so the families can never drift
  * from the values their oracle SQL embeds. */
object Mix {
  def splitmix(z0: Long): Long = {
    var x = z0 * 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
