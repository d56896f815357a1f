package graft.util

/** Deterministic splittable pseudo-randomness: every draw is a pure function
  * of (seed, stream, index), so generation is reproducible under ANY Spark
  * partitioning — the property the synthetic-changelog generator needs
  * (no external data; fixed seed ⇒ byte-identical log).
  *
  * mix64 is the SplitMix64 finalizer (public domain, Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014).
  */
object Rand {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix(seed: Long, stream: Long, i: Long): Long =
    mix64(mix64(seed ^ (stream * 0x9e3779b97f4a7c15L)) ^ i)

  /** Uniform double in [0, 1). */
  def uniform(seed: Long, stream: Long, i: Long): Double =
    (mix(seed, stream, i) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform int in [0, n). */
  def nextInt(seed: Long, stream: Long, i: Long, n: Int): Int =
    (java.lang.Long.remainderUnsigned(mix(seed, stream, i), n.toLong)).toInt

  /** Stable 64-bit string hash (FNV-1a), independent of Spark's hash so the
    * generator and driver-side oracles agree without a Spark session. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def hex(z: Long): String = f"$z%016x"
}
