package graft.functions

/** Broadcast payload for [[VecExprs.VecArgMaxCosBroadcast]]: the trained IVF
  * centroid matrix and its precomputed norms. Top-level class so generated
  * Java can name and cast it (`graft.functions.CentroidMatrix`) without
  * Scala-object name mangling.
  */
final class CentroidMatrix(val cents: Array[Array[Double]], val norms: Array[Double])
  extends Serializable
