package graft.functions

/** The splitmix64 finalizer every deterministic fixture in the engine
  * derives from (change-event generator, JSON metadata fixture, LSH
  * hyperplanes). ONE definition: the constants are seed-critical — a
  * drifted private copy would silently change one fixture's data while
  * the others (and every recorded oracle hash) stay put.
  */
object Splitmix {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4B9B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
