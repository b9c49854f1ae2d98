package graft.functions

/** Long-domain number-theory kernels for dialect spellings Spark has no
  * builtin for (CH `gcd`/`lcm`). Called through `StaticInvoke`, so they
  * stay inside whole-stage codegen (Scala object methods compile to
  * static forwarders on the companion class). Semantics match CH: the
  * result is non-negative, `gcd(0, 0) = 0`, and `lcm` overflowing Int64
  * throws (ClickHouse raises a decimal-overflow-class error there too).
  */
object MathKernels {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a)
    var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcd(a, b)
    math.multiplyExact(math.abs(a / g), math.abs(b))
  }
}
