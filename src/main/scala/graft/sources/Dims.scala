package graft.sources

/** Overflow-safe element-count product for claimed dataset shapes,
  * shared by the binary readers ([[MatSource]], [[H5Source]]) — the
  * previous per-reader folds short-circuited once the running product
  * passed Int.MaxValue, but a single step could still wrap a Long
  * (dims = [2, 2^62]: the accumulator stays small, the product goes
  * negative) and a negative "claimed" count slips under the
  * bytes-available cross-check the guard exists to enforce.
  */
private[sources] object Dims {
  def product(dims: Seq[Long], what: String): Long = {
    require(dims.forall(_ >= 0), s"$what claims negative dims $dims")
    dims.foldLeft(1L) { (a, x) =>
      try Math.multiplyExact(a, x)
      catch {
        case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"$what claims dims $dims whose element count overflows a Long")
      }
    }
  }
}
