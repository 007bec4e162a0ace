package graft

/** Shared brute-force reference implementations for specs — one copy,
  * so a fix can never diverge between test files. */
object TestOracles {

  /** Classic DP Levenshtein distance (insert/delete/substitute, unit
    * costs) — the reference both DedupSpec and PropertySpec check
    * `Dedup.editDistOnePairs` against. */
  def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
