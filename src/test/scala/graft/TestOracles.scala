package graft

/** Driver-side reference implementations shared by specs. */
object TestOracles {
  /** Union-find with path compression over an undirected pair list:
    * vertex → min id of its component (the oracle ConnectedComponents
    * is verified against in LlmSpec and EngineProperties).
    */
  def unionFind(pairs: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).toSeq.distinct
      .map(v => v -> find(v)).toMap
  }
}
