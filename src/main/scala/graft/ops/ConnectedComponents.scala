package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014) — the 100 TB replacement for
  * plain min-label propagation.
  *
  * Why it scales where propagation doesn't: label propagation needs
  * O(diameter) rounds — a 10M-node chain of boilerplate near-dups takes
  * 10M join rounds. Star contraction halves the tree height every
  * alternation, converging in O(log n) rounds on ANY topology, each
  * round two groupBy-min shuffles over the (shrinking) edge list. Both
  * operations keep edges oriented big-id → small-id, so at fixpoint the
  * edge list IS the answer: a star forest mapping every node to its
  * component minimum — deterministic regardless of partitioning or
  * execution order.
  *
  * Engine pattern notes (same as q78's original loop): a driver loop of
  * declarative per-round plans with `localCheckpoint` truncating
  * lineage (the plan would otherwise double per round), convergence
  * decided from a one-row checksum aggregate (count + xor of
  * xxhash64(src,dst) — order-insensitive, so it is a pure function of
  * the edge SET), and a loud failure on cap-out rather than silently
  * wrong labels. Checkpoints are LAZY: the checksum is the round's only
  * action, and materializing the checkpoint happens inside that same
  * job — one job per round, not a checkpoint job plus a checksum job.
  */
object ConnectedComponents {

  /** Large-star: every node connects its strictly-larger neighbors to
    * the minimum of its neighborhood (including itself). Input edges in
    * either orientation; output oriented big → small, deduplicated.
    */
  private[ops] def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val minNbr = nbrs.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("m"))
    nbrs.join(minNbr, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** Small-star: every node connects its smaller neighbors AND itself
    * to its minimum smaller neighbor. Requires edges oriented
    * big → small (large-star's postcondition); preserves it.
    */
  private[ops] def smallStar(edges: DataFrame): DataFrame = {
    val minNbr = edges.groupBy(col("src")).agg(min(col("dst")).as("m"))
    val rewired = edges.join(minNbr, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    rewired.union(minNbr.select(col("src"), col("m").as("dst")))
      .distinct()
  }

  /** Order-insensitive fingerprint of the edge set — one tiny
    * driver-side row per round, the loop's only action. XOR (not sum)
    * so ANSI mode can't overflow; edges within a round are distinct, so
    * the XOR is a well-defined set fingerprint.
    */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Connected components of the undirected graph given as an edge
    * list. `edges` must have two integral columns named src/dst (any
    * orientation, self-loops and duplicates tolerated). Returns
    * (id, label) for every node incident to an edge, where label is the
    * component's minimum node id.
    */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    runWithStats(edges, maxRounds)._1

  /** As [[run]], also returning the number of NON-representative nodes
    * (nodes whose label differs from their id). Free: the converged
    * edge list is a star forest — every dropped node appears exactly
    * once as a src — so the loop's own convergence checksum already
    * counted it; no extra job runs. Lets consumers size the removal
    * join (broadcast vs shuffle) without re-counting the labels.
    */
  def runWithDropCount(edges: DataFrame, maxRounds: Int = 50): (DataFrame, Long) = {
    val (labels, _, dropped) = runImpl(edges, maxRounds)
    (labels, dropped)
  }

  /** As [[run]], also returning the number of large+small alternations
    * until fixpoint (spec hook for the O(log n) convergence claim).
    */
  def runWithStats(edges: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    val (labels, rounds, _) = runImpl(edges, maxRounds)
    (labels, rounds)
  }

  private def runImpl(
      edges: DataFrame, maxRounds: Int): (DataFrame, Int, Long) = {
    // materialize the input ONCE — the upstream subtree (for q78, the
    // whole LSH candidate join) must not re-execute per derivation.
    // Lazy: init's checksum job below computes raw, persists it, and
    // persists init, all in one pass.
    val raw = edges.select(col("src"), col("dst")).localCheckpoint(false)
    // nodes are taken BEFORE the self-loop filter: a self-loop-only node
    // is incident to an edge and labels as its own singleton component
    val nodes = raw.select(col("src").as("id"))
      .union(raw.select(col("dst").as("id")))
      .distinct()
    val init = raw
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    var cur = init
    var sig = checksum(cur)
    var rounds = 0
    var converged = sig._1 == 0L // edgeless graph: nothing to contract
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint(false)
      val nextSig = checksum(next) // one action: persists next + fingerprints
      converged = nextSig == sig
      cur = next
      sig = nextSig
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds — " +
        "raise maxRounds (expected O(log n) alternations)")
    val starMap = cur.groupBy(col("src")).agg(min(col("dst")).as("root"))
    val labels = nodes.join(starMap, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("label"))
    // sig._1 is the fixpoint edge count == dropped-node count: the
    // converged list is a star forest (largeStar and smallStar both map
    // a star forest to itself, leaf by leaf), so src values are unique
    // and each edge is one non-min node pointing at its component min
    (labels, rounds, sig._1)
  }
}
