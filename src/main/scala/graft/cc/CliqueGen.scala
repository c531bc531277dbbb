package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic re-implementation of the reference CliquesGenerator
  * (/root/reference/src/main/scala/com/kwartile/lib/cc/CliquesGenerator.scala:47-113):
  * block `i` draws node IDs from `[1000·i, 1000·i + span)`, emits 2–101
  * cliques of 2–21 nodes chained through a shared `connectingElement`,
  * so each block is EXACTLY one connected component — the ground truth
  * ships with the data. This reproduces the reference's ID-block skew
  * (comments CCDriver.scala:61-64). Unlike the original (whose
  * `Random.shuffle` is unseeded — CliquesGenerator.scala:66,69) every
  * draw here is seeded per block, so fixtures are reproducible.
  *
  * Generation is distributed: one task per block via `spark.range`,
  * mirroring the reference's `parallelize + mapPartitionsWithIndex`.
  */
object CliqueGen {

  final case class Block(block: Long, cliques: Seq[Seq[Long]], members: Seq[Long])

  private def genBlock(i: Long, seed: Long): Block = {
    val rnd = new scala.util.Random(seed ^ (i * 0x9e3779b97f4a7c15L))
    val base = 1000L * i
    val span = 200 + rnd.nextInt(800)
    val nCliques = 2 + rnd.nextInt(100)
    val connecting = base + rnd.nextInt(span)
    val cliques = (0 until nCliques).map { _ =>
      val k = 2 + rnd.nextInt(20)
      val nodes = Seq.fill(k - 1)(base + rnd.nextInt(span).toLong)
      (connecting +: nodes).distinct
    }
    Block(i, cliques, cliques.flatten.distinct.sorted)
  }

  /** cliques(block: bigint, nodes: array<bigint>) — distributed. */
  def cliques(spark: SparkSession, nBlocks: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nBlocks).repartition(math.min(nBlocks, 32))
      .flatMap(i => genBlock(i, seed).cliques.map(c => (i, c)))
      .toDF("block", "nodes")
  }

  /** Ground truth: every node of block i belongs to the component
    * labeled by the block's minimum node.
    */
  def groundTruth(spark: SparkSession, nBlocks: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(nBlocks).repartition(math.min(nBlocks, 32))
      .flatMap { i =>
        val b = genBlock(i, seed)
        val label = b.members.min
        b.members.map(n => (n, label))
      }
      .toDF("node", "component")
  }
}
