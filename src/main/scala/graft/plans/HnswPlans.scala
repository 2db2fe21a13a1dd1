package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types._

import graft.index.IndexCatalog

/** Logical leaf producing the (rowid, dist) hits of an HNSW index search —
  * the engine's analog of the reference's `hnsw_index_scan` table function
  * (reference src/hnsw/hnsw_index_scan.cpp:21-153). Cardinality = k, exactly
  * as the reference estimates (reference src/hnsw/hnsw_index_scan.cpp:118-121). */
case class HnswIndexScan(
    indexName: String,
    queryVec: Array[Float],
    k: Int,
    output: Seq[Attribute]) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = 16L * math.max(k, 1), rowCount = Some(BigInt(k)))
  override def simpleString(maxFields: Int): String =
    s"HnswIndexScan $indexName, k=$k"
}

object HnswIndexScan {
  def create(indexName: String, queryVec: Array[Float], k: Int): HnswIndexScan =
    HnswIndexScan(indexName, queryVec, k, Seq(
      AttributeReference("__hnsw_rowid", LongType, nullable = false)(),
      AttributeReference("__hnsw_dist", DoubleType, nullable = false)()))
}

/** Physical index scan: runs the (driver-resident) index search lazily at
  * execution time and parallelizes the k hits. The reference likewise runs
  * the whole search up front in scan-init
  * (reference src/hnsw/hnsw_index.cpp:285-311). */
case class HnswIndexScanExec(
    indexName: String,
    queryVec: Array[Float],
    k: Int,
    output: Seq[Attribute]) extends LeafExecNode {
  override def nodeName: String = "HnswIndexScan"
  override protected def doExecute(): RDD[InternalRow] = {
    val entry = IndexCatalog.get(indexName).getOrElse(
      throw new IllegalStateException(s"HNSW index $indexName was dropped"))
    // conf set = user-pinned ef (SET hnsw_ef_search): the sharded fan-out
    // honors it verbatim instead of raising to the per-shard recall floor
    val efConf = Option(conf.getConfString(IndexCatalog.EfSearchConfKey, null))
    val ef = efConf.map(_.toInt).getOrElse(entry.options.efSearch)
    val efPinned = efConf.isDefined
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val hits = graft.index.VectorIndex.resolve(entry.index) match {
      // sharded: fan out to the shard artifacts, don't load them driver-side
      case sharded: graft.index.ShardedHnswIndex =>
        sharded.searchDistributed(sparkContext, queryVec, k, ef, efPinned)
      case idx => idx.search(queryVec, k, ef)
    }
    val rows = hits.toSeq.map { case (rowid, dist) =>
      proj(InternalRow(rowid, dist)).copy(): InternalRow
    }
    sparkContext.parallelize(rows, 1)
  }
}

/** Logical KNN-candidate generator: child (outer) rows fanned out to their k
  * index matches with a 1-indexed rank — the engine's
  * `LogicalHNSWIndexJoin` (reference src/hnsw/hnsw_optimize_join.cpp:187-317).
  * Output = outer columns ++ (match rowid, rank); the actual row fetch is a
  * rowid equi-join planned above this node. */
case class HnswKnnCandidates(
    indexName: String,
    k: Int,
    vecAttr: Attribute,
    rowidAttr: Attribute,
    rankAttr: Attribute,
    child: LogicalPlan,
    distAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output ++ (Seq(rowidAttr, rankAttr) ++ distAttr)
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(rowidAttr, rankAttr) ++ distAttr)
  override def maxRows: Option[Long] = child.maxRows.map(_ * k)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
  override def simpleString(maxFields: Int): String =
    s"HnswKnnCandidates $indexName, k=$k"
}

/** Physical KNN candidates: broadcast the index once, stream the outer side
  * partition-parallel with no shuffle (the reference's batched
  * `PhysicalHNSWIndexJoin`, src/hnsw/hnsw_optimize_join.cpp:33-181; rank is
  * 1-indexed as there, :148). NULL outer vectors emit nothing (reference
  * NULL semantics, test/sql/hnsw/hnsw_lateral_join.test:46-67).
  *
  * Index residency per executor: a single-graph index is broadcast whole (it
  * is RAM-resident by contract, reference README.md:74). A SHARDED index
  * broadcasts only shard metadata; each task then buffers its outer
  * partition and runs a shard-MAJOR batched search
  * (ShardedHnswIndex.searchBatch) — shards stream through the LRU-capped
  * per-JVM ShardCache one at a time, so executor memory is bounded by
  * cache-cap × max(shard), never Σ(shards). Task memory adds the buffered
  * outer partition + O(batch × k) result heaps. */
case class HnswKnnCandidatesExec(
    indexName: String,
    k: Int,
    vecAttr: Attribute,
    output: Seq[Attribute],
    child: SparkPlan,
    emitDist: Boolean = false) extends UnaryExecNode {
  override def nodeName: String = "HnswKnnJoin"
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
  override protected def doExecute(): RDD[InternalRow] = {
    val entry = IndexCatalog.get(indexName).getOrElse(
      throw new IllegalStateException(s"HNSW index $indexName was dropped"))
    // conf set = user-pinned ef — honored verbatim by the sharded fan-out
    // (no per-shard floor), same resolution as HnswIndexScanExec
    val efConf = Option(conf.getConfString(IndexCatalog.EfSearchConfKey, null))
    val ef = efConf.map(_.toInt).getOrElse(entry.options.efSearch)
    val efPinned = efConf.isDefined
    // session-cached broadcast (see IndexCatalog.broadcastFor): a fresh
    // broadcast per doExecute accumulated across a long session until the
    // block manager evicted the deserialized copies and every later task
    // re-deserialized the whole index on .value
    val bcIndex = IndexCatalog.broadcastFor(sparkContext, entry)
    val childTypes = child.output.map(_.dataType).toArray
    val n = childTypes.length
    val vecOrd = child.output.indexWhere(_.exprId == vecAttr.exprId)
    require(vecOrd >= 0, s"vector column $vecAttr not found in child output")
    val outTypes = output.map(_.dataType).toArray
    val kLocal = k
    val withDist = emitDist
    child.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(outTypes)
      val width = if (withDist) n + 3 else n + 2
      def emit(r: InternalRow, hits: Array[(Long, Double)]): Iterator[InternalRow] =
        hits.iterator.zipWithIndex.map { case ((rowid, dist), pos) =>
          val vals = new Array[Any](width)
          var j = 0
          while (j < n) { vals(j) = r.get(j, childTypes(j)); j += 1 }
          vals(n) = rowid
          vals(n + 1) = pos + 1 // 1-indexed rank, IntegerType (row_number parity)
          if (withDist) vals(n + 2) = dist
          proj(new GenericInternalRow(vals)).copy(): InternalRow
        }
      def queryVec(r: InternalRow): Array[Float] = {
        val ad = r.getArray(vecOrd)
        val q = new Array[Float](ad.numElements())
        var i = 0
        while (i < q.length) { q(i) = ad.getFloat(i); i += 1 }
        q
      }
      val resolved = bcIndex.value match {
        case l: graft.index.LazyLoadedIndex => l.resolved
        case x => x
      }
      resolved match {
        case sh: graft.index.ShardedHnswIndex =>
          // shard-major batch: buffer the partition's outer rows, walk the
          // shards sequentially (one resident at a time), merge per row
          val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          val qs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
          iter.foreach { inRow =>
            if (!inRow.isNullAt(vecOrd)) {
              val r = inRow.copy()
              rows += r
              qs += queryVec(r)
            }
          }
          if (rows.isEmpty) Iterator.empty
          else {
            val results = sh.searchBatch(qs.toArray, kLocal, ef, efPinned)
            rows.iterator.zipWithIndex.flatMap { case (r, i) => emit(r, results(i)) }
          }
        case idx =>
          iter.flatMap { inRow =>
            if (inRow.isNullAt(vecOrd)) Iterator.empty
            else {
              val r = inRow.copy()
              emit(r, idx.search(queryVec(r), kLocal, ef))
            }
          }
      }
    }
  }
}
