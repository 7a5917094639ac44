package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native top-k-per-key — custom LogicalPlan + Strategy + exec like
  * [[AsOfJoinNative]]. Replaces the `row_number().over(window) <= k`
  * composition for the common "k best rows per group" query
  * (SURVEY.md §2.6 L-family; q13/s33-shaped plans).
  *
  * Why a custom exec: the window composition must SORT every partition
  * fully on (keys, order) before the rank filter discards all but k
  * rows per key — O(n log n) comparisons and a full materialized sort
  * for output that is O(#keys × k). This exec keeps a bounded heap per
  * key (size ≤ k) in one streaming pass: O(n log k), no sort, memory
  * O(#keys × k) per partition. At 100 TB the win compounds: the
  * exchange still hash-partitions by key, but the per-partition sort —
  * the expensive half of the window plan — disappears entirely.
  *
  * Semantics: for each key group, the k smallest rows under `order`
  * (pass DESC SortOrders for "largest"), ranked 1..k with no gaps.
  * `order` must be a TOTAL order (include a tiebreaker column) for
  * deterministic output — same requirement the oracle-checked window
  * variant already had.
  */
case class TopKPerKeyPlan(child: LogicalPlan, grouping: Seq[Expression],
    order: Seq[SortOrder], k: Int, rankAttr: AttributeReference)
  extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyPlan = copy(child = newChild)
}

case class TopKPerKeyExec(child: SparkPlan, grouping: Seq[Expression],
    order: Seq[SortOrder], k: Int, rankAttr: Attribute)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Hash-cluster on the keys so each key group lands in one partition;
    * deliberately NO requiredChildOrdering — avoiding the sort is the
    * point of the operator. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val groupingE = grouping
    val orderE = order
    val kk = k
    // Memory bound for the per-partition heap map. The map holds at most
    // k rows per DISTINCT key, so at adversarial key cardinality (every
    // row its own key) it would otherwise grow to the partition size —
    // the window plan this exec replaces degrades to a spillable sort
    // there, and so must we. Tracked bytes (keys + retained rows) above
    // this bound trigger a spill of the whole map to a key-sorted run on
    // local disk; runs merge streamily at emission. Full
    // TaskMemoryManager accounting isn't reachable from a third-party
    // package (TaskContext.taskMemoryManager is private[spark]), so the
    // bound is a conf, not a cooperative reservation.
    val spillBytes = conf.getConfString(
      "spark.graft.topk.spillBytes", (64L << 20).toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupingE, childOut)
      val toUnsafe = UnsafeProjection.create(childOut, childOut)
      val rowOrd = RowOrdering.create(orderE, childOut)
      new TopKPartitionIterator(iter, keyProj, toUnsafe, rowOrd, kk,
        spillBytes, childOut, rankAttr)
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

/** Per-partition top-k state: bounded heaps keyed by grouping values,
  * with DISK SPILL above `spillBytes` tracked bytes.
  *
  * In-memory state is at most k rows per distinct key, so adversarial
  * key cardinality (every row its own key) grows the map to the
  * partition size — the spillable-sort window plan this exec replaces
  * survives that; an unbounded map OOMs. When tracked bytes (keys +
  * retained rows, exact UnsafeRow sizes) exceed the bound, the whole
  * map is written as ONE KEY-SORTED RUN to local disk and cleared; at
  * emission the runs (plus the residual in-memory map, spilled as the
  * final run) k-way merge by key — each key's ≤ k×runs surviving rows
  * re-reduce through a bounded heap to the true global top k. Merge
  * memory is O(runs × k rows); per-key semantics are EXACTLY the
  * no-spill path's (heap eviction commutes across runs: a row in the
  * true top k survives every partial heap it passes through).
  */
private[plans] final class TopKPartitionIterator(
    input: Iterator[InternalRow],
    keyProj: UnsafeProjection,
    toUnsafe: UnsafeProjection,
    rowOrd: Ordering[InternalRow],
    k: Int,
    spillBytes: Long,
    childOut: Seq[Attribute],
    rankAttr: Attribute) extends Iterator[InternalRow] {

  private val heaps = mutable.LinkedHashMap.empty[UnsafeRow,
    mutable.PriorityQueue[InternalRow]]
  private var trackedBytes = 0L
  private val spills = mutable.ArrayBuffer.empty[java.io.File]

  // spill files die with the task, success or failure (outside a task —
  // plain unit tests driving the iterator directly — delete() runs in
  // the emission exhaustion path below)
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit](_ => spills.foreach(_.delete())))

  /** Unsigned lexicographic byte order — any total order works for the
    * run merge; this one needs no deserialization. */
  private def cmpKey(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def insert(row: InternalRow): Unit = {
    val u = toUnsafe(row)
    val key = keyProj(u)
    heaps.get(key) match {
      case None =>
        val pq = new mutable.PriorityQueue[InternalRow]()(rowOrd)
        val copied = u.copy()
        pq.enqueue(copied)
        heaps.put(key.copy(), pq)
        trackedBytes += key.getSizeInBytes + copied.getSizeInBytes
      case Some(pq) =>
        if (pq.size < k) {
          val copied = u.copy()
          pq.enqueue(copied)
          trackedBytes += copied.getSizeInBytes
        } else if (rowOrd.compare(u, pq.head) < 0) {
          val evicted = pq.dequeue().asInstanceOf[UnsafeRow]
          val copied = u.copy()
          pq.enqueue(copied)
          trackedBytes += copied.getSizeInBytes - evicted.getSizeInBytes
        }
    }
    if (trackedBytes > spillBytes) spill()
  }

  /** Spill under Spark's configured local dirs, NOT `java.io.tmpdir`:
    * on clusters /tmp is often a small tmpfs, and filling it in exactly
    * the adversarial-cardinality case the spill exists for would OOM
    * the node. Resolution mirrors Spark's own
    * `Utils.getConfiguredLocalDirs` (private[spark], hence re-derived):
    * cluster managers deliver per-container scratch space via the
    * LOCAL_DIRS (YARN) / SPARK_LOCAL_DIRS env vars — which OVERRIDE any
    * user-set `spark.local.dir` — then the conf, then tmpdir. Multiple
    * dirs round-robin by partition (same spreading DiskBlockManager
    * does). */
  private def spillDir(): java.io.File = {
    val dirs = sys.env.get("LOCAL_DIRS")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
      .orElse(Option(org.apache.spark.SparkEnv.get)
        .flatMap(e => Option(e.conf.get("spark.local.dir", null))))
      .getOrElse(System.getProperty("java.io.tmpdir"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val pid = Option(org.apache.spark.TaskContext.get())
      .map(_.partitionId()).getOrElse(0)
    val d = new java.io.File(dirs(pid % dirs.length), "graft-topk-spill")
    d.mkdirs()
    d
  }

  /** Write the whole map as one key-sorted run, then clear it.
    * Entry layout: keyLen, keyBytes, nRows, (rowLen, rowBytes)*. */
  private def spill(): Unit = {
    val f = java.io.File.createTempFile("graft-topk-", ".spill", spillDir())
    // Only the no-TaskContext path (iterator abandoned before exhaustion
    // outside any task) needs the JVM-exit backstop: inside a task the
    // TaskCompletionListener deletes the run, and deleteOnExit() entries
    // are never pruned — registering every executor spill would leak the
    // hook set on long-running executors.
    if (org.apache.spark.TaskContext.get() == null) f.deleteOnExit()
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f), 1 << 16))
    try {
      val entries = heaps.toArray
      val keyed = entries.map { case (key, pq) => (key.getBytes, pq) }
      java.util.Arrays.sort(keyed,
        (x: (Array[Byte], mutable.PriorityQueue[InternalRow]),
         y: (Array[Byte], mutable.PriorityQueue[InternalRow])) =>
          cmpKey(x._1, y._1))
      keyed.foreach { case (kb, pq) =>
        out.writeInt(kb.length)
        out.write(kb)
        out.writeInt(pq.size)
        pq.foreach { r =>
          val rb = r.asInstanceOf[UnsafeRow].getBytes
          out.writeInt(rb.length)
          out.write(rb)
        }
      }
    } finally out.close()
    spills += f
    heaps.clear()
    trackedBytes = 0L
  }

  /** Sequential reader over one sorted run. */
  private final class RunReader(f: java.io.File) {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[Array[Byte]] = _
    advance()
    def advance(): Boolean = {
      val kl = try in.readInt() catch {
        case _: java.io.EOFException => in.close(); key = null; return false
      }
      key = new Array[Byte](kl); in.readFully(key)
      rows = Array.fill(in.readInt()) {
        val rb = new Array[Byte](in.readInt()); in.readFully(rb); rb
      }
      true
    }
  }

  private val outExprs = (childOut :+ rankAttr).zipWithIndex.map {
    case (a, i) => BoundReference(i, a.dataType, a.nullable)
  }
  private val outProj = UnsafeProjection.create(outExprs)
  private val joined = new JoinedRow
  private val rankRow = new GenericInternalRow(1)

  /** dequeue order is worst-first; reverse → rank 1 is the best */
  private def ranked(pq: mutable.PriorityQueue[InternalRow]): Iterator[InternalRow] = {
    val worstFirst: Seq[InternalRow] = pq.dequeueAll
    worstFirst.reverseIterator.zipWithIndex.map { case (r, i) =>
      rankRow.update(0, i + 1)
      outProj(joined(r, rankRow))
    }
  }

  private val out: Iterator[InternalRow] = {
    input.foreach(insert)
    if (spills.isEmpty) heaps.iterator.flatMap { case (_, pq) => ranked(pq) }
    else {
      if (heaps.nonEmpty) spill()
      val readers = spills.map(new RunReader(_)).filter(_.key != null)
      // min-heap over run heads by key bytes
      val heads = new mutable.PriorityQueue[RunReader]()(
        Ordering.fromLessThan[RunReader]((x, y) => cmpKey(x.key, y.key) > 0))
      readers.foreach(heads.enqueue(_))
      val nFields = childOut.size
      val groups = new Iterator[mutable.PriorityQueue[InternalRow]] {
        override def hasNext: Boolean = {
          val more = heads.nonEmpty
          if (!more) spills.foreach(_.delete())
          more
        }
        override def next(): mutable.PriorityQueue[InternalRow] = {
          val first = heads.dequeue()
          // capture the group key BEFORE absorb(): advance() rebinds
          // reader.key to the run's next entry
          val groupKey = first.key
          val pq = new mutable.PriorityQueue[InternalRow]()(rowOrd)
          def absorb(r: RunReader): Unit = {
            r.rows.foreach { rb =>
              val u = new UnsafeRow(nFields)
              u.pointTo(rb, rb.length)
              if (pq.size < k) pq.enqueue(u)
              else if (rowOrd.compare(u, pq.head) < 0) {
                pq.dequeue(); pq.enqueue(u)
              }
            }
            if (r.advance()) heads.enqueue(r)
          }
          absorb(first)
          while (heads.nonEmpty && cmpKey(heads.head.key, groupKey) == 0)
            absorb(heads.dequeue())
          pq
        }
      }
      groups.flatMap(ranked)
    }
  }

  override def hasNext: Boolean = out.hasNext
  override def next(): InternalRow = out.next()
}

class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(child, g, o, k, rank) =>
      TopKPerKeyExec(planLater(child), g, o, k, rank) :: Nil
    case _ => Nil
  }
}
