package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Small-files compaction PLANNING — the maintenance job every
  * long-lived 100 TB table needs: ingest (streaming sinks, incremental
  * batches, per-partition appends) accretes files far below the
  * ~128 MB scan-efficient size, and the compactor's first step is a
  * deterministic assignment of files to output buckets of ~target
  * bytes each.
  *
  * The assignment is greedy first-fit in manifest order:
  * `bucket(file) = exclusiveCumulativeBytes(file) div target` — every
  * file lands wholly in one bucket, buckets are contiguous runs of the
  * manifest (compaction preserves sort/ingest locality, which is what
  * keeps min/max file statistics selective after the rewrite), and
  * bucket sizes hover around `target` (a file can straddle the
  * boundary; targets are soft).
  *
  * Scale shape: the input is a FILE MANIFEST — one row per file, i.e.
  * metadata-sized (millions of rows for a 100 TB table), never the
  * data itself. The global running total deliberately avoids
  * `SUM(...) OVER (ORDER BY ...)`, which plans as a single-partition
  * window (every manifest row through one task): like
  * [[GlobalRank]], it range-partitions on the manifest order, collects
  * ONE (partition, subtotal) row per partition (a documented bounded
  * scalar), broadcasts the prefix offsets, and emits the running total
  * partition-locally with no further shuffle. The sorted manifest is
  * persisted so the subtotal pass and the emit pass share one range
  * exchange; [[clear]] releases the pins (SparkEntry.clearCaches
  * calls it, the [[GlobalRank.clear]] lifecycle contract).
  */
object Compaction {

  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, DataFrame)]()

  /** Memoized prefix-summed results, keyed by (session, canonicalized
    * input PLAN OBJECT, sort + value + output spec) — GlobalRank's
    * contract: a bench best-of-2 or a retried job reuses ONE pinned
    * sorted copy instead of accumulating duplicates. Memo lifetime is
    * until [[clear]]: file-source plans canonicalize by ROOT PATH (not
    * file listing), so a manifest path whose FILES change mid-session
    * must clear() before re-planning or it reads the stale sums —
    * the same contract GlobalRank's memo carries. */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String), DataFrame]

  /** Unpersist every sorted manifest pinned on behalf of `s`. */
  def clear(s: SparkSession): Unit = {
    val it = pinned.iterator()
    while (it.hasNext) {
      val (sess, df) = it.next()
      if (sess eq s) { df.unpersist(); it.remove() }
    }
    memo.keys.filter(_._1 eq s).foreach(memo.remove)
  }

  /** `df` + `outCol` = the EXCLUSIVE global running total of
    * `valueCol` (long) in `sortCols` order — row i carries the sum of
    * all values strictly before it. Callers wanting deterministic
    * output must make `sortCols` a total order (every gate does). */
  def withExclusivePrefixSum(df: DataFrame, outCol: String,
      sortCols: Seq[Column], valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val memoKey = (spark, df.queryExecution.logical.canonicalized,
      sortCols.mkString(",") + "|" + valueCol + "|" + outCol + "|" + parts)
    // synchronized: TrieMap.getOrElseUpdate may run the thunk twice
    // under a race and discard one result — here the loser would stay
    // PERSISTED and pinned with no consumer
    memo.synchronized {
      memo.getOrElseUpdate(memoKey,
        computePrefixSum(df, outCol, sortCols, valueCol, parts))
    }
  }

  private def computePrefixSum(df: DataFrame, outCol: String,
      sortCols: Seq[Column], valueCol: String, parts: Int): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    pinned.add((spark, sorted))

    // one row per partition: (pid, byte subtotal) — bounded scalars
    val sums = sorted.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col(valueCol)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    for (p <- 0 until parts) {
      offsets(p) = acc
      acc += sums.getOrElse(p, 0L)
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId — the
    // task id is a STAGE index that drifts under no-shuffle unions
    // (GlobalRank's documented near-miss); the RDD partition index is
    // stable under any downstream composition.
    val summed = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(summed, outSchema)
  }

  /** The compaction plan: one row per output bucket —
    * (bucket, n_files, total_bytes, first_id, last_id), buckets being
    * contiguous id runs of ~`targetBytes`. `idCol` must be a unique
    * manifest order; `sizeCol` the file's bytes. */
  def planBuckets(manifest: DataFrame, idCol: String, sizeCol: String,
                  targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val m = manifest.select(col(idCol).cast("long").as("id"),
      col(sizeCol).cast("long").as("bytes"))
    withExclusivePrefixSum(m, "cum", Seq(col("id")), "bytes")
      .withColumn("bucket", expr(s"cum div ${targetBytes}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        min(col("id")).as("first_id"), max(col("id")).as("last_id"))
  }

  /** EXECUTE the compaction plan (the n22→n24 decision→action
    * discipline applied to [[planBuckets]]): rewrite a
    * [[graft.sources.VersionedParquetStore]]'s current snapshot as
    * EXACTLY ONE FILE PER PLAN BUCKET — contiguous `idCol` runs of
    * ~`targetBytes` by the same greedy first-fit arithmetic — and
    * commit it through the store's snapshot-swap, so a reader sees
    * either the old fragmented layout or the complete compacted one,
    * never a half-rewrite. A crash between write and swap
    * (`beforeCommit`, the injection seam) leaves the pointer — and
    * every reader — on the OLD snapshot, the orphaned directory never
    * visible (CompactionApplySpec pins exactly this).
    *
    * Scale shape: the bucket assignment is the metadata-sized
    * manifest prefix sum (the [[withExclusivePrefixSum]] machinery —
    * never a single-partition window); the data pays ONE hash
    * exchange on `bucket` plus the linear write. Each bucket value
    * hashes wholly into one task, so `partitionBy("bucket")` emits
    * exactly one file per bucket (hash repartition is safe from AQE
    * partition SPLITTING, which applies only to joins and REBALANCE
    * hints — a split would silently double a bucket's file count).
    * Nothing is collected on the driver.
    *
    * The repartition carries an EXPLICIT partition count (the
    * session's shuffle parallelism): a bare `repartition(col)` leaves
    * AQE free to COALESCE the pre-write exchange toward its 64 MB
    * advisory size — correct for shuffle reads, wrong for a
    * dynamic-partition write, where it concentrates many bucket dirs
    * into few tasks and each task then opens/closes its buckets'
    * files SEQUENTIALLY (measured at sf0.1: AQE folded 363 buckets
    * into ONE task, 6.5-7.3 s vs 1.4-2.0 s with the count pinned —
    * the per-file ~19 ms writer open/close serialized end to end).
    * The explicit count keeps writer parallelism at the session's
    * configured width at every scale; one file per bucket holds for
    * ANY count because the hash still sends a bucket wholly to one
    * task.
    *
    * @return the compacted snapshot as committed (carries `bucket`) */
  def applyPlan(spark: SparkSession, root: String, idCol: String,
                sizeCol: String, targetBytes: Long,
                beforeCommit: () => Unit = () => ()): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import graft.sources.VersionedParquetStore
    val expected = VersionedParquetStore.currentVersion(spark, root)
    val cur = VersionedParquetStore.read(spark, root).getOrElse(
      throw new IllegalStateException(s"no snapshot to compact under $root"))
    val m = cur.select(col(idCol).cast("long").as("id"),
      col(sizeCol).cast("long").as("bytes"))
    val assigned = withExclusivePrefixSum(m, "cum", Seq(col("id")), "bytes")
      // internal join-key alias: a bare "id" would collide with an
      // idCol literally named "id" and drop BOTH columns below
      .select(col("id").as("__cmp_id"),
        expr(s"cum div ${targetBytes}L").as("bucket"))
    // a store ALREADY bucket-partitioned (a prior compaction's output)
    // carries `bucket` as a data column — drop it; this pass recomputes
    // the assignment from scratch
    val rows = cur.drop("bucket")
      .join(assigned, cur(idCol) === assigned("__cmp_id"))
      .drop("__cmp_id")
    VersionedParquetStore.commitSnapshot(spark, root, expected,
      path => writeParted(spark, rows)
        .write.mode("errorifexists").partitionBy("bucket").parquet(path),
      beforeCommit)
  }

  /** The pre-write exchange for the dynamic-partition snapshot writes,
    * width governed by `spark.graft.compaction.writeParts`:
    * "session" (default) pins the session's shuffle parallelism,
    * "bare" leaves a bare `repartition(col)` (AQE's advisory then
    * coalesces the exchange — the measured serialized-writer shape:
    * 363 buckets folded into ONE task at sf0.1), and an integer pins
    * that count. The knob exists so the width choice is A/B-able
    * under identical load (round-17 quiet receipts in
    * OPTIMIZATION_r17.md §e18); one file per bucket holds for ANY
    * width because hash partitioning sends a bucket wholly to one
    * task. */
  private def writeParted(spark: SparkSession,
                          df: DataFrame): DataFrame =
    spark.conf.get("spark.graft.compaction.writeParts", "session") match {
      case "session" => df.repartition(
        spark.sessionState.conf.numShufflePartitions, col("bucket"))
      case "bare" => df.repartition(col("bucket"))
      case n => df.repartition(n.toInt, col("bucket"))
    }

  /** INCREMENTAL compaction — [[applyPlan]]'s action made SELECTIVE
    * (the d15/n10/n25 decision→action incrementality applied to the
    * maintenance job itself): rewrite ONLY the buckets whose file
    * count exceeds `maxFilesPerBucket` (the plan says one file per
    * bucket; more means ingest fragmented it), and carry every
    * already-compact bucket into the new snapshot BY REFERENCE via
    * the store's manifest — its physical files are not read, not
    * rewritten, not even opened. At 100 TB this is the difference
    * between a compaction pass that costs O(fragmented region) and
    * one that rewrites the whole table per call (the Iceberg binpack
    * discipline; the round-13 verdict's named scale-killer in the
    * full-rewrite policy).
    *
    * Preconditions: the current snapshot is bucket-partitioned
    * (`bucket=` dirs — [[applyPlan]]'s output layout, or any ingest
    * that wrote through `partitionBy("bucket")`). The decision is
    * pure FILE-LISTING metadata (one listing per bucket dir — never a
    * data read); the action reads and re-buckets only fragmented
    * dirs' rows and commits through the same optimistic snapshot-swap
    * as [[applyPlan]] (a crash between write and swap leaves readers
    * on the old snapshot; a concurrent commit aborts loudly —
    * CompactionIncrementalSpec pins both, plus the carried-files-
    * untouched invariant and vacuum's referenced-snapshot exemption).
    *
    * No-op fast path: with nothing fragmented the store is already at
    * plan and the current snapshot is returned UNCOMMITTED — an empty
    * rewrite would add a snapshot that references everything and
    * compacts nothing.
    *
    * @return the snapshot now current (carries `bucket`) */
  def applyPlanIncremental(spark: SparkSession, root: String,
                           maxFilesPerBucket: Int = 1,
                           beforeCommit: () => Unit = () => ()): DataFrame = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    import org.apache.hadoop.fs.Path
    import graft.sources.VersionedParquetStore
    val expected = VersionedParquetStore.currentVersion(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no snapshot to compact under $root"))
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapDir = f.makeQualified(new Path(root, expected))
    // the snapshot's partition dirs: its own bucket= dirs plus any it
    // already carries by reference (repeated incremental compactions
    // flatten — a dir cold across N snapshots is referenced by each,
    // rewritten by none)
    val ownDirs = f.listStatus(snapDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(s => f.makeQualified(s.getPath))
    val refDirs = VersionedParquetStore
      .manifestRefs(spark, root, expected)
      .map(r => f.makeQualified(new Path(r)))
    val fileCount = (d: Path) =>
      f.listStatus(d).count(s => !s.getPath.getName.startsWith("_"))
    // group by bucket VALUE (dir name): an append-path store
    // (appendPartitioned) fragments a bucket ACROSS snapshots — one
    // `bucket=X` dir per contributing snapshot — so the fragmentation
    // decision must count the bucket's files over all its dirs, and a
    // rewrite must fold all of them
    val byBucket = (ownDirs ++ refDirs).distinct.groupBy(_.getName)
    val (fragB, coldB) = byBucket.toSeq.partition {
      case (_, dirs) => dirs.map(fileCount).sum > maxFilesPerBucket
    }
    val frag = fragB.flatMap(_._2)
    val cold = coldB.flatMap(_._2)
    if (frag.isEmpty)
      return VersionedParquetStore.readSnapshot(spark, root, expected)
    // read ONLY the fragmented dirs — one read per parent snapshot dir
    // (basePath recovers the bucket partition column). mergeSchema +
    // allowMissingColumns mirror readSnapshot: a bucket fragmented
    // across a pre-evolution and a post-evolution snapshot (the
    // x19+w34 lifecycle composition) must fold, not throw — older
    // rows null-pad the appended columns exactly as a read would.
    val fragRows = frag.groupBy(_.getParent.toString).toSeq.sortBy(_._1)
      .map { case (parent, dirs) =>
        spark.read.option("basePath", parent)
          .option("mergeSchema", "true")
          .parquet(dirs.map(_.toString).sorted: _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    VersionedParquetStore.commitSnapshot(spark, root, Some(expected),
      path => {
        // explicit partition count for the same reason as applyPlan's
        // write: keep AQE from serializing the per-bucket writers
        writeParted(spark, fragRows)
          .write.mode("errorifexists").partitionBy("bucket").parquet(path)
        // manifest lands after the data, still before the pointer
        // swap — a crash anywhere in between leaves a dir the pointer
        // never references
        VersionedParquetStore.writeManifest(spark, path,
          cold.map(_.toString).sorted)
      },
      beforeCommit)
  }
}
