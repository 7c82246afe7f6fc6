"""SparkSession factory tuned for the KG-construction workload.

Settings chosen for 100TB-scale behavior (AQE + skew join handling on,
Arrow batching bounded so multi-MB ``content`` rows can't blow executor
memory) while remaining correct on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _system_mem_gb() -> int | None:
    """Total system memory in GiB from /proc/meminfo (None if unreadable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) // (1024 * 1024)
    except (OSError, ValueError, IndexError):
        pass
    return None


def get_spark(
    app_name: str = "graphrag_rs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    n_threads = "".join(c for c in master if c.isdigit())
    cores = int(n_threads) if n_threads else (os.cpu_count() or 8)
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32
    # local mode runs every task in ONE JVM. Measured on this workload:
    # oversized heaps REGRESS hard (64g heap at local[32] made the Arrow
    # stages 3× slower than 8g — cold-page faults + huge G1 young gen),
    # while 8g spills on wide aggregations. 12g + modest headroom per core
    # is the sweet spot.
    default_mem = f"{min(24, max(12, cores // 2))}g"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # runtime re-planning: partition coalescing + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow-batched pandas UDFs are the only Python surface; bound batch
        # size because source-code `content` rows can be MBs each
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # ^ 256 is the SESSION-WIDE safety default (scalar pandas UDFs
        # have no bytes-per-batch bound, so the record bound is the only
        # protection for multi-MB content/binary rows). Operators whose
        # UDF inputs are id- or vector-width rows raise it per action via
        # request_arrow_batch_rows() — at 256 a 1M-row id-pair scorer
        # costs ~3,900 JVM↔Python round-trips (measured 15.7 s vs 1.4 s
        # at 64k rows/batch on this gVisor-serialized sandbox).
        # parquet scans: pushdown + pruning are defaults, keep splits sane
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", default_mem))
        .config("spark.ui.enabled", "false")
        # This sandbox (gVisor) serializes concurrent file syscalls within a
        # process: measured 44k mmap-cycles/s at 1 thread -> 1.9k/s at 32
        # threads in one process (small-file open/stat/unlink collapses the
        # same way). Spark's default local shuffle path is exactly that hot
        # pattern — the bypass-merge writer emits R files per map task and
        # concatenates them with NIO transferTo (mmap/unmap per segment),
        # which made identical jobs swing 17s↔67s. Steer off it:
        #  - sort-based writer always (1 data file per map task, not R):
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        #  - stream-copy concatenation instead of mmap/transferTo:
        .config("spark.file.transferTo", "false")
        #  - fewer, larger write syscalls:
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.shuffle.spill.diskWriteBufferSize", "1m")
        #  - the Python-worker Arrow streams cross process boundaries over
        #    sockets buffered at spark.buffer.size (default 64k). Measured
        #    on this sandbox: 64k chunks cap ~250-280 MB/s AGGREGATE for
        #    all threads of one process; 1m chunks lift that to ~2 GB/s.
        #    The content→worker→mentions stream is the pipeline's largest
        #    inter-process byte mass, and its ceiling is a serial fraction
        #    that caps N→4N scaling (measured eff 0.73 → 0.8+ with this):
        .config("spark.buffer.size", str(1 << 20))
    )
    if master.startswith("local"):
        # shuffle checksum files are one extra create/write/rename per map
        # task — a measurable cost under this sandbox's per-process syscall
        # serialization. Disabled ONLY for single-JVM local masters (no
        # network between map and reduce, so the corruption class checksums
        # guard against — bad NICs/disks between nodes — doesn't apply);
        # any non-local master keeps Spark's default (enabled).
        builder = builder.config("spark.shuffle.checksum.enabled", "false")
    builder = (
        builder
        # local mode defaults to task maxFailures=1 (any transient worker
        # death — e.g. a sandbox socket reset mid-Arrow-stream — kills the
        # whole job). Real clusters run with 4; match that.
        .config("spark.task.maxFailures", "4")
        # execution memory off-heap: at 32 task threads the on-heap
        # execution pool splits ~150 MB/task and wide aggregations churn
        # through many tiny spill-merge chunks (measured: same 7 GiB
        # logical spill costs 88 CPU-s at 8 threads but 676 CPU-s at 32).
        # A fixed off-heap pool removes the spill entirely (measured 0 B)
        # without growing the GC heap (oversized heaps regress — above).
        # Sized from detected system memory (1/8th, clamped 2..16g) so the
        # heap + off-heap sum can't overcommit smaller hosts; override with
        # SPARK_GRAFT_OFFHEAP.
        .config("spark.memory.offHeap.enabled", "true")
        .config(
            "spark.memory.offHeap.size",
            os.environ.get("SPARK_GRAFT_OFFHEAP")
            or f"{min(16, max(2, (_system_mem_gb() or 32) // 8))}g",
        )
        # On a real multi-node cluster (no gVisor, NVMe spark.local.dir)
        # the defaults are fine — these are safe there too, just unneeded.
    )
    # shuffle scratch: this sandbox's VM disk throttles under concurrent
    # shuffle writers (measured: an identical 64-partition shuffle took
    # 4× longer at local[32] than local[8] purely from disk contention;
    # tmpfs restored linear scaling). On a real cluster spark.local.dir
    # comes from the cluster config (NVMe-backed) — override with
    # SPARK_GRAFT_LOCAL_DIR or unset by exporting it empty.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # scratch dir for iterutil.cut_lineage (true plan truncation for
    # iterative kernels — checkpoint()/localCheckpoint() materialize data
    # but retain originStats plan back-references, which makes Catalyst
    # planning exponential in iteration count; see iterutil.py)
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        ckpt = os.path.join(local_dir or "/tmp", "graphrag-checkpoints")
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark


def request_arrow_batch_rows(spark, rows: int) -> None:
    """Set the Arrow rows-per-batch bound for subsequent actions.

    Scalar pandas UDFs have no bytes-per-batch bound, so the session
    default stays at a blob-safe 256 (see get_spark). Operators whose UDF
    inputs are narrow — ids, fixed-dim vectors, short strings — call this
    with a large value at DataFrame-construction time; operators shipping
    content/binary rows call it with a small one. The conf is read when
    the ACTION runs and the setting is session-global, so the contract is
    last-writer-wins: under the sequential build→collect usage of the
    correctness board, the bench, and the sweep, the last constructor
    before an action owns the setting. Concurrent mixed-width UDF jobs on
    one session should leave the conservative default alone.
    """
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(int(rows))
    )
