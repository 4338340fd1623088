"""Per-worker runtime tuning.

Ray caps BLAS/OpenMP threads in workers (OMP_NUM_THREADS=1) but pyarrow
sizes its OWN compute/IO thread pools to os.cpu_count().  With one
map_batches task per CPU that means cpu_count^2 runnable threads per
node; measured on this box, 32 concurrent parse tasks collapse from
445k rows/s aggregate to 152k purely from that thrash.  Calling
``tune_worker_threads()`` once per worker process (cheap, idempotent)
from every hot UDF pins Arrow to one compute thread per task, which is
the right setting whenever task parallelism itself saturates the node.
"""

from __future__ import annotations

import pyarrow as pa

_TUNED = False


def tune_worker_threads(io_threads: int = 2) -> None:
    global _TUNED
    if _TUNED:
        return
    pa.set_cpu_count(1)
    pa.set_io_thread_count(io_threads)
    _TUNED = True


def heavy_task_cpus(knee: int = 20) -> float:
    """CPU request for memory-bandwidth-bound vectorized stages.

    Measured on this node class, aggregate parse throughput peaks near
    ~20 concurrent tasks and degrades beyond it (cache/bandwidth
    contention plus raylet/driver starvation at full subscription), so
    heavy stages request ``ncpu/knee`` CPUs each: concurrency caps at
    the knee while light stages keep using every slot.  On a multi-node
    cluster the same request simply reserves proportional headroom per
    node.  Returns 1.0 on small clusters (no cap needed).
    """
    import os

    import ray

    knee = int(os.environ.get("GRAFT_HEAVY_KNEE", knee))
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return 1.0
    if ncpu <= knee:
        return 1.0
    return round(ncpu / knee, 2)
