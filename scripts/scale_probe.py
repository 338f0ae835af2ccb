"""One scaling measurement: run the annotate job (model cached) at a given
local[k] parallelism. Wrap with `taskset -c 0-<k-1>` so the whole process
tree (JVM + python workers) is capped to exactly k cores.

Usage: taskset -c 0-7 python scripts/scale_probe.py <cores> <repl> <text_x>
Prints: RESULT cores=... docs=... sec=... dps=...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

cores = int(sys.argv[1])
repl = int(sys.argv[2]) if len(sys.argv) > 2 else 2
tx = int(sys.argv[3]) if len(sys.argv) > 3 else 4

spark = B._fresh_spark(cores)
nd, t = B._annotate_throughput(
    spark, B.SF_DIR, repl=repl, text_x=tx, partitions=3 * cores
)
print(f"RESULT cores={cores} docs={nd} sec={t:.2f} dps={nd/t:.1f}", flush=True)
spark.stop()
