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

from dbpedia_spotlight_spark.session import get_spark

# AQE off for the scaling probes: adaptive re-planning adds ~0.3-0.5 s of
# driver latency per shuffle stage — a fixed cost that does not shrink with
# cores and therefore reads as false inefficiency in an N-vs-4N comparison.
# (Production at 100 TB wants AQE ON: there, stages run minutes, not
# sub-second, and skew-splitting matters more than planning latency.)
spark = get_spark(
    f"probe-{cores}",
    master=f"local[{cores}]",
    extra_conf={
        "spark.sql.adaptive.enabled": "false",
        # heap sized so the 8-core run's 4x task concurrency doesn't turn
        # into GC pressure the 2-core run never sees (fresh JVM per probe,
        # so the setting actually takes effect)
        "spark.driver.memory": "16g",
    },
)
spark.sparkContext.setLogLevel("ERROR")
# steady-state: time the job twice in one JVM (codegen/JIT warm after run 1
# — the honest regime for a long-running corpus job), report the min; this
# also halves run-to-run variance (~10% observed on this shared box).
nd, t1 = B._annotate_throughput(
    spark, B.SF_DIR, repl=repl, text_x=tx, partitions=3 * cores
)
_, t2 = B._annotate_throughput(
    spark, B.SF_DIR, repl=repl, text_x=tx, partitions=3 * cores
)
t = min(t1, t2)
# sec1/sec2 let the caller pick a policy: min for the isolated probes
# (noise suppression), sec2 for the concurrent 4x2 control (all instances
# are deep in overlapping work by their second run — taking the min there
# would reward an instance whose run happened to dodge the contention the
# control exists to create)
print(
    f"RESULT cores={cores} docs={nd} sec={t:.2f} sec1={t1:.2f} "
    f"sec2={t2:.2f} dps={nd/t:.1f}",
    flush=True,
)
spark.stop()
