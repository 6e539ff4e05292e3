"""Two real OS processes race appends into one snapshot table: the
O_EXCL manifest create linearizes them — every commit lands exactly once,
versions are dense, and no rows are lost or duplicated. This is the
multi-writer claim tested across process boundaries, not threads."""

import json
import os
import subprocess
import sys
import textwrap

WRITER = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, "/root/repo")
    from feasts_spark.session import get_spark
    from feasts_spark.sources.snapshots import SnapshotTable
    from pyspark.sql import functions as F

    root, tag, n_commits = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark(2, app_name=f"writer_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    t = SnapshotTable(spark, root, "t", stats_cols=("k",))
    offset = 1_000_000 if tag == "b" else 0
    versions = []
    for i in range(n_commits):
        df = spark.range(offset + i * 100, offset + (i + 1) * 100).select(
            F.col("id").alias("k"), F.lit(tag).alias("writer"))
        versions.append(t.retrying(t.append, df,
                                   extra_summary={"writer": tag, "i": i}))
    print("RESULT:" + json.dumps(versions))
""")


def test_two_process_writers_linearize(spark, tmp_path):
    root = str(tmp_path)
    n_commits = 4
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WRITER, root, tag, str(n_commits)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env, cwd="/root/repo",
        )
        for tag in ("a", "b")
    ]
    results = {}
    for tag, p in zip(("a", "b"), procs):
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, f"writer {tag} failed"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT:")][-1]
        results[tag] = json.loads(line[len("RESULT:"):])

    from feasts_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, root, "t", stats_cols=("k",))
    # every commit landed at a UNIQUE version and the log is dense
    all_versions = sorted(results["a"] + results["b"])
    assert all_versions == list(range(1, 2 * n_commits + 1))
    # no rows lost, none duplicated, both writers fully present
    df = t.read()
    assert df.count() == 2 * n_commits * 100
    assert df.select("k").distinct().count() == 2 * n_commits * 100
    per_writer = {r["writer"]: r["n"] for r in
                  df.groupBy("writer").count().withColumnRenamed(
                      "count", "n").collect()}
    assert per_writer == {"a": n_commits * 100, "b": n_commits * 100}
    # the manifest log records both writers' idempotence summaries
    summaries = [h["summary"].get("writer") for h in t.history()]
    assert summaries.count("a") == n_commits
    assert summaries.count("b") == n_commits
