"""End-to-end deployment-shape smoke: the REAL `spark-submit --py-files`
invocation the north rule specifies, not an in-process import.

Builds dist/feasts_spark.zip with tools/package.sh, launches
jobs/rollup_job.py in a fresh JVM via spark-submit, and checks the
written tier tables from outside Spark (DuckDB over the parquet files)
— so the test proves the packaged zip alone carries every runtime
dependency of the job.
"""

import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    from feasts_spark.sources.transcripts import synthesize_transcripts

    p = str(tmp_path_factory.mktemp("submit") / "transcripts")
    # small span (few day-partitions -> few rescans) and one part file:
    # the shared host's single virtio disk stalls for minutes under
    # contention, and parquet's vectored-IO future hard-fails at 300s
    synthesize_transcripts(
        spark, n_convs=150, max_turns=200, seed=11, span_days=3,
        n_forced_long=1, forced_long_turns=400,
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_spark_submit_py_files_job(transcripts_path, tmp_path):
    subprocess.run(
        ["bash", "tools/package.sh"], cwd=REPO, check=True,
        capture_output=True,
    )
    out_dir = str(tmp_path / "warehouse")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            # contended virtio disk: plain positional reads degrade
            # gracefully where the vectored-IO future times out at 300s
            "--conf", "spark.hadoop.parquet.hadoop.vectored.io.enabled=false",
            "--py-files", os.path.join(REPO, "dist/feasts_spark.zip"),
            os.path.join(REPO, "jobs/rollup_job.py"),
            "--input", transcripts_path,
            "--output", out_dir,
            "--tiers", "1m,1h",
        ],
        # generous: a fresh JVM on this shared host can take minutes under
        # cross-tenant contention (the solo run finishes in ~2)
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # manifest metrics are the job's stdout contract (one JSON line)
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["processed"] >= 1 and metrics["skipped"] == 0
    assert metrics["processed"] == metrics["total"]

    con = duckdb.connect()
    n_1m = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/rollup_1m/*/*.parquet')"
    ).fetchone()[0]
    n_1h = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/rollup_1h/*/*.parquet')"
    ).fetchone()[0]
    n_chunks = con.execute(
        f"SELECT count(*) FROM read_parquet('{out_dir}/chunks_1m/*/*.parquet')"
    ).fetchone()[0]
    assert n_1m > n_1h > 0 and n_chunks > 0
    # the cascade invariant holds across the job boundary: every 1h point
    # count equals the sum of its 1m children
    bad = con.execute(f"""
        WITH m AS (
          SELECT series_key, date_trunc('hour', bucket_ts) AS b,
                 sum(n_points) AS np
          FROM read_parquet('{out_dir}/rollup_1m/*/*.parquet') GROUP BY 1, 2
        ), h AS (
          SELECT series_key, bucket_ts AS b, n_points
          FROM read_parquet('{out_dir}/rollup_1h/*/*.parquet')
        )
        SELECT count(*) FROM m JOIN h USING (series_key, b)
        WHERE m.np != h.n_points
    """).fetchone()[0]
    assert bad == 0


def test_spark_submit_cagg_job(transcripts_path, tmp_path):
    """The continuous-aggregate tick at the REAL deployment shape: a fresh
    JVM, the packaged zip as the only code dependency, snapshot tables
    verified from outside Spark (manifest JSON + DuckDB over exactly the
    manifest's file list). Two invocations prove tick idempotence across
    process boundaries: the re-run must skip the ingest and no-op every
    refresh."""
    subprocess.run(
        ["bash", "tools/package.sh"], cwd=REPO, check=True,
        capture_output=True,
    )
    root = str(tmp_path / "wh")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.hadoop.parquet.hadoop.vectored.io.enabled=false",
        "--py-files", os.path.join(REPO, "dist/feasts_spark.zip"),
        os.path.join(REPO, "jobs/cagg_job.py"),
        "--table-root", root,
        "--ingest", transcripts_path, "--ingest-id", "t1",
        "--tiers", "1m,1h",
    ]
    p1 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                        text=True, timeout=900)
    assert p1.returncode == 0, p1.stderr[-3000:]
    m1 = json.loads(p1.stdout.strip().splitlines()[-1])
    assert not m1["steps"]["ingest"]["skipped"]
    assert m1["steps"]["tier_1m"]["mode"] == "full"
    assert m1["steps"]["tier_1h"]["refreshed_from"] == "tier_1m"

    # verify the 1h tier from OUTSIDE Spark via its own manifest
    import glob as _glob
    mans = sorted(_glob.glob(f"{root}/tier_1h/metadata/v*.json"))
    assert mans
    with open(mans[-1]) as f:
        manifest = json.load(f)
    files = [os.path.join(root, "tier_1h", e["path"])
             for e in manifest["files"]]
    con = duckdb.connect()
    n_1h = con.execute(
        "SELECT count(*), count(DISTINCT series_key) FROM read_parquet($f)",
        {"f": files},
    ).fetchone()
    assert n_1h[0] > 0 and n_1h[1] > 1

    # tick 2, same ingest id: fully idempotent from a fresh process
    p2 = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                        text=True, timeout=900)
    assert p2.returncode == 0, p2.stderr[-3000:]
    m2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert m2["steps"]["ingest"]["skipped"]
    assert m2["steps"]["tier_1m"]["mode"] == "noop"
    assert m2["steps"]["tier_1h"]["mode"] == "noop"
