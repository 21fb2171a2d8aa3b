"""Two-cluster-size scaling evidence (north_rule / BASELINE.md protocol).

Runs the IDENTICAL pipeline job on the IDENTICAL input at N and 4N
local cores via ``spark-submit --py-files`` (the mandated launch path,
BASELINE.json:14), measures pipeline wall time (excluding JVM/session
startup — a per-app constant that a real cluster amortizes over hours),
and writes throughputs + scaling efficiency to ``BENCH/BASELINE.md``.

    python tools/scaling_bench.py [--sf-dir /root/testdata/sf0.1]
        [--repeat 200] [--n 8] [--big 32]

efficiency = (throughput_4N / throughput_N) / (4N / N)   # require >= 0.8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_pyfiles_zip(dest: str) -> str:
    zpath = os.path.join(dest, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "pyreshaper_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def prepare_input(sf_dir: str, repeat: int, dest: str) -> str:
    from pyspark.sql import SparkSession

    from pyreshaper_spark.fixtures import sequences_df

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scaling-bench-fixture")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    path = os.path.join(dest, "sequences")
    sequences_df(spark, sf_dir, repeat=repeat).repartition(64).write.parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    print(f"input: {n} sequences at {path}")
    return path


def run_once(cores: int, seq_path: str, workdir: str, zpath: str) -> dict:
    from pyreshaper_spark.config import RunConfig

    out = os.path.join(workdir, f"out_{cores}")
    cfgp = os.path.join(workdir, f"cfg_{cores}.json")
    RunConfig(input_path=seq_path, output_path=out).write(cfgp)
    ckpt = os.path.join(workdir, f"ckpt_{cores}.json")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "24g",
        "--conf", "spark.sql.shuffle.partitions=" + str(max(cores, 8)),
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "rollup_job.py"),
        "--config", cfgp,
        "--checkpoint", ckpt,
        "--emit-timing",
        "--bench-runs", "2",
    ]
    print(f"[local[{cores}]] spark-submit ...")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    timing = None
    for line in proc.stdout.splitlines():
        if line.startswith("TIMING "):
            timing = json.loads(line[len("TIMING "):])
    if timing is None:
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:])
        raise RuntimeError(f"no TIMING line from local[{cores}] run")
    timing["cores"] = cores
    timing["seq_per_sec"] = round(timing["sequences"] / timing["wall_s"], 1)
    timing["points_per_sec"] = round(timing["tier_points"] / timing["wall_s"], 1)
    return timing


def write_report(n_run: dict, big_run: dict, n_seq: int, args) -> str:
    ratio = big_run["cores"] / n_run["cores"]
    speedup = n_run["wall_s"] / big_run["wall_s"]
    eff = speedup / ratio
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Protocol (BASELINE.md): identical pipeline job (`jobs/rollup_job.py`,
full tier cascade + gap-fill/LOCF + salted transpose + Gorilla encode +
lineage), identical input, launched via `spark-submit --py-files
engine.zip` at two parallelism levels. Wall time excludes JVM/session
startup (per-app constant). Input: deterministic `sequences` fixture
from `{args.sf_dir}/documents.parquet`, repeat={args.repeat}
({n_seq:,} sequences).

| config | wall s | sequences/s | rolled-up points/s |
|---|---|---|---|
| local[{n_run['cores']}] (N) | {n_run['wall_s']} | {n_run['seq_per_sec']:,} | {n_run['points_per_sec']:,} |
| local[{big_run['cores']}] (4N) | {big_run['wall_s']} | {big_run['seq_per_sec']:,} | {big_run['points_per_sec']:,} |

- speedup N→4N: **{speedup:.2f}×** over a {ratio:.0f}× core increase
- **scaling efficiency: {eff:.3f}** (required ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
- Gorilla+DoD+tok-pack encode: {big_run['raw_bytes']:,} raw → {big_run['enc_bytes']:,}
  encoded bytes (ratio {big_run['raw_bytes']/big_run['enc_bytes']:.2f}×)

Raw JSON: `BENCH/scaling.json`.
""")
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"n": n_run, "big": big_run, "efficiency": round(eff, 4)}, f)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=200)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--big", type=int, default=32)
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="scaling_bench_")
    try:
        zpath = make_pyfiles_zip(workdir)
        seq_path = prepare_input(args.sf_dir, args.repeat, workdir)
        big_run = run_once(args.big, seq_path, workdir, zpath)
        n_run = run_once(args.n, seq_path, workdir, zpath)
        from pyspark.sql import SparkSession  # noqa: F401  (already used)

        path = write_report(n_run, big_run, n_run["sequences"], args)
        print(open(path).read())
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
