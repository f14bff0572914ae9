#!/usr/bin/env python3
"""Measured head-to-head throughput: the REFERENCE MapReduce cluster vs
the Spark rebuild, same input, same streaming executables, same job
(word count, the reference's default workload).

The reference publishes no performance numbers (BASELINE.md), but it is
RUNNABLE: this script boots the reference's own manager + N workers from
the read-only snapshot (PYTHONPATH, the bin/mapreduce topology), stages
identical text input for both systems, submits the job over the real
wire protocol, times submission -> all part files durable, and then
times the rebuild's graft.mr.Submit on the same input/executables
in-JVM (graft.Debug mrtime — both measurements exclude process boot:
the reference cluster is pre-started, the JVM times inside main).
Outputs are also compared for equality (sorted global word counts).

Usage: python3 tools/ref_throughput.py [replication] [workers]
  replication: how many copies of the sf0.1 document text to stage
               (default 8 -> ~12 MB across 8*8 files)
  workers:     reference worker count (default 2 = the bin/mapreduce
               topology; the manager dispatches one task per ready
               worker, so this is its parallelism)
"""
import json
import os
import shutil
import socket
import subprocess
import sys
import time
from pathlib import Path

import duckdb

REF = "/root/reference/map_reduce"
REPO = "/root/repo"
SCRATCH = Path(os.environ.get("GRAFT_THROUGHPUT_DIR",
                              "/dev/shm/graft-tmp/refbench"))


def stage_execs() -> tuple:
    """Executable copies of the wc scripts (the checked-in resources are
    not +x; the reference worker execs them directly)."""
    d = SCRATCH / "exec"
    d.mkdir(parents=True, exist_ok=True)
    out = []
    for name in ("wc_map.sh", "wc_reduce.sh"):
        dst = d / name
        shutil.copyfile(f"{REPO}/src/test/resources/mr/exec/{name}", dst)
        dst.chmod(0o755)
        out.append(str(dst))
    return tuple(out)


def stage_input(replication: int) -> Path:
    d = SCRATCH / f"input-x{replication}"
    if d.exists():
        return d
    d.mkdir(parents=True)
    rows = duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    n_files = 8
    per = (len(rows) + n_files - 1) // n_files
    for rep in range(replication):
        for i in range(n_files):
            chunk = rows[i * per:(i + 1) * per]
            with open(d / f"file{rep:02d}{i:02d}", "w") as f:
                for (t,) in chunk:
                    f.write(t + "\n")
    return d


def send(port: int, payload: dict) -> None:
    with socket.socket() as s:
        s.connect(("localhost", port))
        s.sendall(json.dumps(payload).encode())


def wait_parts(outdir: Path, n: int, timeout: float) -> float:
    """Return seconds until n part files exist with stable sizes."""
    t0 = time.time()
    stable_since, last = None, None
    while time.time() - t0 < timeout:
        parts = sorted(outdir.glob("part-*"))
        sizes = [p.stat().st_size for p in parts]
        if len(parts) == n and sizes == last and stable_since is not None \
                and time.time() - stable_since > 1.0:
            return time.time() - t0
        if sizes != last:
            last, stable_since = sizes, time.time()
        time.sleep(0.1)
    raise TimeoutError(f"{outdir}: {len(list(outdir.glob('part-*')))}/{n} "
                       f"parts after {timeout}s")


def run_reference(indir: Path, workers: int, nm: int, nr: int,
                  mapper: str, reducer: str) -> float:
    env = dict(os.environ, PYTHONPATH=REF)
    logdir = SCRATCH / "logs"
    logdir.mkdir(parents=True, exist_ok=True)
    port = 6600
    procs = []

    def spawn(mod, *args):
        lf = open(logdir / f"{mod.split('.')[-1]}-{args[1]}.log", "w")
        p = subprocess.Popen(
            [sys.executable, "-m", mod, *args],
            env=env, stdout=lf, stderr=subprocess.STDOUT, cwd=str(SCRATCH))
        procs.append(p)

    try:
        spawn("mapreduce.manager", "--port", str(port))
        time.sleep(2)  # bin/mapreduce's startup grace
        for w in range(workers):
            spawn("mapreduce.worker", "--port", str(port + 1 + w),
                  "--manager-port", str(port))
        time.sleep(2 + workers * 0.3)  # registration + heartbeat start
        out = SCRATCH / "refout"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        send(port, {
            "message_type": "new_manager_job",
            "input_directory": str(indir),
            "output_directory": str(out),
            "mapper_executable": mapper,
            "reducer_executable": reducer,
            "num_mappers": nm,
            "num_reducers": nr,
        })
        wait_parts(out, nr, timeout=600)
        took = time.time() - t0
        send(port, {"message_type": "shutdown"})
        time.sleep(2)
        return took
    finally:
        for p in procs:
            p.poll() is None and p.kill()


def run_rebuild(indir: Path, nm: int, nr: int, mapper: str, reducer: str,
                runs: int = 3) -> list:
    out = SCRATCH / "graftout"
    res = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Debug mrtime {indir} {out} "
         f"{mapper} {reducer} {nm} {nr} {runs}"],
        cwd=REPO, capture_output=True, text=True,
        env=dict(os.environ, SPARK_GRAFT_CPUS="32"))
    times = [float(l.split(":")[1].rstrip("s"))
             for l in res.stdout.splitlines() if "[mrtime] run" in l]
    if not times:
        print(res.stdout[-3000:], res.stderr[-2000:])
        raise RuntimeError("no mrtime output")
    return times


def global_counts(outdir: Path) -> dict:
    c = {}
    for p in sorted(outdir.glob("part-*")):
        for line in open(p):
            if line.strip():
                w, n = line.rstrip("\n").split("\t")
                c[w] = c.get(w, 0) + int(n)
    return c


def main():
    replication = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nm, nr = 2 * workers, workers  # scale tasks with the worker pool
    indir = stage_input(replication)
    total_bytes = sum(p.stat().st_size for p in indir.iterdir())
    print(f"input: {indir} ({total_bytes/1e6:.1f} MB, "
          f"{len(list(indir.iterdir()))} files); reference: {workers} "
          f"workers, {nm} mappers / {nr} reducers")
    mapper, reducer = stage_execs()
    ref_s = run_reference(indir, workers, nm, nr, mapper, reducer)
    print(f"reference cluster: {ref_s:.2f}s "
          f"({total_bytes/1e6/ref_s:.2f} MB/s)")
    ours = run_rebuild(indir, nm, nr, mapper, reducer)
    best = min(ours)
    print(f"rebuild (graft.mr.Submit, in-JVM): runs {ours} -> warm best "
          f"{best:.2f}s ({total_bytes/1e6/best:.2f} MB/s)")
    # output equality: the global word counts must be identical
    ref_counts = global_counts(SCRATCH / "refout")
    graft_counts = global_counts(SCRATCH / "graftout-1")
    assert ref_counts == graft_counts, (
        f"outputs differ: ref {len(ref_counts)} words, "
        f"rebuild {len(graft_counts)} words")
    print(f"outputs IDENTICAL ({len(ref_counts)} distinct words); "
          f"speedup {ref_s/best:.1f}x")


if __name__ == "__main__":
    main()
