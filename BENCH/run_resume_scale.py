"""Resume x curation-CLI interplay at moderate scale (round-4 VERDICT
item 5): one jobs/curate.py run over ~100k synthetic documents with a
mid-run SIGKILL between stages, then a resume — asserting

  1. stage-fingerprint REUSE on resume (the _PARAMS.json files of
     stages completed before the kill are byte- and mtime-untouched by
     the resumed run), and
  2. the resumed run's final output is BYTE-IDENTICAL to an
     uninterrupted control run of the same flags (catches any
     stage-boundary nondeterminism the 500-doc tests can't).

    python BENCH/run_scaling.py            # (scaling — separate file)
    python BENCH/run_resume_scale.py [--docs 100000] [--cores 8]

Prints one JSON line with the numbers; exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLI = [sys.executable, "-m", "pdf_parser_spark.jobs.curate"]
FLAGS = ["--rates", "en=50,fr=25,de=10", "--default-pct", "5",
         "--threshold", "0.2"]


def gen_corpus(path: str, n_docs: int, cores: int) -> None:
    """Deterministic ~100k-doc documents table, all in Spark
    expressions (no driver loop): seeded word picks via md5 mixing,
    ~8% exact duplicates and near-dup shingle overlap so the minhash /
    cluster stages do real work, plus short/repetitive rows for the
    quality stage."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.session import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    spark = get_spark(app_name="resume-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    words = ("supplier buyer delivery payment notice term party service "
             "goods invoice quantity quality warranty liability claim "
             "period law contract schedule amendment clause obligation "
             "breach remedy interest confidential data material work "
             "price tax risk title transfer").split()
    warr = F.array(*[F.lit(w) for w in words])
    # base id: dups (id % 13 == 7) copy the text of id-1 -> exact pairs;
    # near-dups (id % 17 == 3) share the prefix of id-1 with a new tail
    base = (
        F.when((F.col("id") % 13 == 7) & (F.col("id") > 0),
               F.col("id") - 1)
        .when((F.col("id") % 17 == 3) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
    )
    tail_src = F.col("id")  # near-dups get their OWN tail

    def pick(seed_col, j):
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", seed_col.cast("string"),
                                          F.lit(str(j)))), 1, 15),
            16, 10,
        ).cast("long")
        return F.element_at(warr, (F.pmod(h, F.lit(len(words)))
                                   + 1).cast("int"))

    # 24 picks: each is an md5+conv subtree, and ~40 of them in ONE
    # projection tree blows Janino's 64KB method ceiling (CLAUDE.md)
    body = F.concat_ws(" ", *[pick(base, j) for j in range(24)])
    tail = F.concat_ws(" ", *[pick(tail_src, 100 + j) for j in range(8)])
    text = (
        F.when(F.col("id") % 97 == 11, F.lit("tiny doc"))  # too_few
        .when(F.col("id") % 97 == 23,
              F.concat_ws(" ", *[F.lit("spam")] * 60))      # repetitive
        .when((F.col("id") % 17 == 3) & (F.col("id") % 13 != 7),
              F.concat_ws(" ", body, tail))                  # near-dup
        .otherwise(body)
    )
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("es"), F.lit("de"),
                    F.lit("zh")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"),
    )
    df = df.withColumn("n_chars", F.length("text"))
    df.repartition(max(cores * 2, 8)).write.mode("overwrite").parquet(path)
    spark.stop()


def run_cli(inp: str, out: str, run_id: str, cores: int,
            kill_after_stages: int | None = None):
    """Run the curate CLI as a subprocess. With kill_after_stages=N,
    SIGKILL the process as soon as N stage _SUCCESS markers exist
    (a mid-run crash BETWEEN stages) and return (None, wall)."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    t0 = time.monotonic()
    p = subprocess.Popen(
        CLI + ["--input", inp, "--output", out, "--run-id", run_id]
        + FLAGS,
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    if kill_after_stages is None:
        out_text, _ = p.communicate(timeout=1800)
        return out_text, time.monotonic() - t0
    while p.poll() is None:
        done = glob.glob(os.path.join(out, "stages", "*", "_SUCCESS"))
        if len(done) >= kill_after_stages:
            p.send_signal(signal.SIGKILL)
            p.wait()
            return None, time.monotonic() - t0
        time.sleep(0.25)
    raise RuntimeError(
        f"CLI finished (rc={p.returncode}) before {kill_after_stages} "
        "stages completed — corpus too small for a mid-run kill"
    )


def params_snapshot(out: str) -> dict[str, tuple[float, str]]:
    snap = {}
    for f in glob.glob(os.path.join(out, "stages", "*", "_PARAMS.json")):
        stage = os.path.basename(os.path.dirname(f))
        with open(f) as fh:
            snap[stage] = (os.path.getmtime(f), fh.read())
    return snap


def table_hash(path: str) -> tuple[int, str]:
    import duckdb

    n, h = duckdb.sql(
        "SELECT count(*), md5(string_agg(r, '|' ORDER BY r)) FROM ("
        "  SELECT concat_ws(',', doc_id, lang, length(clean_text),"
        "                   md5(clean_text)) AS r"
        f"  FROM parquet_scan('{path}/stages/curated/*.parquet'))"
    ).fetchone()
    return n, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--root", default="/tmp/pps_resume_scale")
    ap.add_argument("--kill-after-stages", type=int, default=3)
    args = ap.parse_args()

    shutil.rmtree(args.root, ignore_errors=True)
    inp = os.path.join(args.root, "docs")
    out_a = os.path.join(args.root, "outA")  # uninterrupted control
    out_b = os.path.join(args.root, "outB")  # killed mid-run + resumed

    gen_corpus(inp, args.docs, args.cores)

    _, wall_a = run_cli(inp, out_a, "ctrl", args.cores)
    _, wall_kill = run_cli(inp, out_b, "crash", args.cores,
                           kill_after_stages=args.kill_after_stages)
    pre = params_snapshot(out_b)
    line_b, wall_resume = run_cli(inp, out_b, "resume", args.cores)
    post = params_snapshot(out_b)

    # 1. every stage completed before the kill was REUSED on resume:
    #    its _PARAMS.json (mtime + bytes) is untouched
    reused = [s for s in pre if post.get(s) == pre[s]]
    not_reused = [s for s in pre if post.get(s) != pre[s]]

    # 2. resumed output byte-identical to the uninterrupted control
    n_a, h_a = table_hash(out_a)
    n_b, h_b = table_hash(out_b)

    result = {
        "docs": args.docs,
        "cores": args.cores,
        "wall_uninterrupted_sec": round(wall_a, 1),
        "wall_until_kill_sec": round(wall_kill, 1),
        "wall_resume_sec": round(wall_resume, 1),
        "stages_done_at_kill": len(pre),
        "stages_reused_on_resume": sorted(reused),
        "stages_recomputed": sorted(not_reused),
        "curated_rows": n_a,
        "output_identical": (n_a, h_a) == (n_b, h_b),
        "resume_speedup_vs_full": round(wall_a / max(wall_resume, 1e-9), 2),
        "cli_line": (line_b or "").strip().splitlines()[-1:],
    }
    print(json.dumps(result))
    ok = result["output_identical"] and not not_reused and reused
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
