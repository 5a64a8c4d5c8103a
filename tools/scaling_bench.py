"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N
executors). No real cluster in the sandbox, so the same index-build
job runs at two parallelism levels — local[8] vs local[32] — on the
same input; efficiency = (rate_32 / rate_8) / 4.

Each level runs in a fresh subprocess (one JVM per master setting).
Writes BENCH/scaling.json and prints a summary line.

Usage:
    python tools/scaling_bench.py prep [n_docs]   # build the corpus once
    python tools/scaling_bench.py run 8           # one parallelism level
    python tools/scaling_bench.py run 32
    python tools/scaling_bench.py report          # efficiency + BENCH/scaling.json
(or `all [n_docs]` to do everything in one long process)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

WORKDIR = os.environ.get("SCALING_WORKDIR", "/tmp/xml_to_es_scaling")

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from xml_to_es_spark.session import get_spark
from xml_to_es_spark import fixtures
from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import IndexBuilder

cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); pages_path = sys.argv[3]
spark = get_spark(app=f"scale{cores}", cores=cores, shuffle_partitions=cores)
docs = spark.read.parquet(pages_path)
t0 = time.time()
out = tempfile.mkdtemp(prefix=f"scale_{cores}_") + "/idx"
cfg = IndexConfig(n_groups=2, salt_threshold=5000, n_salts=8)
IndexBuilder(spark, cfg).build(docs, out)
wall = time.time() - t0
print(json.dumps({"cores": cores, "wall_s": round(wall, 2),
                  "docs_per_sec": round(n_docs / wall, 1)}))
spark.stop()
"""

PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
from xml_to_es_spark.session import get_spark
from xml_to_es_spark import fixtures
from xml_to_es_spark.functions.extract import extract_fields
n_docs = int(sys.argv[1]); out = sys.argv[2]
spark = get_spark(app="prep", cores=16)
import pandas as pd
# generate in chunks to bound driver memory
chunks = []
step = 20000
for lo in range(0, n_docs, step):
    pdf = fixtures.generate_pages(min(step, n_docs - lo), seed=42 + lo)
    pdf["url"] = pdf["url"].str.replace("example-", f"example-{lo}-")
    chunks.append(spark.createDataFrame(pdf))
pages = chunks[0]
for c in chunks[1:]:
    pages = pages.unionByName(c)
docs = extract_fields(pages).selectExpr(
    "xxhash64(url) as doc_id", "text")
docs.write.mode("overwrite").parquet(out)
print("prep-done")
spark.stop()
"""


def run_py(code: str, *args: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0 or not r.stdout.strip():
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"child failed: {args}")
    return r.stdout.strip().splitlines()[-1]


def _paths():
    os.makedirs(WORKDIR, exist_ok=True)
    return f"{WORKDIR}/docs", f"{WORKDIR}/meta.json"


def do_prep(n_docs: int):
    pages_path, meta = _paths()
    print(f"preparing {n_docs} docs → {pages_path}", file=sys.stderr)
    run_py(PREP, str(n_docs), pages_path)
    with open(meta, "w") as f:
        json.dump({"n_docs": n_docs}, f)
    print(json.dumps({"prep": n_docs}))


def do_run(cores: int):
    pages_path, meta = _paths()
    n_docs = json.load(open(meta))["n_docs"]
    res = json.loads(run_py(CHILD, str(cores), str(n_docs), pages_path))
    with open(f"{WORKDIR}/run{cores}.json", "w") as f:
        json.dump(res, f)
    print(json.dumps(res))


def do_report():
    _, meta = _paths()
    n_docs = json.load(open(meta))["n_docs"]
    r8 = json.load(open(f"{WORKDIR}/run8.json"))
    r32 = json.load(open(f"{WORKDIR}/run32.json"))
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    out = {
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(r32["docs_per_sec"] / r8["docs_per_sec"], 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "criterion": ">= 0.8",
        "passes": eff >= 0.8,
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "prep":
        do_prep(int(sys.argv[2]) if len(sys.argv) > 2 else 60_000)
    elif cmd == "run":
        do_run(int(sys.argv[2]))
    elif cmd == "report":
        do_report()
    elif cmd == "all":
        do_prep(int(sys.argv[2]) if len(sys.argv) > 2 else 60_000)
        do_run(8)
        do_run(32)
        do_report()
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
