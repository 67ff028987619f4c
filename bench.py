"""Benchmark runner (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
in a session it owns: ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS
[default 32]). Prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., ...}

--scaling: runs the headline job twice in FRESH subprocesses at 8 and 32
CPUs on the same input and prints throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N node-cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_EXTRACT_REPEAT", "2"))

BENCH_QUERIES = [
    "extract_rank",
    "lineitem_agg",
    "dedup_exact",
    "minhash_pairs",
    "ann_cosine",
    "events_hourly",
    "quality_score",
]


def _corpus_cache_dir(sf_dir: str, repeat: int) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return f"/tmp/graft_corpus/{tag}_r{repeat}"


def prepare_corpus(sf_dir: str, repeat: int):
    """Deterministic derived interleaved corpus, cached on disk (sharded)."""
    import pyarrow.parquet as pq

    from resume_ocr_ray.core import corpus
    from resume_ocr_ray.engine import io as EIO

    cache = _corpus_cache_dir(sf_dir, repeat)
    docs_dir = os.path.join(cache, "documents")
    media_dir = os.path.join(cache, "media")
    if not (os.path.isdir(docs_dir) and os.path.isdir(media_dir)):
        src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        docs, media = corpus.corpus_from_documents(src, repeat=repeat)
        num_shards = max(8, docs.num_rows // 2048)
        EIO.write_corpus(cache, docs, media, num_shards=num_shards)
    return docs_dir, media_dir


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from resume_ocr_ray.engine import io as EIO
    from resume_ocr_ray.engine import pipeline as P
    from resume_ocr_ray.pipelines import registry

    docs_dir, media_dir = prepare_corpus(sf_dir, REPEAT)

    t_setup0 = time.monotonic()
    store = EIO.MediaStore.from_parquet(media_dir)
    setup_sec = time.monotonic() - t_setup0

    # warm the page cache + worker pool with one untimed pass
    rd.read_parquet(docs_dir).count()

    ocr_conc = max(2, int(num_cpus * 0.6))
    t0 = time.monotonic()
    ds = P.extraction_pipeline(
        rd.read_parquet(docs_dir), store,
        ocr_concurrency=ocr_conc, batch_size=256,
    )
    n_docs = ds.count()
    headline_sec = time.monotonic() - t0

    queries = {"extract_interleaved": round(headline_sec, 3)}
    qmap = registry.queries()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        res = qmap[name](sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()  # consume the lazy Dataset
        queries[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "interleaved OCR-extraction wall time (headline) + per-query sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / headline_sec, 2),
        "store_setup_sec": round(setup_sec, 3),
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same job, same input, two fresh processes at two parallelism levels."""
    prepare_corpus(sf_dir, REPEAT)  # build the cache once, outside timing

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = run(lo), run(hi)
    thr_lo, thr_hi = r_lo["docs_per_sec"], r_hi["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (docs/s at two parallelism levels)",
        "sf": sf_dir,
        "n_docs": r_hi["n_docs"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "docs_per_sec_lo": thr_lo,
        "docs_per_sec_hi": thr_hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
            BENCH_QUERIES = []
        print(json.dumps(run_bench(SF_DIR, NUM_CPUS)))
