"""Per-partition checkpoint/resume with lineage + metrics (north rule).

The resume unit is an INPUT SHARD (one parquet/lance file of the documents
table — write_corpus lays these out). Each shard is processed as its own
streaming pipeline and committed atomically:

    out_dir/part=<shard>/....parquet     (written to a tmp dir, then rename)
    out_dir/_manifest/<shard>.json       (tmp + rename after the data rename)

The manifest row is the lineage + metrics record: input path + content
fingerprint, row counts in/out, error-row count, wall seconds, docs/sec.
On restart, shards whose manifest exists AND whose input fingerprint still
matches are skipped — a killed job resumes from the last committed partition.
Writing data before manifest makes the commit idempotent: a crash between the
two renames re-runs the shard and re-renames over the same target.

Reference contrast: the reference has NO checkpointing — a crashed request is
lost (Mongo log written only at request end, app/routers/analysis.py:569).
The manifest also subsumes the reference's audit-log record
(request_id/user_id/counters/processing_time, analysis.py:558-567).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import pyarrow.parquet as pq

from . import pipeline as P
from ..common import reap_stale_staging
from .io import MediaStore


def _fingerprint(path: str) -> str:
    """Content fingerprint: size + streaming crc32 of the WHOLE file.

    A head-only crc (first 1 MiB, the previous form) is blind to edits past
    the first MiB of an equal-size shard — a resumed run would silently
    serve stale results. Shards are a few MB, so the full pass costs ~ms;
    at 100 TB the shard files are still individually bounded (the corpus
    writer targets fixed shard sizes), so this stays O(shard), not O(job).
    """
    size = os.path.getsize(path)
    crc = 0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            crc = zlib.crc32(chunk, crc)
    return f"{size}-{crc:08x}"


def _manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{part_id}.json")


def load_manifest(out_dir: str, part_id: str):
    try:
        with open(_manifest_path(out_dir, part_id)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def list_committed(out_dir: str) -> list:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return []
    return sorted(p[:-5] for p in os.listdir(mdir) if p.endswith(".json"))


def run_checkpointed(
    docs_dir: str,
    store: MediaStore,
    out_dir: str,
    *,
    analyzed: bool = False,
    query=None,
    ocr_concurrency=None,
    batch_size=256,
    max_parts: int | None = None,
):
    """Process every input shard not yet committed; return run summary.

    ``max_parts`` limits how many UNCOMMITTED shards to process this call
    (used by the kill-and-resume test to simulate a mid-job crash).
    """
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    shards = sorted(
        f for f in os.listdir(docs_dir) if f.endswith((".parquet", ".lance"))
    )
    summary = {"processed": [], "skipped": [], "total_docs": 0, "total_errors": 0}
    done = 0
    media_id = store.identity() if hasattr(store, "identity") else None
    for shard in shards:
        part_id = os.path.splitext(shard)[0]
        in_path = os.path.join(docs_dir, shard)
        fp = _fingerprint(in_path)
        m = load_manifest(out_dir, part_id)
        # skip only when input AND media AND job params match — a committed
        # shard from a different query/analyzed mode or regenerated media
        # sidecar must be re-run, not silently mixed in
        if (
            m is not None
            and m.get("input_fingerprint") == fp
            and m.get("media_id") == media_id
            and m.get("analyzed") == analyzed
            and m.get("query") == query
        ):
            summary["skipped"].append(part_id)
            continue
        if max_parts is not None and done >= max_parts:
            continue
        t0 = time.monotonic()
        ds = rd.read_parquet(in_path)
        # row count from parquet footer metadata — not a Dataset execution
        rows_in = pq.ParquetFile(in_path).metadata.num_rows
        out = P.extraction_pipeline(
            ds, store, analyzed=analyzed, query=query,
            ocr_concurrency=ocr_concurrency, batch_size=batch_size,
        )
        final_dir = os.path.join(out_dir, f"part={part_id}")
        # PER-PROCESS staging dir: two drivers sharing an out_dir (bench +
        # pytest on the same sf_dir) must never rmtree each other's live
        # staging mid-write; the commit remains the atomic os.replace below
        tmp_dir = f"{final_dir}.__tmp__{os.getpid()}"
        reap_stale_staging(final_dir)  # dead-pid leftovers from crashed runs
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        out.write_parquet(tmp_dir)
        # derive output metrics from the written files (no re-execution)
        rows_out = 0
        n_errors = 0
        error_samples = []
        for f in os.listdir(tmp_dir):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(tmp_dir, f), columns=["doc_id", "error"])
            rows_out += t.num_rows
            n_errors += t.num_rows - t.column("error").null_count
            if len(error_samples) < 5:
                import pyarrow.compute as _pc

                errs = t.filter(_pc.is_valid(t.column("error")))
                for r in errs.slice(0, 5 - len(error_samples)).to_pylist():
                    error_samples.append(
                        {"doc_id": r["doc_id"], "error": r["error"][:120]}
                    )
        if os.path.isdir(final_dir):
            import shutil

            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)
        wall = time.monotonic() - t0
        manifest = {
            "part_id": part_id,
            "input_path": in_path,
            "input_fingerprint": fp,
            "media_id": media_id,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "n_errors": n_errors,
            "error_samples": error_samples,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(rows_out / wall, 2) if wall > 0 else None,
            "analyzed": analyzed,
            "query": query,
        }
        mp = _manifest_path(out_dir, part_id)
        with open(mp + ".__tmp__", "w") as f:
            json.dump(manifest, f)
        os.replace(mp + ".__tmp__", mp)
        summary["processed"].append(part_id)
        summary["total_docs"] += rows_out
        summary["total_errors"] += n_errors
        done += 1
    return summary


def read_output(out_dir: str):
    """Dataset over all committed partitions (skips tmp dirs / manifest)."""
    import ray.data as rd

    files = sorted(
        os.path.join(out_dir, d, f)
        for d in os.listdir(out_dir)
        if d.startswith("part=") and ".__tmp__" not in d
        for f in os.listdir(os.path.join(out_dir, d))
        if f.endswith(".parquet")
    )
    return rd.read_parquet(files)
