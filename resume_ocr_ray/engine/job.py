"""Job entry point — what ``ray job submit`` runs on a cluster.

    python -m resume_ocr_ray.engine.job \
        --input /path/corpus --out /tmp/out [--query "..."] [--analyzed] \
        [--num-cpus 32]

Resume is implicit: re-running against the same --out skips shards whose
manifest matches (input fingerprint + media identity + job params).

Replaces the reference's HTTP request lifecycle (app/routers/analysis.py:416):
form/file validation → job-config validation here; the per-request Mongo audit
log → per-partition manifests; the 422 total-failure response → nonzero exit +
summary JSON on stdout.

This module OWNS its Ray session (guarded init) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid


def validate_job_config(args) -> list:
    """Reference M1 parity (app/utils/utils.py:11-24): request_id must be a
    v4 UUID, user_id ≤50 chars non-empty, query ≤2500 chars."""
    errors = []
    try:
        parsed = uuid.UUID(args.request_id, version=4)
        if str(parsed) != args.request_id.lower():
            errors.append("request_id is not a canonical UUIDv4")
    except Exception:
        errors.append("request_id is not a valid UUIDv4")
    if not args.user_id or len(args.user_id) > 50:
        errors.append("user_id must be 1..50 chars")
    if args.query is not None and len(args.query) > 2500:
        errors.append("query must be <= 2500 chars")
    return errors


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="corpus dir (documents/ + media/)")
    p.add_argument("--out", required=True, help="output dir (partitioned parquet)")
    p.add_argument("--query", default=None)
    p.add_argument("--analyzed", action="store_true")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    p.add_argument("--ocr-concurrency", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--request-id", default=str(uuid.uuid4()))
    p.add_argument("--user-id", default="graft")
    p.add_argument(
        "--max-docs", type=int, default=None,
        help="refuse to start if the input corpus has more documents "
             "(reference MAX_FILES request cap, app/config/constants.py:4 — "
             "pass 20 for exact reference behavior; default: unlimited)",
    )
    args = p.parse_args(argv)

    errors = validate_job_config(args)
    if errors:
        print(json.dumps({"status": "invalid", "errors": errors}))
        return 2

    # M2 file-count cap as a job-level knob (reference utils.py:27-47 /
    # constants.py:4): counted from parquet footers — no data scan
    if args.max_docs is not None:
        import pyarrow.parquet as _pq

        docs_dir = os.path.join(args.input, "documents")
        n_docs = sum(
            _pq.ParquetFile(os.path.join(docs_dir, f)).metadata.num_rows
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
        if n_docs > args.max_docs:
            from .. import config as C

            print(json.dumps({
                "status": "invalid",
                "errors": [C.ERR_MAX_FILES.format(limit=args.max_docs)
                           + f" (corpus: {n_docs})"],
            }))
            return 2

    # preflight (reference S4 health gate analog, database_service.py:21-58:
    # fail fast before any work): output path must be creatable/writable
    try:
        os.makedirs(args.out, exist_ok=True)
        probe = os.path.join(args.out, ".preflight")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        print(json.dumps({"status": "unavailable", "errors": [f"output path: {e}"]}))
        return 3

    # driver-side query validation (reference L2, analysis.py:491: invalid
    # query → 400 before processing)
    if args.query is not None:
        from ..core.llm import validate_query

        if not validate_query(args.query):
            print(json.dumps({"status": "invalid", "errors": ["query rejected by validator"]}))
            return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from . import checkpoint as CK
    from .io import ShardedParquetMediaStore

    # scale path: payloads stay in the sharded sidecar files; only the small
    # dispatch meta is broadcast (no monolithic media ray.put)
    store = ShardedParquetMediaStore.from_dir(os.path.join(args.input, "media"))
    summary = CK.run_checkpointed(
        os.path.join(args.input, "documents"),
        store,
        args.out,
        analyzed=args.analyzed or args.query is not None,
        query=args.query,
        ocr_concurrency=args.ocr_concurrency,
        batch_size=args.batch_size,
    )
    total = summary["total_docs"]
    total_failure = total > 0 and summary["total_errors"] == total
    print(
        json.dumps(
            {
                "status": "total_failure" if total_failure else "ok",
                "request_id": args.request_id,
                "user_id": args.user_id,
                **summary,
            }
        )
    )
    ray.shutdown()
    # reference parity: nothing processed successfully → error status
    # (app/routers/analysis.py:518-539, HTTP 422)
    return 1 if total_failure else 0


if __name__ == "__main__":
    sys.exit(main())
