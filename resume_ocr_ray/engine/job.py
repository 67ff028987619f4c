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


def strict_validate_request(input_dir: str, max_files: int | None = None):
    """Reference request-level file-list validation, ALL-OR-NOTHING
    (app/utils/utils.py:27-47, raised before any processing at
    app/routers/analysis.py:479-480): ANY invalid file fails the whole
    batch with the reference's HTTP status + Portuguese detail. This is
    the ``--strict-request`` opt-in; the default engine behavior stays
    per-row errors (the right call at scale, see config.py:34-48).

    Mapping onto the corpus model: a document row is a "file" (doc_id =
    filename), its media rows carry the type (media_kind stands in for
    the extension — the corpus has no extension to be missing, so the
    reference's separate no-extension 415 folds into the bad-kind 415)
    and the size. Checks in reference order: empty list (422) → count
    cap (413) → per-file name (422) / type (415) / size (413); the
    first violation wins, deterministically (docs in stored order,
    media in sorted-ref order). Uses the media_meta sidecar when present
    (no payload read); else one streaming binary_length pass.

    Returns ``None`` if valid, else ``(http_status, detail)``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from .. import config as C

    if max_files is None:
        max_files = C.MAX_FILES

    docs_dir = os.path.join(input_dir, "documents")
    doc_ids = []
    for f in sorted(os.listdir(docs_dir)):
        if f.endswith(".parquet"):
            doc_ids.extend(
                _pq.read_table(os.path.join(docs_dir, f), columns=["doc_id"])
                .column("doc_id").to_pylist()
            )
    if not doc_ids:
        return 422, "Pelo menos um arquivo deve ser enviado."
    if len(doc_ids) > max_files:
        return (413, "Payload Too Large: O número máximo de arquivos é "
                     f"{max_files}.")
    for d in doc_ids:
        if not d or not d.strip():
            return 422, "Um dos arquivos foi enviado sem nome."

    meta_path = os.path.join(input_dir, "media_meta.parquet")
    if os.path.exists(meta_path):
        meta = _pq.read_table(
            meta_path, columns=["media_ref", "media_kind", "payload_bytes"]
        )
    else:  # no sidecar: one streaming pass, payload column never held whole
        media_dir = os.path.join(input_dir, "media")
        parts = []
        for f in sorted(os.listdir(media_dir)):
            if not f.endswith(".parquet"):
                continue
            pf = _pq.ParquetFile(os.path.join(media_dir, f))
            for b in pf.iter_batches(columns=["media_ref", "media_kind",
                                              "payload"]):
                parts.append(pa.table({
                    "media_ref": b.column(0),
                    "media_kind": b.column(1),
                    "payload_bytes": pc.cast(
                        pc.binary_length(b.column(2)), pa.int64()),
                }))
        meta = (pa.concat_tables(parts) if parts else
                pa.table({"media_ref": pa.array([], pa.string()),
                          "media_kind": pa.array([], pa.string()),
                          "payload_bytes": pa.array([], pa.int64())}))
    meta = meta.sort_by("media_ref")
    bad_kind = meta.filter(
        pc.invert(pc.is_in(meta.column("media_kind"),
                           value_set=pa.array(C.ALLOWED_MEDIA_KINDS)))
    )
    if bad_kind.num_rows:
        ref = bad_kind.column("media_ref")[0].as_py()
        return (415, f"Unsupported Media Type: O formato do arquivo "
                     f"'{ref}' não é suportado. Use PDF, PNG, JPG ou JPEG.")
    too_big = meta.filter(
        pc.greater(meta.column("payload_bytes"), C.MAX_MEDIA_BYTES)
    )
    if too_big.num_rows:
        ref = too_big.column("media_ref")[0].as_py()
        mb = C.MAX_MEDIA_BYTES // (1024 * 1024)
        return 413, f"Arquivo '{ref}' é muito grande. Máximo de {mb}MB."
    return None


#: exit codes for strict-request violations, keyed by the reference's
#: HTTP status (422 shares the existing invalid-input code 2)
_STRICT_EXIT = {422: 2, 413: 4, 415: 5}


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
    p.add_argument(
        "--log-dir", default=None,
        help="run-log directory (rotating run.log + run.jsonl; default "
             "<out>/_logs — reference logging_config.py analog)",
    )
    p.add_argument(
        "--strict-request", action="store_true",
        help="reference request-level validation (utils.py:27-47): ANY "
             "invalid file fails the whole batch before processing — "
             "422→exit 2, 413→exit 4, 415→exit 5. File-count cap is "
             "--max-docs, defaulting to the reference MAX_FILES=20",
    )
    args = p.parse_args(argv)

    errors = validate_job_config(args)
    if errors:
        print(json.dumps({"status": "invalid", "errors": errors}))
        return 2

    if args.strict_request:
        violation = strict_validate_request(args.input, args.max_docs)
        if violation is not None:
            status, detail = violation
            print(json.dumps({"status": "invalid", "http_status": status,
                              "errors": [detail]}))
            return _STRICT_EXIT[status]

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

    # structured run logging (reference logging_config.py:6-53 analog):
    # rotating human-format + JSON-lines files under the run's output dir
    from .logging_config import setup_run_logging

    runlog = setup_run_logging(
        args.log_dir or os.path.join(args.out, "_logs"),
        run_id=args.request_id, console=False,
    )
    runlog.info(
        "Nova requisição - ID: %s | User: %s | Query: %s",
        args.request_id, args.user_id, "Sim" if args.query else "Não",
    )

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
    (runlog.warning if total_failure else runlog.info)(
        "Requisição %s concluída - docs: %s | erros: %s | tempo: %.2fs",
        args.request_id, total, summary["total_errors"],
        summary.get("processing_time", 0.0),
    )
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
