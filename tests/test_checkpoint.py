"""Checkpoint/resume: kill-and-resume idempotence + lineage metrics."""

import json
import os

import pytest

from resume_ocr_ray.core import corpus, extract
from resume_ocr_ray.engine import checkpoint as CK
from resume_ocr_ray.engine import io as EIO


@pytest.fixture()
def corpus_on_disk(tmp_path):
    docs, media = corpus.generate_corpus(36, seed=21)
    docs_dir, media_dir = EIO.write_corpus(str(tmp_path / "in"), docs, media, num_shards=4)
    lookup = dict(
        zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist())
    )
    return docs, media, docs_dir, media_dir, lookup


def test_kill_and_resume(ray_session, corpus_on_disk, tmp_path):
    docs, media, docs_dir, media_dir, lookup = corpus_on_disk
    store = EIO.MediaStore.from_table(media)
    out_dir = str(tmp_path / "out")

    # "crash" after 2 of 4 partitions
    s1 = CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2, max_parts=2)
    assert len(s1["processed"]) == 2 and not s1["skipped"]
    committed = CK.list_committed(out_dir)
    assert len(committed) == 2
    mtimes = {
        p: os.path.getmtime(os.path.join(out_dir, f"part={p}")) for p in committed
    }

    # resume: committed parts skipped (not rewritten), rest processed
    s2 = CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2)
    assert sorted(s2["skipped"]) == committed
    assert len(s2["processed"]) == 2
    for p, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, f"part={p}")) == mt

    # third run: everything skipped (idempotent)
    s3 = CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2)
    assert not s3["processed"] and len(s3["skipped"]) == 4

    # final output equals the oracle over the whole corpus
    result = {r["doc_id"]: r for r in CK.read_output(out_dir).take_all()}
    expected = extract.extract_table(docs, lookup).to_pylist()
    assert len(result) == len(expected)
    for e in expected:
        a = result[e["doc_id"]]
        assert a["error"] == e["error"]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in a["spans_out"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in e["spans_out"]
        ]


def test_manifest_lineage_and_invalidation(ray_session, corpus_on_disk, tmp_path):
    docs, media, docs_dir, media_dir, lookup = corpus_on_disk
    store = EIO.MediaStore.from_table(media)
    out_dir = str(tmp_path / "out2")
    CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2)

    # manifests carry lineage + metrics
    for p in CK.list_committed(out_dir):
        m = CK.load_manifest(out_dir, p)
        assert m["input_fingerprint"] and m["rows_in"] > 0
        assert m["rows_out"] == m["rows_in"]
        assert m["wall_sec"] > 0 and m["docs_per_sec"] > 0
        assert m["input_path"].endswith(f"{p}.parquet")

    # input change invalidates exactly that partition
    shard0 = os.path.join(docs_dir, "shard-0000.parquet")
    import pyarrow.parquet as pq

    t = pq.read_table(shard0)
    pq.write_table(t.slice(0, max(1, t.num_rows - 1)), shard0)
    s = CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2)
    assert s["processed"] == ["shard-0000"]
    assert len(s["skipped"]) == 3
    m = CK.load_manifest(out_dir, "shard-0000")
    assert m["rows_in"] == t.num_rows - 1


def test_param_mismatch_invalidates_all(ray_session, corpus_on_disk, tmp_path):
    """Re-running against the same out_dir with different job params must
    re-process committed shards, not silently mix modes (round-1 ADVICE)."""
    docs, media, docs_dir, media_dir, lookup = corpus_on_disk
    store = EIO.MediaStore.from_table(media)
    out_dir = str(tmp_path / "out3")
    CK.run_checkpointed(docs_dir, store, out_dir, ocr_concurrency=2)

    s = CK.run_checkpointed(
        docs_dir, store, out_dir, ocr_concurrency=2,
        analyzed=True, query="python spark",
    )
    assert not s["skipped"] and len(s["processed"]) == 4
    # and with matching params everything skips again
    s2 = CK.run_checkpointed(
        docs_dir, store, out_dir, ocr_concurrency=2,
        analyzed=True, query="python spark",
    )
    assert not s2["processed"] and len(s2["skipped"]) == 4


def test_run_logging_setup(tmp_path):
    """Structured run logging (reference logging_config.py analog):
    rotating human-format + JSON-lines handlers, reference rotation
    policy (10MB x 5), idempotent re-setup, DEBUG to file, parseable
    JSON records carrying the run_id."""
    import json
    import logging

    from resume_ocr_ray.engine.logging_config import (
        BACKUP_COUNT, MAX_BYTES, RUN_LOGGER, setup_run_logging,
    )

    d = str(tmp_path / "_logs")
    lg = setup_run_logging(d, run_id="run-42", console=False)
    lg.debug("detalhe")          # file handlers are DEBUG-level
    lg.info("Nova requisição - ID: run-42")
    lg.warning("algo estranho")

    # idempotent: re-setup must not duplicate handlers (reference clears
    # existing handlers, logging_config.py:19-21)
    lg2 = setup_run_logging(d, run_id="run-42", console=False)
    assert lg2 is logging.getLogger(RUN_LOGGER)
    assert len(lg2.handlers) == 2

    for h in lg2.handlers:
        h.flush()
        assert h.maxBytes == MAX_BYTES and h.backupCount == BACKUP_COUNT

    human = (tmp_path / "_logs" / "run.log").read_text().splitlines()
    assert any("Nova requisição" in line for line in human)
    assert any("| DEBUG |" in line for line in human)
    assert any(" | resume_ocr_ray.run | " in line for line in human)

    recs = [json.loads(line) for line in
            (tmp_path / "_logs" / "run.jsonl").read_text().splitlines()]
    assert all(r["run_id"] == "run-42" for r in recs)
    assert {"ts", "level", "logger", "msg"} <= set(recs[0])
    assert any(r["level"] == "WARNING" for r in recs)


def test_job_writes_run_logs(ray_session, tmp_path):
    """engine.job end-to-end writes run.log/run.jsonl under <out>/_logs
    with the request lifecycle records."""
    import io as _io
    import json
    from contextlib import redirect_stdout

    from resume_ocr_ray.core import corpus
    from resume_ocr_ray.engine import io as EIO, job as J

    docs, media = corpus.generate_corpus(6, seed=3)
    src = str(tmp_path / "corpus")
    EIO.write_corpus(src, docs, media, num_shards=2)
    out = str(tmp_path / "out")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = J.main(["--input", src, "--out", out, "--request-id",
                     "a7f3a9b2-1c2d-4e5f-8a9b-0c1d2e3f4a5b"])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["status"] == "ok"
    recs = [json.loads(line) for line in
            open(f"{out}/_logs/run.jsonl").read().splitlines()]
    msgs = " ".join(r["msg"] for r in recs)
    assert "Nova requisição" in msgs and "concluída" in msgs
    assert all(r["run_id"] == "a7f3a9b2-1c2d-4e5f-8a9b-0c1d2e3f4a5b"
               for r in recs)
