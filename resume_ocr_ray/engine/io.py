"""IO layer: corpus read/write (Lance preferred, Parquet fallback) and the
media store broadcast.

The north rule names Lance as the storage format; the sandbox has no ``lance``
wheel (SURVEY §1.2), so the IO layer selects at import time:
``ray.data.read_lance`` when ``lance`` is importable, else ``read_parquet``
over the identical schema. Corpus writes are SHARDED (one file per shard) so
the checkpoint runner can treat input shards as resume units.

Media resolution: the reference reads each upload into memory
(app/services/analyze_service.py:11-25); here ``media_ref`` resolves through a
``MediaStore``. Small corpora broadcast a dict via ``ray.put`` ONCE (read by
every actor in ``__init__`` — never re-shipped per batch). At 100 TB the same
interface is backed by a hash-sharded parquet sidecar: each OCR actor lazily
loads only the shards its refs hash into (``ShardedParquetMediaStore``).
"""

from __future__ import annotations

import importlib.util
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

from ..core import extract as X
from ..core import media as M

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def read_documents(path: str):
    """Dataset of (doc_id, spans) from a file/dir (lance → parquet fallback)."""
    import ray.data as rd

    if HAVE_LANCE and str(path).endswith(".lance"):
        return rd.read_lance(path)
    return rd.read_parquet(path)


def write_corpus(out_dir: str, docs: pa.Table, media: pa.Table, num_shards: int = 4):
    """Write a corpus as sharded parquet: documents/shard-NNNN.parquet + media/.

    Shards are hash-ranged on doc_id row order (deterministic); they are the
    checkpoint/resume unit. Media is sharded by crc32(media_ref) % num_shards
    so a media shard co-locates with its documents' shard is NOT assumed —
    resolution goes through the MediaStore interface.
    """
    docs_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media")
    os.makedirs(docs_dir, exist_ok=True)
    os.makedirs(media_dir, exist_ok=True)
    n = docs.num_rows
    per = max(1, (n + num_shards - 1) // num_shards)
    for s in range(num_shards):
        chunk = docs.slice(s * per, per)
        if chunk.num_rows == 0 and s > 0:
            continue
        pq.write_table(chunk, os.path.join(docs_dir, f"shard-{s:04d}.parquet"))
    refs = media.column("media_ref").to_pylist()
    buckets = [zlib.crc32(r.encode()) % num_shards for r in refs]
    for s in range(num_shards):
        idx = [i for i, b in enumerate(buckets) if b == s]
        if not idx and s > 0:
            continue
        pq.write_table(media.take(idx), os.path.join(media_dir, f"media-{s:04d}.parquet"))
    return docs_dir, media_dir


def write_derived_corpus_parallel(src: pa.Table, repeat: int, out_dir: str,
                                  rows_per_shard: int = 512) -> tuple:
    """Generate + write the derived interleaved corpus with RAY TASKS, one
    per source-row shard (generation is a pure per-doc function, so sharding
    does not change the corpus). ~num_cpus× faster than driver-side
    generation for large benchmark corpora."""
    import ray

    from ..core import corpus as corpus_mod

    docs_dir = os.path.join(out_dir, "documents")
    media_dir = os.path.join(out_dir, "media")
    os.makedirs(docs_dir, exist_ok=True)
    os.makedirs(media_dir, exist_ok=True)

    @ray.remote
    def gen_shard(src_slice: pa.Table, shard_id: int) -> int:
        docs, media = corpus_mod.corpus_from_documents(src_slice, repeat=repeat)
        pq.write_table(docs, os.path.join(docs_dir, f"shard-{shard_id:04d}.parquet"))
        pq.write_table(media, os.path.join(media_dir, f"media-{shard_id:04d}.parquet"))
        return docs.num_rows

    futs = []
    for s, start in enumerate(range(0, src.num_rows, rows_per_shard)):
        futs.append(gen_shard.remote(src.slice(start, rows_per_shard), s))
    total = sum(ray.get(futs))
    return docs_dir, media_dir, total


def build_media_meta(media: pa.Table) -> dict:
    """Per-ref dispatch metadata for the explode stage (cheap header peeks).

    Returns {ref: (unit_kind, n_pages)} where unit_kind pre-resolves the
    oracle's dispatch order (extract.extract_media_span):
    empty payload → 'empty_payload'; undecodable header → 'unsupported';
    media_kind image → 'image'; pdf with >threshold direct text →
    'pdf_direct'; pdf otherwise → 'pdf_page'; other kinds → 'unsupported'.
    """
    import pyarrow.compute as pc

    from .. import config as C

    meta = {}
    refs = media.column("media_ref").to_pylist()
    col = media.column("payload")
    # header peek WITHOUT copying full payloads into Python: slice the first
    # 4 KiB of each binary cell (covers any header; oversized headers fall
    # back to the full row below)
    lengths = pc.binary_length(col).to_pylist()
    heads = pc.binary_slice(col, 0, 4096).to_pylist()
    for i, (ref, size, head) in enumerate(zip(refs, lengths, heads)):
        if size == 0:
            meta[ref] = ("empty_payload", 1)
            continue
        if size > C.MAX_MEDIA_BYTES:
            meta[ref] = ("too_large", 1)
            continue
        try:
            try:
                hdr = M.decode_media_header(head)
            except Exception:
                hdr = M.decode_media_header(col[i].as_py())
        except Exception:
            meta[ref] = ("unsupported", 1)
            continue
        kind = hdr.get("media_kind")
        if kind == C.MEDIA_KIND_IMAGE:
            meta[ref] = ("image", 1)
        elif kind == C.MEDIA_KIND_PDF:
            direct = hdr.get("direct_text", "")
            if len(direct.strip()) > C.TEXT_PDF_THRESHOLD:
                meta[ref] = ("pdf_direct", 1)
            else:
                meta[ref] = ("pdf_page", int(hdr.get("n_pages", 0)))
        else:
            meta[ref] = ("unsupported", 1)
    return meta


class _ArrowLookup:
    """Dict-like view over a broadcast Arrow media table.

    The table lives ONCE in the object store (zero-copy ray.get per worker);
    only the ref→row index is built per consumer. ``get(ref)`` copies out a
    single payload — the full payload column is never materialized in Python.
    """

    def __init__(self, table: pa.Table):
        self._payloads = table.column("payload").combine_chunks()
        refs = table.column("media_ref").to_pylist()
        self._index = {r: i for i, r in enumerate(refs)}

    def get(self, ref, default=None):
        i = self._index.get(ref)
        if i is None:
            return default
        return self._payloads[i].as_py()

    def __contains__(self, ref):
        return ref in self._index

    def __len__(self):
        return len(self._index)


class MediaStore:
    """Broadcast media store: the media TABLE (Arrow, zero-copy in plasma)
    + the small meta dict, each ray.put ONCE; stages fetch in
    ``__init__``/first use and build a per-worker row index."""

    def __init__(self, table_ref, meta_ref):
        self.table_ref = table_ref
        self.meta_ref = meta_ref

    @classmethod
    def from_table(cls, media: pa.Table) -> "MediaStore":
        import ray

        meta = build_media_meta(media)
        return cls(
            ray.put(media.select(["media_ref", "payload"])), ray.put(meta)
        )

    @classmethod
    def from_parquet(cls, media_dir: str) -> "MediaStore":
        ds = pq.ParquetDataset(media_dir)
        return cls.from_table(ds.read())

    def get_meta(self) -> dict:
        import ray

        return ray.get(self.meta_ref)

    def get_lookup(self) -> _ArrowLookup:
        import ray

        return _ArrowLookup(ray.get(self.table_ref))
