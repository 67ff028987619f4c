"""resume_ocr_ray — a Ray-Data-native interleaved text+media extraction engine.

A from-scratch re-expression of the capabilities of tomlavez/resume-ocr
(reference at /root/reference) as an idiomatic Ray Data pipeline:

- one ``ray.data.Dataset`` over a table of interleaved documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
- ``map_batches`` over zero-copy Arrow batches for all per-record work
- stateful OCR-engine / validator / scorer stages as actor pools
- page explosion (``flat_map`` semantics via vectorized ``map_batches``) so
  multi-page media parallelizes, then ONE ``groupby(doc_id)`` shuffle to
  stitch spans back in offset order
- partitioned, manifest-committed output for checkpoint/resume

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions are
owned by bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"
