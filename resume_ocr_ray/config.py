"""Engine constants.

Behavioral constants replicate the reference exactly (citations into
/root/reference); execution knobs are ours (Ray-Data-first design).
"""

# ---- behavioral constants (reference parity) -------------------------------

#: Direct-text length above which a PDF is treated as a text PDF rather than
#: scanned (reference: app/services/ocr_service.py:61).
TEXT_PDF_THRESHOLD = 200

#: Page-stitch marker for multi-page scanned PDFs; {i} is the 1-based page
#: number (reference: app/services/ocr_service.py:117).
PAGE_MARKER = "\n--- Página {i} ---\n"

#: Text-content validation sees only the first N chars
#: (reference: app/utils/validation_service.py:149).
VALIDATION_TEXT_TRUNC = 3000

#: Application-level retry budget for OCR / scorer calls
#: (reference: app/config/constants.py:12, llm_service.py:13).
MAX_RETRIES = 3

#: Retry backoff base in seconds: sleep 0.5*(attempt+1)
#: (reference: app/services/analyze_service.py:66). The sandbox stand-in
#: engines are deterministic so this is never actually slept in tests, but
#: the loop shape is preserved.
RETRY_BACKOFF = 0.5

#: Query-mode result truncation (reference: app/routers/analysis.py:543-545).
TOP_K = 5

#: Per-payload size cap (reference MAX_FILE_SIZE = 10 MB, constants.py:5).
#: Deviation from the reference, documented: an oversized payload becomes a
#: per-row error (the reference 400s the whole request, utils.py:27-47 —
#: failing a whole 100 TB job on one file would be wrong at scale). Exact
#: reference all-or-nothing semantics are available as an opt-in:
#: ``engine.job --strict-request`` (engine/job.py strict_validate_request)
#: rejects the whole batch with the reference's HTTP status + detail.
MAX_MEDIA_BYTES = 10 * 1024 * 1024
ERR_TOO_LARGE = "Arquivo {name} excede o tamanho máximo de 10MB."

#: Request-level file-count cap (reference MAX_FILES = 20, constants.py:4;
#: enforced at app/utils/utils.py:27-47 as a 400 on the whole request). The
#: batch-job analog is the OPTIONAL ``--max-docs`` knob on engine.job: when
#: set, the job refuses to start if the input corpus exceeds it (counted
#: from parquet footers — no data scan). Unset by default: a fixed 20-doc
#: ceiling is an HTTP-request constant, not a property of a 10^12-doc corpus.
MAX_FILES = 20
ERR_MAX_FILES = "Número máximo de arquivos excedido. O limite é {limit}."

#: Allowed media kinds; anything else is the reference's unsupported-type
#: error (app/services/ocr_service.py:126-127 maps extensions the same way).
MEDIA_KIND_IMAGE = "image"
MEDIA_KIND_PDF = "pdf"
MEDIA_KIND_HTML = "html"
ALLOWED_MEDIA_KINDS = (MEDIA_KIND_IMAGE, MEDIA_KIND_PDF, MEDIA_KIND_HTML)

# Error message templates (reference parity; Portuguese strings preserved).
ERR_NOT_RESUME = "Arquivo {name} rejeitado, não é um currículo."
ERR_NOT_RESUME_TEXT = "Arquivo {name} rejeitado, não é um currículo"
ERR_NOT_RESUME_TEXT_WITH = "Arquivo {name} rejeitado, não é um currículo: {err}"
ERR_PAGE_VALIDATION = "Erro na validação da página {i}/{n} - {name}: {err}"
ERR_OCR_EMPTY = (
    "Alerta: O PDF parece ser uma imagem, mas o OCR não conseguiu extrair texto."
)
ERR_IMAGE_PROCESS = "Erro ao processar imagem {name} com OCR: {err}"
ERR_PDF_CRITICAL = "Erro crítico no fallback de OCR para PDF: {err}"
ERR_HTML_PROCESS = "Erro ao processar HTML {name}: {err}"
ERR_UNSUPPORTED = "Erro: Tipo de arquivo não suportado. Use PDF, PNG, JPG ou JPEG."
ERR_EMPTY_FILE = "Arquivo {name} está vazio."
ERR_BAD_REF = "Erro: referência de mídia inválida ou não resolvida: {ref}"

# ---- execution knobs (ours) ------------------------------------------------

#: Rows per batch through the OCR actor pool. Media payloads are the large
#: column; at 100 TB scale with multi-MB payloads this should drop (the
#: object store holds batch_size × concurrency payloads in flight).
#: 512 measured ~5% faster than 256 on the sf0.1 headline (interleaved
#: repeats, 4/4 pairwise wins: medians 3.13 s vs 3.29 s at 32 CPUs —
#: per-task fixed costs dominate the synthetic decode); 128/64 measured
#: 4.0/5.1 s (per-actor LRU locality degrades with small batches).
OCR_BATCH_SIZE = 512

#: Default OCR actor pool size; bench/pipeline override from num_cpus.
OCR_CONCURRENCY = 4

#: Default number of output partitions for the checkpointed write.
DEFAULT_NUM_PARTITIONS = 8

#: Row budget for broadcasting a join's small side to every worker
#: (``ray.put`` once, fetched per worker). Above this the enrolled queries
#: switch to the shuffled sibling (asof_join_shuffled,
#: orders_by_segment_shuffled) — decided from the parquet FOOTER row count,
#: never by reading data on the driver. 4M rows ≈ tens of MB for the
#: 2–4-column dimension frames involved; matches the dup-hash broadcast
#: budget in ops/dedup.py.
BROADCAST_BUDGET_ROWS = 4_000_000

#: State-row budget under which connected-components label propagation
#: folds ON THE DRIVER (one vectorized pandas min-propagation loop)
#: instead of running the distributed pointer-jumping rounds. Each
#: distributed iteration costs ~4 shuffle exchanges; at small state that
#: is pure fixed overhead (measured 1.9 s for a 256-edge graph at sf0.1).
#: 2M (key, doc_id, label) rows ≈ ~120 MB driver heap — comfortably
#: bounded; above it the exchange rounds are the right shape.
CC_DRIVER_FOLD_ROWS = 2_000_000
