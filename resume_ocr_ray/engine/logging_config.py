"""Structured run logging — the batch-engine analog of the reference's
rotating-file logging config (app/config/logging_config.py:6-53, wired at
main.py:11).

Parity kept: same rotation policy (10 MB × 5 backups), same line format
(``asctime | name | levelname | message``), same idempotent handler reset,
file handler at DEBUG / console at INFO, and the same "logging configured"
first record.

Batch-engine deltas (deliberate):

- The log root is the RUN's output directory (``<out>/_logs/``), not a
  process-global ``logs/`` — runs are the unit of observability here, and
  a failed run's logs travel with its partial output.
- A second JSON-lines handler (``run.jsonl``) emits machine-parseable
  records (ts/level/logger/msg/run_id) — the thing a 256-node log
  aggregator actually ingests; the human-format file mirrors the
  reference for eyeballs.
- DRIVER-side only: Ray workers write to Ray's own per-worker logs (the
  cluster's log shipper owns those); pushing worker records through one
  shared file handler would serialize every node on a single file lock.
  Worker-side metrics instead flow through the per-partition manifests
  (engine/checkpoint.py), which is where run accounting already lives.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import os

LOG_FORMAT = "%(asctime)s | %(name)s | %(levelname)s | %(message)s"
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
MAX_BYTES = 10 * 1024 * 1024  # reference: 10 MB per file
BACKUP_COUNT = 5  # reference: 5 rotated backups

#: logger namespace for all engine run logging
RUN_LOGGER = "resume_ocr_ray.run"


class JsonLinesFormatter(logging.Formatter):
    """One JSON object per record: ts, level, logger, msg, run_id (+exc)."""

    def __init__(self, run_id: str | None = None):
        super().__init__(datefmt=DATE_FORMAT)
        self.run_id = run_id

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "ts": self.formatTime(record, DATE_FORMAT),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        if self.run_id is not None:
            out["run_id"] = self.run_id
        if record.exc_info:
            out["exc"] = self.formatException(record.exc_info)
        return json.dumps(out, ensure_ascii=False)


def setup_run_logging(log_dir: str, run_id: str | None = None,
                      console: bool = True) -> logging.Logger:
    """Configure the run logger: rotating human-format file + JSON-lines
    file under ``log_dir``, optional console echo. Idempotent per
    interpreter (existing handlers on the run logger are cleared first,
    mirroring the reference's duplicate-handler guard). Returns the
    configured logger; library code gets children via
    ``logging.getLogger(f"{RUN_LOGGER}.<mod>")`` and inherits handlers."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(RUN_LOGGER)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # run records don't double-print via root
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()

    file_handler = logging.handlers.RotatingFileHandler(
        filename=os.path.join(log_dir, "run.log"),
        maxBytes=MAX_BYTES, backupCount=BACKUP_COUNT, encoding="utf-8",
    )
    file_handler.setLevel(logging.DEBUG)
    file_handler.setFormatter(logging.Formatter(LOG_FORMAT, DATE_FORMAT))
    logger.addHandler(file_handler)

    json_handler = logging.handlers.RotatingFileHandler(
        filename=os.path.join(log_dir, "run.jsonl"),
        maxBytes=MAX_BYTES, backupCount=BACKUP_COUNT, encoding="utf-8",
    )
    json_handler.setLevel(logging.DEBUG)
    json_handler.setFormatter(JsonLinesFormatter(run_id=run_id))
    logger.addHandler(json_handler)

    if console:
        console_handler = logging.StreamHandler()
        console_handler.setLevel(logging.INFO)
        console_handler.setFormatter(
            logging.Formatter(LOG_FORMAT, DATE_FORMAT))
        logger.addHandler(console_handler)

    logger.info("Sistema de logging configurado")  # reference first record
    return logger
