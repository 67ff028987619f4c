"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in resume_ocr_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)
# Ray workers spawn from the driver env: export the repo path so freshly
# spawned workers can import the package even when the driver cwd differs.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from resume_ocr_ray.pipelines import registry  # noqa: E402


def _register_by_value():
    """Ship the package's code inside pickled UDF closures (cloudpickle
    by-value) so already-running workers without the repo on sys.path can
    still deserialize our map_batches functions."""
    try:
        from ray import cloudpickle as _rcp

        for name, mod in list(sys.modules.items()):
            if name.startswith("resume_ocr_ray") and mod is not None:
                try:
                    _rcp.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


_register_by_value()

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: interleaved extraction over the corpus derived from
    sf0.001 documents → per-doc summary Dataset (doc_id, n_spans_out,
    total_chars, error)."""
    return registry.q_extract_interleaved(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
