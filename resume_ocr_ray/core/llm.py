"""Stand-in analysis model + response parser (reference LLM stage L1/M11).

The sandbox has no network, so the Groq call (llm_service.py:107-116) is
replaced by a DETERMINISTIC stand-in model that emits a raw response in the
reference's output format ("Feedback / Score / Resumo / Extra_comments"),
which is then parsed with the reference's normalization rules VERBATIM
(llm_service.py:118-147) — the parser defines output equality for the
analysis stage, so its code path must be real.

Scoring model (deterministic, seed-free):
- query mode → score = 10 * |query_words ∩ resume_words| / |query_words|
  rounded to 1 decimal (a keyword-overlap alignment score, the honest
  stand-in for the rubric at llm_service.py:61-66).
- no-query mode → seniority by resume token count: <120 "Júnior",
  <300 "Pleno", else "Sênior" (llm_service.py:93 string score).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .. import config

_WORD = re.compile(r"\w+", re.UNICODE)


@dataclass
class AnalysisResult:
    score: float | None      # query mode
    seniority: str | None    # no-query mode
    summary: str


@dataclass
class AnalysisError:
    error: str


def _words(text: str) -> set:
    return {w.lower() for w in _WORD.findall(text)}


def model_response(resume_text: str, query: str | None) -> str:
    """The stand-in 'LLM': deterministic raw response in the reference format."""
    summary_src = " ".join(resume_text.split())[:120]
    summary = (summary_src + " (resumo deterministico)").strip()
    if query is not None:
        qw = _words(query)
        overlap = len(qw & _words(resume_text)) / max(1, len(qw))
        score = round(10.0 * overlap, 1)
        return (
            "Feedback:\n"
            f"    Score: {score}/10\n"
            f"    Resumo: {summary}\n"
            "Extra_comments:\n    n/a\n"
        )
    n_tokens = len(_WORD.findall(resume_text))
    seniority = "Júnior" if n_tokens < 120 else ("Pleno" if n_tokens < 300 else "Sênior")
    return (
        "Feedback:\n"
        f"    Score: {seniority}\n"
        f"    Resumo: {summary}\n"
        "Extra comments:\n    n/a\n"
    )


def parse_response(res: str, query: str | None):
    """Reference M11 parser, verbatim rules (llm_service.py:118-147)."""
    res = res.replace("*", "")
    extra_comments = "Extra_comments" if "Extra_comments" in res else "Extra comments"
    feedback = "Feedback" if "Feedback" in res else "feedback"
    score_marker = "Score" if "Score" in res else "score"
    resumo = "Resumo" if "Resumo" in res else "resumo"

    analysis = res.split(feedback)[1].split(extra_comments)[0].strip()
    score = analysis.split(score_marker)[1].split("\n")[0].strip()
    summary = analysis.split(resumo)[1].split("\n")[0].strip()

    if len(summary) < 10:
        raise ValueError("summary too short")  # reference: retry (llm_service.py:131-132)

    if "/" in score:
        score = score.split("/")[0].strip()
    if score.startswith(":"):
        score = score[1:].strip()
    if summary.startswith(":"):
        summary = summary[1:].strip()

    if query is not None:
        return AnalysisResult(score=float(score), seniority=None, summary=summary)
    return AnalysisResult(score=None, seniority=score, summary=summary)


def validate_query(query: str) -> bool:
    """Driver-side one-shot query validation (reference L2,
    llm_service.py:158-235: LLM classifies the job query as valid/invalid,
    ambiguous → retry, exhausted → False).

    Deterministic stand-in: a query is valid when it contains at least two
    alphabetic tokens of length ≥2 (a job description, not noise); the retry
    loop shape is preserved, the default on failure is False.
    """
    for _ in range(config.MAX_RETRIES):
        try:
            words = [w for w in _WORD.findall(query or "") if len(w) >= 2 and not w.isdigit()]
            return len(words) >= 2
        except Exception:
            continue
    return False


def analyze(resume_text: str, query: str | None):
    """Retry loop shape of llm_service.py:107-154 around the stand-in model."""
    for _ in range(config.MAX_RETRIES):
        try:
            return parse_response(model_response(resume_text, query), query)
        except Exception:
            continue
    return AnalysisError(error="Erro ao processar o currículo, tente novamente mais tarde.")
