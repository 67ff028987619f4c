"""Hypothesis property tests over the PURE semantic functions (no Ray):
invariants that must hold for any input, not just the fixture corpus."""

import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from resume_ocr_ray.core import llm
from resume_ocr_ray.ops.dedup import jaccard, jaccard_counts
from resume_ocr_ray.ops.text import PII_EMAIL_RX, PII_PHONE_RX

TEXT = st.text(max_size=300)


@settings(max_examples=60, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_counts_invariants(a, b):
    i, u = jaccard_counts(a, b)
    assert 0 <= i <= u
    assert u >= 1  # shingle sets are non-empty by construction ({''} floor)
    assert jaccard_counts(b, a) == (i, u)  # symmetric
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert jaccard(a, a) == 1.0


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_redaction_leaves_no_pii_match(t):
    # same RE2 kernels the operator uses (Python re differs from RE2)
    clean = pc.replace_substring_regex(
        pc.replace_substring_regex([t], PII_EMAIL_RX, "<EMAIL>"),
        PII_PHONE_RX,
        "<PHONE>",
    )
    assert pc.count_substring_regex(clean, PII_EMAIL_RX)[0].as_py() == 0
    assert pc.count_substring_regex(clean, PII_PHONE_RX)[0].as_py() == 0


@settings(max_examples=60, deadline=None)
@given(TEXT, st.one_of(st.none(), st.text(min_size=1, max_size=120)))
def test_llm_model_parse_round_trip(resume_text, query):
    """Whatever the stand-in model emits, the M11 parser must parse (the
    parser may raise on arbitrary garbage — the reference retries on
    exceptions — but never on the model's own output)."""
    res = llm.model_response(resume_text, query)
    out = llm.parse_response(res, query)
    if query is not None:
        assert out.score is not None and 0.0 <= out.score <= 10.0
    else:
        assert out.seniority
    assert len(out.summary) >= 10
