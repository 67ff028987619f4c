"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Large-scale training-data-pipeline ops, each a vectorized ``map_batches``
stage (no Python row loops in hot paths):

- ``doc_stats``        — char/token counts (whitespace tokenization chosen to
                         be exactly DuckDB-oracle-expressible)
- ``quality_score``    — length / punctuation / stopword-ratio heuristics
- ``lang_id``          — n-gram + stopword language heuristic (actor pool:
                         compiled tables built once per actor)
- ``fingerprint``      — 64-bit rolling-hash document fingerprint
- ``token_count_bpe``  — BPE-ish regex token counting (compiled once)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..common import from_pandas_clean as _fpc
import pyarrow.compute as pc


def doc_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars_actual, n_tokens) — DuckDB-matching semantics:
    n_tokens = len(text.split(' ')) i.e. DuckDB len(string_split(text,' '))."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_actual": n_chars.cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
        }
    )


_PUNCT = ".!?,;:"


def quality_score(batch: pa.Table) -> pa.Table:
    """Quality heuristics: punctuation / uppercase density and mean word
    length, as INTEGER parts-per-million (floor) — exactly SQL-expressible,
    no float-rounding drift vs the DuckDB oracle.
    """
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    n_punct = pc.subtract(
        n_chars,
        pc.utf8_length(
            pc.replace_substring_regex(text, f"[{re.escape(_PUNCT)}]", "")
        ).cast(pa.float64()),
    )
    n_upper = pc.subtract(
        n_chars,
        pc.utf8_length(pc.replace_substring_regex(text, "[A-Z]", "")).cast(pa.float64()),
    )
    n_tokens = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.float64())

    def ppm(num, den):
        return pc.floor(pc.divide(pc.multiply(num, pa.scalar(1_000_000.0)), den)).cast(
            pa.int64()
        )

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "punct_ppm": ppm(n_punct, safe_chars),
            "upper_ppm": ppm(n_upper, safe_chars),
            "word_len_ppm": ppm(n_chars, pc.max_element_wise(n_tokens, pa.scalar(1.0))),
        }
    )


#: tiny per-language stopword profiles for the heuristic lang-id. A zh
#: profile is deliberately ABSENT: the heuristic keys on ``[a-z]+`` stopword
#: overlap, which cannot see CJK text — zh docs fall to the 'en' default
#: like any text with no profile hits (same rule on the DuckDB oracle side).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "with", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "con", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"},
}


class LangIdStage:
    """Heuristic language ID (actor pool: regex + profiles compiled once).

    On word-salad synthetic text this is a demonstration operator: it scores
    distinct-stopword overlap per language and falls back to 'en'. The exact
    semantics (``[a-z]+`` words of the lowercased text, strictly-greater
    argmax in profile order) are deliberately DuckDB-restatable — the driver
    oracle recomputes them in SQL (registry.oracle_sql()['lang_id'])."""

    def __init__(self):
        self.word = re.compile(r"[a-z]+")
        self.profiles = dict(_LANG_PROFILES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            words = set(self.word.findall((t or "").lower()))
            best, best_n = "en", 0
            for lang, prof in self.profiles.items():
                n = len(words & prof)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)}
        )


_FP_BASE = np.uint64(1099511628211)
_FP_WINDOW = 8


def fingerprint(batch: pa.Table, window: int = _FP_WINDOW) -> pa.Table:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    token CRCs in a ``window``-gram, taking the minimum window hash
    (mod 2^64, numpy wraparound). Vectorized: ``window`` vector passes per
    doc, no per-byte Python loops. Stable across processes (CRC-based, no
    PYTHONHASHSEED dependence) — usable as a dedup/shard-routing key."""
    import zlib

    from ..common import horner_shingles

    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            out[i] = 0
            continue
        arr = np.fromiter(
            (zlib.crc32(w.encode()) for w in toks), dtype=np.uint64, count=len(toks)
        )
        out[i] = horner_shingles(arr, window, _FP_BASE).min()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(out.view(np.int64)),
        }
    )


def fingerprint_md5(batch: pa.Table, window: int = _FP_WINDOW) -> pa.Table:
    """Winnowing fingerprint, oracle-checkable variant: the MINIMUM md5 over
    all ``window``-token shingles (tokens = ``\\S+`` runs, matching DuckDB's
    regexp_extract_all). Same dedup/shard-routing use as ``fingerprint`` but
    exactly restatable in SQL (md5 + list_transform + list_min), so the
    driver verifies it value-for-value."""
    import hashlib

    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        toks = re.findall(r"\S+", t or "")
        if not toks:
            out.append(None)
            continue
        w = min(window, len(toks))
        out.append(
            min(
                hashlib.md5(" ".join(toks[i : i + w]).encode()).hexdigest()
                for i in range(len(toks) - w + 1)
            )
        )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(out, type=pa.string()),
        }
    )


class BpeTokenCounter:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex, compiled
    once per actor; counts are vectorized per batch.

    RE2-compatible variant: GPT-2's ``\\s+(?!\\S)`` lookahead branch is
    dropped — it only moves the split point between a whitespace run and the
    following token, never the match COUNT (verified count-identical over
    the test corpus), and dropping it lets DuckDB (RE2, no lookahead) run
    the identical pattern as the driver oracle."""

    PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+"

    def __init__(self):
        self.pat = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = [len(self.pat.findall(t or "")) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )


def stopword_filter(docs_ds_factory, k: int = 20):
    """Corpus-adaptive stopword filtering: find the global top-``k`` terms
    by frequency (count desc, term asc tiebreak), broadcast them, and
    report per-document token counts before/after dropping them — the
    classic compute-small-side-then-broadcast shape.

    Pass 1: per-batch term-count partials (vocabulary-bounded, not
    token-bounded) → groupby(term) Sum → sort().limit(k) — only the
    vocabulary crosses the shuffle, only k rows reach the driver.
    Pass 2: ONE streamed pass re-tokenizing each batch (Arrow
    split_pattern, no Python row loop) against the k-term set. At 100 TB
    the k-term set is bytes; ship it by closure capture (ray.put for
    bigger lookup sides). Tokenization is single-space split with empties
    dropped — exactly DuckDB ``string_split(text, ' ')`` semantics, so
    the op is oracle-checkable value-for-value."""
    from ..common import cache_if_small

    # multi-pass source: one shared materialization below the budget
    docs_ds_factory = cache_if_small(docs_ds_factory)

    def _term_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)  # StructArray{values, counts}
        return pa.table(
            {
                "term": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    def _partial_topk(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        df = df.sort_values(["n", "term"], ascending=[False, True]).head(k)
        return _fpc(df, preserve_index=False)

    # partial top-k per aggregated block → ≤ k rows per block reach the
    # driver (vocabulary never materializes anywhere whole), tiny final merge
    from ..common import cogroup_agg

    # vocabulary-cardinality keys: coarse cogroup sum, not per-key Aggregate
    top = (
        cogroup_agg(
            docs_ds_factory().map_batches(
                _term_counts, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536,
            ),
            "term", {"n": ("n", "sum")},
        )
        .map_batches(_partial_topk, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas()
    )
    top = top.sort_values(["n", "term"], ascending=[False, True]).head(k)
    stop = set(top["term"])  # k strings — broadcast by closure capture

    stop_arr = pa.array(sorted(stop), type=pa.string())

    def _filter_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "")
        kept_mask = pc.and_(nonempty, pc.invert(
            pc.is_in(flat, value_set=stop_arr)))
        n_rows = b.num_rows
        n_tokens = np.zeros(n_rows, dtype=np.int64)
        np.add.at(n_tokens, parent,
                  nonempty.to_numpy(zero_copy_only=False).astype(np.int64))
        n_kept = np.zeros(n_rows, dtype=np.int64)
        np.add.at(n_kept, parent,
                  kept_mask.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "n_kept": pa.array(n_kept),
            }
        )

    return docs_ds_factory().map_batches(
        _filter_counts, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def html_main(docs_ds):
    """HTML main-content extraction (north rule: boilerplate strip + DOM
    heuristics): each document's text is wrapped in a deterministic
    synthetic crawl page (nav/sidebar/ads/cookie-banner boilerplate, seeded
    per doc), then recovered with the readability-style block scorer in
    ``core.html.extract_main``. Per-row parse is inherent (a DOM is not
    columnar); wrap+extract run fused in ONE map_batches pass so the
    synthetic page bytes never cross a stage boundary. Exact invariant:
    main_text == the original text, oracle-checked value-for-value."""
    from ..core import html as H

    def _batch(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = [H.extract_main(H.wrap_page(i, t or "")) for i, t in zip(ids, texts)]
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "main_text": pa.array(out, type=pa.string())}
        )

    return docs_ds.map_batches(
        _batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
    )


#: section-heuristic vocabulary: analog of the north star's contact/skills/
#: experience block detection, re-voweled for the testdata corpus' lexicon
SKILL_RX = r"\b(spark|sql|join|hash|merge|scan|query|table)\b"
CONTACT_MARK = "customer"
EXPERIENCE_MARKS = ("window", "agg")


def section_flags(docs_ds):
    """Section heuristics over document text (north star: contact/skills/
    experience block detection): fully Arrow-native — one
    ``count_substring_regex`` and three ``match_substring`` kernels per
    batch, zero Python rows, exactly restated in the DuckDB oracle."""

    def _batch(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b.column("text"))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "has_contact": pc.match_substring(low, CONTACT_MARK),
                "has_experience": pc.or_(
                    pc.match_substring(low, EXPERIENCE_MARKS[0]),
                    pc.match_substring(low, EXPERIENCE_MARKS[1]),
                ),
                "n_skill_terms": pc.count_substring_regex(
                    low, SKILL_RX
                ).cast(pa.int64()),
            }
        )

    return docs_ds.map_batches(
        _batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


# ---------------------------------------------------------------------------
# PII redaction (north star: the reference pipeline handles resumes, i.e.
# contact-bearing text — analyze_service.py:11-25 ingests them verbatim; a
# training-data engine over the same corpus must be able to scrub them)
# ---------------------------------------------------------------------------

#: RE2-compatible patterns (no lookahead/backrefs) so the exact same strings
#: run in Arrow's RE2 kernels here AND in the DuckDB (RE2) oracle.
PII_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RX = r"\+[0-9][0-9 ()\-]{6,}[0-9]"


def redact_pii(docs_ds, text_col: str = "text"):
    """Scrub emails / international-format phone numbers from ``text_col``,
    returning (doc_id, n_emails, n_phones, clean_text).

    Fully Arrow-native: two ``count_substring_regex`` + two
    ``replace_substring_regex`` RE2 kernels per batch, zero Python rows —
    byte-identical to the DuckDB oracle because both engines are RE2.
    Emails are redacted first; phones are counted/redacted over the
    email-redacted text (the oracle restates the same order)."""

    def _batch(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        n_em = pc.count_substring_regex(t, PII_EMAIL_RX)
        clean = pc.replace_substring_regex(t, PII_EMAIL_RX, "<EMAIL>")
        n_ph = pc.count_substring_regex(clean, PII_PHONE_RX)
        clean = pc.replace_substring_regex(clean, PII_PHONE_RX, "<PHONE>")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_emails": n_em.cast(pa.int64()),
                "n_phones": n_ph.cast(pa.int64()),
                "clean_text": clean,
            }
        )

    return docs_ds.map_batches(
        _batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


# ---------------------------------------------------------------------------
# cross-document duplicate-phrase detection (boilerplate discovery)
# ---------------------------------------------------------------------------


def _gram_doc_counts(docs_ds, n: int):
    """(gram, sum(partial)=distinct-doc count) for every word ``n``-gram:
    per-batch shingle explode with WITHIN-DOC dedup (exact — a document is
    one row and never splits across batches) and a batch-local combine,
    then one COARSE hash-cogroup sum (common.cogroup_agg): gram keys number
    ~one per corpus token, and the engine Aggregate pays per-KEY cost at
    that cardinality (measured 4.0–4.5 s → 0.8 s warm for dup_phrases at
    sf0.1's ~300k grams). Only (gram, int) pairs ever shuffle."""

    def _partial(b: pa.Table) -> pa.Table:
        counts: dict = {}
        for t in b.column("text").to_pylist():
            toks = (t or "").split(" ")
            if len(toks) < n:
                continue
            for g in {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}:
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "gram": pa.array(list(counts), type=pa.string()),
                "partial": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    from ..common import cogroup_agg

    return cogroup_agg(
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        ),
        "gram",
        {"sum(partial)": ("partial", "sum")},
    )


def dup_phrases(docs_ds, n: int = 3, min_docs: int = 3, top: int = 50):
    """Find word ``n``-grams shared by >= ``min_docs`` distinct documents —
    the boilerplate-discovery primitive of web-corpus cleaning (CCNet-style
    repeated-line removal, generalized to token shingles since this corpus
    is single-line).

    Shape: per-batch shingle explode with WITHIN-DOC dedup (exact, because a
    document is one row and therefore never splits across batches) and a
    batch-local (gram -> partial doc count) combine, then ONE keyed
    groupby-sum over ``gram``, post-agg ``min_docs`` filter, total-order
    sort (count desc, gram asc — gram is unique so the ``top`` cut is
    deterministic). Only (gram, int) pairs ever shuffle.

    At 100 TB the gram key space is enormous; the partial combine collapses
    within-batch duplicates before the exchange, and a production run would
    put a count-min/bloom prepass in front to drop singleton grams early —
    the post-agg filter here keeps the op exact for the oracle."""

    agg = _gram_doc_counts(docs_ds, n)

    def _finish(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"gram": b.column("gram"), "n_docs": b.column("sum(partial)")}
        )
        return t.filter(pc.greater_equal(t.column("n_docs"), min_docs))

    from ..common import topk_exact

    # the filtered gram count is UNBOUNDED (scales with corpus vocabulary),
    # so the k-row result must come from per-block partials, not a global
    # range sort of every gram; costs ~+0.6 s at sf0.1 (operator startup)
    # and removes the corpus-sized all-to-all at scale
    return topk_exact(
        agg.map_batches(_finish, batch_format="pyarrow",
                        zero_copy_batch=True),
        [("n_docs", "descending"), ("gram", "ascending")], top,
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (test-set n-gram overlap flagging)
# ---------------------------------------------------------------------------


#: gram-set broadcast ceiling for decontaminate / boilerplate_gate: above
#: this many distinct grams the ops trip to the hash-keyed semi-join scale
#: path instead of building an unbounded driver object.
GRAM_BROADCAST_MAX = 2_000_000

#: coarse gram-hash partition count for the semi-join paths
_GRAM_PARTS = 64


def _gpart(grams: pd.Series) -> np.ndarray:
    """Stable gram → partition id (crc-based — same on both join sides)."""
    import zlib as _zlib

    return np.fromiter(
        (_zlib.crc32(g.encode("utf-8")) % _GRAM_PARTS for g in grams),
        dtype=np.int32, count=len(grams),
    )


def decontaminate(docs_ds, bench_ds, n: int = 5,
                  broadcast_max: int = GRAM_BROADCAST_MAX):
    """Flag training documents that share any word ``n``-gram with a
    benchmark/test set — the GPT-3/Pile-style decontamination primitive.

    Shape: the benchmark side's per-batch-distinct grams stream to the
    driver UP TO ``broadcast_max`` accumulated distinct grams (bounded
    driver memory by construction), then:
    - fast path (the cap never trips — test sets are small by nature):
      one ``ray.put`` broadcast of the frozen set; each training batch
      does worker-local set-membership probes — no shuffle of either side
      beyond the bench partials. Identical cost to the pre-guard op.
    - scale path (an oversized 'benchmark' — e.g. decontaminating against
      another corpus): NOTHING is collected on the driver. Training docs
      explode to within-doc-distinct (gram, doc_id) rows that semi-join
      the bench-gram dataset on crc(gram) % parts cogroups; hit doc_ids
      then cogroup with the all-docs row set on doc_id % parts to emit the
      same (doc_id, contaminated) schema. Two linear all-to-alls, bounded
      memory everywhere.

    Docs with fewer than ``n`` tokens carry no shingle and are excluded on
    both sides (the oracle restates the same ``len >= n`` guard)."""
    import ray

    from ..common import cached_broadcast

    def _grams(text: str) -> set:
        toks = (text or "").split(" ")
        if len(toks) < n:
            return set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    def _bench_partial(b: pa.Table) -> pa.Table:
        s: set = set()
        for t in b.column("text").to_pylist():
            s |= _grams(t)
        return pa.table({"gram": pa.array(sorted(s), type=pa.string())})

    def _bench_partial_ds():
        return bench_ds.map_batches(
            _bench_partial, batch_format="pyarrow", zero_copy_batch=True
        )

    # capped driver collection: abort the moment the accumulated distinct
    # set passes broadcast_max — driver memory is bounded by the cap even
    # on an adversarially large 'benchmark'
    bench_grams: set = set()
    too_big = False
    for bt in _bench_partial_ds().iter_batches(batch_format="pyarrow"):
        bench_grams.update(bt.column("gram").to_pylist())
        if len(bench_grams) > broadcast_max:
            too_big = True
            break

    if not too_big:
        ref = ray.put(frozenset(bench_grams))

        def _flag(b: pa.Table) -> pa.Table:
            bg = cached_broadcast(ref)
            keep, flags = [], []
            for t in b.column("text").to_pylist():
                g = _grams(t)
                keep.append(bool(g))
                flags.append(bool(g) and not bg.isdisjoint(g))
            out = pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "contaminated": pa.array(flags, type=pa.bool_()),
                }
            )
            return out.filter(pa.array(keep, type=pa.bool_()))

        return docs_ds.map_batches(
            _flag, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )

    # ---- semi-join scale path --------------------------------------------
    def _doc_gram_rows(b: pa.Table) -> pa.Table:
        grams, ids = [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            for g in _grams(t):
                grams.append(g)
                ids.append(d)
        gs = pd.Series(grams, dtype="object")
        return pa.table(
            {
                "gram": pa.array(grams, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "is_bench": pa.array(
                    np.zeros(len(ids), dtype=np.int8)
                ),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _bench_side(t: pa.Table) -> pa.Table:
        gs = t.column("gram").to_pandas()
        return pa.table(
            {
                "gram": t.column("gram"),
                "doc_id": pa.array(np.full(len(gs), -1, dtype=np.int64)),
                "is_bench": pa.array(np.ones(len(gs), dtype=np.int8)),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _semi(g: pd.DataFrame) -> pa.Table:
        bench = g.loc[g["is_bench"] == 1, "gram"].unique()
        rows = g.loc[g["is_bench"] == 0, ["gram", "doc_id"]]
        if len(bench) and not rows.empty:
            ids = rows.loc[rows["gram"].isin(bench), "doc_id"].unique()
            ids = np.sort(ids.astype(np.int64))
        else:
            ids = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "is_hit": pa.array(np.ones(ids.size, dtype=np.int8)),
                "dpart": pa.array((ids % _GRAM_PARTS).astype(np.int32)),
            }
        )

    def _all_docs(b: pa.Table) -> pa.Table:
        keep = [bool(_grams(t)) for t in b.column("text").to_pylist()]
        t = b.filter(pa.array(keep, type=pa.bool_()))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "is_hit": pa.array(np.zeros(ids.size, dtype=np.int8)),
                "dpart": pa.array(
                    (ids.astype(np.int64) % _GRAM_PARTS).astype(np.int32)
                ),
            }
        )

    hits = (
        docs_ds.map_batches(_doc_gram_rows, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536)
        .union(_bench_partial_ds().map_batches(_bench_side,
                                               batch_format="pyarrow",
                                               zero_copy_batch=True))
        .repartition(_GRAM_PARTS // 4)
        .groupby("gpart")
        .map_groups(_semi, batch_format="pandas")
    )

    def _mark(g: pd.DataFrame) -> pa.Table:
        hit_ids = set(g.loc[g["is_hit"] == 1, "doc_id"])
        docs = g.loc[g["is_hit"] == 0, ["doc_id"]]
        return _fpc(
            pd.DataFrame(
                {
                    "doc_id": docs["doc_id"],
                    "contaminated": docs["doc_id"].isin(hit_ids),
                }
            )
        )

    return (
        docs_ds.map_batches(_all_docs, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536)
        .union(hits)
        .repartition(_GRAM_PARTS // 4)
        .groupby("dpart")
        .map_groups(_mark, batch_format="pandas")
    )


def boilerplate_gate(
    docs_ds_factory, n: int = 3, min_docs: int = 3, max_frac_num: int = 1,
    max_frac_den: int = 20, broadcast_max: int = GRAM_BROADCAST_MAX,
):
    """CCNet-style boilerplate gate: docs whose shingle stream is dominated
    by corpus-wide duplicated phrases get flagged for removal.

    Pass 1: ``_gram_doc_counts`` (one keyed shuffle) -> grams appearing in
    >= ``min_docs`` docs, as a DATASET, counted. Then either:
    - fast path (≤ ``broadcast_max`` boiler grams — the ``min_docs`` cutoff
      keeps the set small on normal corpora): ``ray.put`` broadcast + ONE
      streamed pass re-shingling each doc (occurrence counts, not deduped —
      a doc that repeats boilerplate counts it every time) against the
      worker-cached set.
    - scale path (a boilerplate-saturated corpus whose gram set outgrows a
      broadcast): no driver collection. Docs explode to (gram, doc_id,
      cnt) rows (within-doc occurrence counts) that semi-join the boiler
      gram dataset on crc(gram) % parts cogroups, emitting per-partition
      (doc_id, nb_partial) sums; a per-doc totals pass (token counts only)
      then cogroups with those partials on doc_id % parts to produce the
      identical (doc_id, n_grams, n_boiler, keep) rows.

    ``keep`` is the integer-exact gate ``n_boiler * max_frac_den <=
    n_grams * max_frac_num`` (i.e. boiler fraction <= num/den) — no float
    division anywhere, so the DuckDB oracle matches bit-for-bit. Docs with
    fewer than ``n`` tokens carry no shingle and are excluded."""
    import ray

    from ..common import cached_broadcast

    counts = _gram_doc_counts(docs_ds_factory(), n)

    def _boiler_only(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("sum(partial)"), min_docs)
        return pa.table({"gram": b.column("gram").filter(keep)})

    boiler_ds = counts.map_batches(
        _boiler_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_boiler_grams = boiler_ds.count()

    if n_boiler_grams <= broadcast_max:
        boiler: set = set()
        for bt in boiler_ds.iter_batches(batch_format="pyarrow"):
            boiler.update(bt.column("gram").to_pylist())
        ref = ray.put(frozenset(boiler))

        def _gate(b: pa.Table) -> pa.Table:
            bg = cached_broadcast(ref)
            keep_rows, n_grams, n_boiler, keep = [], [], [], []
            for t in b.column("text").to_pylist():
                toks = (t or "").split(" ")
                total = len(toks) - n + 1
                keep_rows.append(total > 0)
                if total <= 0:
                    n_grams.append(0)
                    n_boiler.append(0)
                    keep.append(True)
                    continue
                nb = sum(
                    1
                    for i in range(total)
                    if " ".join(toks[i : i + n]) in bg
                )
                n_grams.append(total)
                n_boiler.append(nb)
                keep.append(nb * max_frac_den <= total * max_frac_num)
            out = pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_grams": pa.array(n_grams, type=pa.int64()),
                    "n_boiler": pa.array(n_boiler, type=pa.int64()),
                    "keep": pa.array(keep, type=pa.bool_()),
                }
            )
            return out.filter(pa.array(keep_rows, type=pa.bool_()))

        return docs_ds_factory().map_batches(
            _gate, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )

    # ---- semi-join scale path --------------------------------------------
    def _doc_gram_counts(b: pa.Table) -> pa.Table:
        grams, ids, cnts = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            toks = (t or "").split(" ")
            total = len(toks) - n + 1
            if total <= 0:
                continue
            local: dict = {}
            for i in range(total):
                g = " ".join(toks[i : i + n])
                local[g] = local.get(g, 0) + 1
            grams.extend(local)
            cnts.extend(local.values())
            ids.extend([d] * len(local))
        gs = pd.Series(grams, dtype="object")
        return pa.table(
            {
                "gram": pa.array(grams, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
                "is_boiler": pa.array(np.zeros(len(ids), dtype=np.int8)),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _boiler_side(t: pa.Table) -> pa.Table:
        gs = t.column("gram").to_pandas()
        nrows = len(gs)
        return pa.table(
            {
                "gram": t.column("gram"),
                "doc_id": pa.array(np.full(nrows, -1, dtype=np.int64)),
                "cnt": pa.array(np.zeros(nrows, dtype=np.int64)),
                "is_boiler": pa.array(np.ones(nrows, dtype=np.int8)),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _semi_sum(g: pd.DataFrame) -> pa.Table:
        bg = g.loc[g["is_boiler"] == 1, "gram"].unique()
        rows = g.loc[g["is_boiler"] == 0, ["gram", "doc_id", "cnt"]]
        if len(bg) and not rows.empty:
            hit = rows.loc[rows["gram"].isin(bg)]
            part = hit.groupby("doc_id", sort=False)["cnt"].sum()
            ids = part.index.to_numpy(np.int64)
            nb = part.to_numpy(np.int64)
        else:
            ids = np.empty(0, dtype=np.int64)
            nb = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "val": pa.array(nb),
                "is_total": pa.array(np.zeros(ids.size, dtype=np.int8)),
                "dpart": pa.array((ids % _GRAM_PARTS).astype(np.int32)),
            }
        )

    def _totals(b: pa.Table) -> pa.Table:
        # token counts only — Arrow kernel, no Python shingle loop
        total = pc.subtract(
            pc.list_value_length(
                pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
            ),
            n - 1,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = total > 0
        ids, total = ids[keep], total[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "val": pa.array(total),
                "is_total": pa.array(np.ones(ids.size, dtype=np.int8)),
                "dpart": pa.array((ids % _GRAM_PARTS).astype(np.int32)),
            }
        )

    partials = (
        docs_ds_factory()
        .map_batches(_doc_gram_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .union(boiler_ds.map_batches(_boiler_side, batch_format="pyarrow",
                                     zero_copy_batch=True))
        .repartition(_GRAM_PARTS // 4)
        .groupby("gpart")
        .map_groups(_semi_sum, batch_format="pandas")
    )

    def _finish(g: pd.DataFrame) -> pa.Table:
        tot = g.loc[g["is_total"] == 1, ["doc_id", "val"]].rename(
            columns={"val": "n_grams"}
        )
        nb = (
            g.loc[g["is_total"] == 0]
            .groupby("doc_id", sort=False)["val"].sum()
            .rename("n_boiler")
        )
        out = tot.merge(nb, left_on="doc_id", right_index=True, how="left")
        out["n_boiler"] = out["n_boiler"].fillna(0).astype(np.int64)
        out["keep"] = (
            out["n_boiler"] * max_frac_den <= out["n_grams"] * max_frac_num
        )
        return _fpc(out[["doc_id", "n_grams", "n_boiler", "keep"]])

    return (
        docs_ds_factory()
        .map_batches(_totals, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=65536)
        .union(partials)
        .repartition(_GRAM_PARTS // 4)
        .groupby("dpart")
        .map_groups(_finish, batch_format="pandas")
    )


def repetition_gate(docs_ds, num: int = 2, den: int = 5):
    """Gopher-style repetition filter: keep docs whose duplicate-word
    fraction is at least num/den — i.e. ``den·(n_words − n_distinct) ≥
    num·n_words`` in INTEGER arithmetic (exactly DuckDB's
    ``length(string_split(text,' '))`` / ``length(list_distinct(...))``
    with the float threshold cleared by cross-multiplication, so both
    sides agree bit-for-bit). Templated/spammy corpora surface here; the
    inverted gate is the quality filter.

    Fully vectorized per batch: Arrow split_pattern (same empty-token
    semantics as DuckDB string_split), then one C-speed pandas
    drop_duplicates + groupby(size) over (parent, word) for the distinct
    counts — no Python loop over rows or tokens."""

    def _gate(b: pa.Table) -> pa.Table:
        texts = b.column("text")
        split = pc.split_pattern(texts, " ")
        n_words = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        dd = pd.DataFrame({"p": parent, "w": flat.to_pandas()})
        nd = dd.drop_duplicates().groupby("p", sort=True).size()
        n_distinct = np.zeros(b.num_rows, dtype=np.int64)
        n_distinct[nd.index.to_numpy()] = nd.to_numpy()
        nw = n_words.astype(np.int64)
        keep = den * (nw - n_distinct) >= num * nw
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": pa.array(nw),
                "n_distinct": pa.array(n_distinct),
            }
        ).filter(pa.array(keep))

    return docs_ds.map_batches(
        _gate, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


def _tfidf_topk_joined(docs_ds_factory, df_ds, k: int):
    """tfidf_topk's scale path (see its docstring): term-keyed cogroup
    attaches df to tf rows, doc-keyed cogroup takes the per-doc top-k. No
    driver vocabulary map at any size."""

    def _tf_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dd = pd.DataFrame({"p": parent, "term": flat.to_pandas()})
        dd = dd[dd["term"] != ""]
        tf = dd.groupby(["p", "term"], sort=False).size().reset_index(
            name="tf"
        )
        out = pd.DataFrame(
            {
                "term": tf["term"],
                "doc_id": doc_ids[tf["p"].to_numpy()],
                "tf": tf["tf"].astype(np.int64),
                "is_df": np.int8(0),
            }
        )
        out["gpart"] = _gpart(out["term"])
        return _fpc(out)

    def _df_side(t: pa.Table) -> pa.Table:
        gs = t.column("term").to_pandas()
        n = len(gs)
        return pa.table(
            {
                "term": t.column("term"),
                "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                # df rides in the tf column so the union schema matches
                "tf": t.column("df").cast(pa.int64()),
                "is_df": pa.array(np.ones(n, dtype=np.int8)),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _attach(g: pd.DataFrame) -> pa.Table:
        dfs = g.loc[g["is_df"] == 1, ["term", "tf"]].rename(
            columns={"tf": "df"}
        ).drop_duplicates("term")
        rows = g.loc[g["is_df"] == 0, ["term", "doc_id", "tf"]]
        if rows.empty or dfs.empty:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "term": pa.array([], type=pa.string()),
                 "tf": pa.array([], type=pa.int64()),
                 "df": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.int64()),
                 "dpart": pa.array([], type=pa.int32())}
            )
        m = rows.merge(dfs, on="term")  # every term has its df row
        m["score"] = (m["tf"].astype(np.int64) * 1_000_000) // m["df"]
        m["dpart"] = (
            m["doc_id"].to_numpy(np.int64) % _GRAM_PARTS
        ).astype(np.int32)
        return _fpc(m[["doc_id", "term", "tf", "df", "score", "dpart"]])

    def _doc_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True])
        top = g.groupby("doc_id", sort=False).head(k)
        return _fpc(top[["doc_id", "term", "tf", "df", "score"]])

    scored = (
        docs_ds_factory()
        .map_batches(_tf_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .union(df_ds.map_batches(_df_side, batch_format="pyarrow",
                                 zero_copy_batch=True))
        .repartition(_GRAM_PARTS // 4)
        .groupby("gpart")
        .map_groups(_attach, batch_format="pandas")
    )
    return (
        scored.repartition(_GRAM_PARTS // 4)
        .groupby("dpart")
        .map_groups(_doc_topk, batch_format="pandas")
    )


def tfidf_topk(docs_ds_factory, k: int = 3,
               broadcast_max: int = GRAM_BROADCAST_MAX):
    """Per-document keyword extraction: top-``k`` terms by an INTEGER-EXACT
    tf-idf-style weight ``score = tf·10⁶ // df`` (df = docs containing the
    term; the corpus-size factor N is constant per corpus, so it cannot
    change the ranking — dropping it keeps both sides in exact integer
    arithmetic instead of ULP-fragile logarithms). Ties break (score desc,
    term asc) on both sides.

    Pass 1 computes df with a vocabulary-bounded combiner: per-batch
    DISTINCT (doc, term) collapse → one (term, df_partial) row per term per
    batch → one coarse cogroup sum. The df DATASET is counted, then:
    - fast path (≤ ``broadcast_max`` distinct terms): the df map ships by
      closure capture; pass 2 is ONE streamed pass — per-batch tf via
      C-speed pandas (parent, term) groupby, score + per-doc top-k
      vectorized.
    - scale path (a 100-TB-class vocabulary): no driver df map. tf rows
      (doc_id, term, tf) cogroup-join the df dataset on crc(term) % parts
      to attach df and score, then re-cogroup on doc_id % parts for the
      per-doc top-k — two linear all-to-alls, bounded memory everywhere,
      identical output columns.
    Tokenization is single-space split with empties dropped == DuckDB
    ``string_split(text, ' ')``."""
    from ..common import cache_if_small

    # multi-pass source: one shared materialization below the budget
    docs_ds_factory = cache_if_small(docs_ds_factory)

    def _df_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        dd = pd.DataFrame({"p": parent, "term": flat.to_pandas()})
        dd = dd[dd["term"] != ""].drop_duplicates()
        vc = dd.groupby("term", sort=False).size()
        return pa.table(
            {
                "term": pa.array(vc.index, type=pa.string()),
                "df": pa.array(vc.to_numpy(np.int64)),
            }
        )

    from ..common import cogroup_agg

    def _df_ds():
        # vocabulary-cardinality keys: cogroup, not per-key agg
        return cogroup_agg(
            docs_ds_factory().map_batches(
                _df_partial, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536,
            ),
            "term", {"df": ("df", "sum")},
        )

    # capped streaming collection (decontaminate's pattern): driver memory
    # is bounded by the cap by construction; the scale path recomputes df
    # in-cluster (it never touches the driver there)
    chunks, n_terms, too_big = [], 0, False
    for bt in _df_ds().iter_batches(batch_format="pyarrow"):
        chunks.append(bt)
        n_terms += bt.num_rows
        if n_terms > broadcast_max:
            too_big = True
            break
    if too_big:
        return _tfidf_topk_joined(docs_ds_factory, _df_ds(), k)

    df_map = pa.concat_tables(chunks).to_pandas() if chunks else pd.DataFrame(
        {"term": [], "df": []}
    )
    df_lookup = dict(zip(df_map["term"], df_map["df"].astype(np.int64)))

    def _topk(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        dd = pd.DataFrame({"p": parent, "term": flat.to_pandas()})
        dd = dd[dd["term"] != ""]
        tf = dd.groupby(["p", "term"], sort=False).size().reset_index(name="tf")
        tf["df"] = tf["term"].map(df_lookup).astype("int64")
        tf["score"] = (tf["tf"].astype("int64") * 1_000_000) // tf["df"]
        tf = tf.sort_values(["p", "score", "term"],
                            ascending=[True, False, True])
        top = tf.groupby("p", sort=False).head(k)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[top["p"].to_numpy()]),
                "term": pa.array(top["term"], type=pa.string()),
                "tf": pa.array(top["tf"].to_numpy(np.int64)),
                "df": pa.array(top["df"].to_numpy(np.int64)),
                "score": pa.array(top["score"].to_numpy(np.int64)),
            }
        )

    return docs_ds_factory().map_batches(
        _topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


# ---------------------------------------------------------------------------
# inverted-index build + n-gram LM counts
# ---------------------------------------------------------------------------


def build_postings(docs_ds, min_df: int = 10, max_df: int | None = None):
    """Inverted-index construction — (term, df, postings) rows where
    ``postings`` is the ascending comma-joined doc_id list. The index-build
    primitive behind retrieval-augmented data curation (and the write side
    of every search stack).

    Shape: ONE vectorized pass (arrow split + list_parent_indices — no
    Python token loop) emits within-doc-distinct (term, doc_id) pairs, then
    one coarse crc(term) % parts cogroup builds each term's posting list
    with a single vectorized pandas groupby per partition. Only (term,
    int64) pairs cross the shuffle; posting strings are assembled on the
    reduce side. ``min_df`` prunes the singleton long tail; ``max_df``
    (when set) drops stopword-class terms — at web scale BOTH bounds are
    load-bearing: min_df bounds output cardinality, max_df bounds the
    longest posting string any single reduce row assembles. NULL text
    contributes nothing (SQL ``string_split(NULL)`` unnests to no rows)."""

    def _pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        split = pc.split_pattern(b.column("text"), " ")
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dd = pd.DataFrame(
            {"term": pc.list_flatten(split).to_pandas(),
             "doc_id": ids[parent]}
        ).drop_duplicates()
        dd["part"] = _gpart(dd["term"])
        return _fpc(dd)

    def _build(g: pd.DataFrame) -> pa.Table:
        # cross-batch duplicates of a (term, doc) pair collapse here
        g = g.drop_duplicates(["term", "doc_id"]).sort_values(
            ["term", "doc_id"]
        )
        gr = g.groupby("term", sort=False)
        out = pd.DataFrame(
            {
                "df": gr.size(),
                "postings": gr["doc_id"].agg(
                    lambda s: ",".join(map(str, s))
                ),
            }
        ).reset_index()
        out = out[out["df"] >= min_df]
        if max_df is not None:
            out = out[out["df"] <= max_df]
        out["df"] = out["df"].astype(np.int64)
        return _fpc(out[["term", "df", "postings"]])

    return (
        docs_ds.map_batches(_pairs, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536)
        .repartition(_GRAM_PARTS // 4)
        .groupby("part")
        .map_groups(_build, batch_format="pandas")
    )


def bigram_counts(docs_ds, top: int = 50):
    """Corpus-wide bigram occurrence counts, exact top-``top`` (count desc,
    bigram asc — bigram is unique so the cut is deterministic): the n-gram
    LM count-table primitive (quality heuristics, domain fingerprinting,
    classic LM smoothing inputs).

    Shape: one vectorized pass builds bigrams with pandas string concat on
    the flattened token array (adjacent tokens sharing a parent doc — no
    Python token loop) and combines per batch, then a coarse cogroup sum
    and a per-block partial top-k (no corpus-cardinality global sort)."""
    from ..common import cogroup_agg, topk_exact

    def _partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        split = pc.split_pattern(b.column("text"), " ")
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split).to_pandas()
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "partial": pa.array([], type=pa.int64())}
            )
        same = parent[1:] == parent[:-1]
        big = (flat.iloc[:-1].reset_index(drop=True) + " "
               + flat.iloc[1:].reset_index(drop=True))[same]
        counts = big.value_counts()
        return pa.table(
            {
                "bigram": pa.array(counts.index, type=pa.string()),
                "partial": pa.array(counts.to_numpy(np.int64)),
            }
        )

    agg = cogroup_agg(
        docs_ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=65536),
        "bigram", {"n": ("partial", "sum")},
    )
    return topk_exact(
        agg, [("n", "descending"), ("bigram", "ascending")], top
    )


def token_explode(docs_ds):
    """Row EXPLOSION of docs into (doc_id, token) rows — the flat_map /
    unnest primitive at the query level (the page-explosion shape the
    extraction engine uses, on text): one doc in, one row per
    whitespace-split token out, duplicates preserved (it's a multiset,
    and the oracle's multiset hash must match).

    Pure Arrow, zero Python row loop: split_pattern builds the list
    column, list_parent_indices + take fan the doc ids out, list_flatten
    yields the token column — all O(tokens) C kernels, streaming, no
    shuffle. Empty/NULL text explodes to ONE empty-token row on both
    sides (Arrow split_pattern('') == ['']; SQL string_split('', ' ')
    == [''])."""

    def _explode(b: pa.Table) -> pa.Table:
        texts = pc.coalesce(b.column("text"), pa.scalar(""))
        split = pc.split_pattern(texts, " ")
        parent = pc.list_parent_indices(split)
        return pa.table(
            {
                "doc_id": pc.take(b.column("doc_id"), parent),
                "token": pc.list_flatten(split),
            }
        )

    return docs_ds.map_batches(
        _explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def _rarity_joined(docs_ds_factory, cnt_ds, total: int):
    """token_rarity's scale path: term-keyed cogroup attaches the global
    count to per-doc tf rows, doc-keyed cogroup folds the per-doc sum —
    no driver vocabulary map at any size (tfidf's join shape)."""

    def _tf_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dd = pd.DataFrame({"p": parent, "term": flat.to_pandas()})
        dd = dd[dd["term"] != ""]
        tf = dd.groupby(["p", "term"], sort=False).size().reset_index(
            name="tf"
        )
        out = pd.DataFrame(
            {
                "term": tf["term"],
                "doc_id": doc_ids[tf["p"].to_numpy()],
                "tf": tf["tf"].astype(np.int64),
                "is_cnt": np.int8(0),
            }
        )
        out["gpart"] = _gpart(out["term"])
        return _fpc(out)

    def _cnt_side(t: pa.Table) -> pa.Table:
        gs = t.column("term").to_pandas()
        n = len(gs)
        return pa.table(
            {
                "term": t.column("term"),
                "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                # the global count rides in the tf column (union schema)
                "tf": t.column("c").cast(pa.int64()),
                "is_cnt": pa.array(np.ones(n, dtype=np.int8)),
                "gpart": pa.array(_gpart(gs)),
            }
        )

    def _attach(g: pd.DataFrame) -> pa.Table:
        cnts = g.loc[g["is_cnt"] == 1, ["term", "tf"]].rename(
            columns={"tf": "c"}
        ).drop_duplicates("term")
        rows = g.loc[g["is_cnt"] == 0, ["term", "doc_id", "tf"]]
        if rows.empty or cnts.empty:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "dpart": pa.array([], type=pa.int32())}
            )
        m = rows.merge(cnts, on="term")  # every term has its count row
        tf = m["tf"].to_numpy(np.int64)
        m["s"] = tf * (total * 1_000_000 // m["c"].to_numpy(np.int64))
        m["n"] = tf
        m["dpart"] = (
            m["doc_id"].to_numpy(np.int64) % _GRAM_PARTS
        ).astype(np.int32)
        return _fpc(m[["doc_id", "s", "n", "dpart"]])

    def _doc_fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("doc_id", sort=True, as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(agg["n"].to_numpy(np.int64)),
                "rarity_e6": pa.array(
                    agg["s"].to_numpy(np.int64)
                    // agg["n"].to_numpy(np.int64)
                ),
            }
        )

    return (
        docs_ds_factory()
        .map_batches(_tf_rows, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=65536)
        .union(cnt_ds.map_batches(_cnt_side, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .repartition(_GRAM_PARTS // 4)
        .groupby("gpart")
        .map_groups(_attach, batch_format="pandas")
        .repartition(_GRAM_PARTS // 4)
        .groupby("dpart")
        .map_groups(_doc_fold, batch_format="pandas")
    )


def token_rarity(docs_ds_factory, broadcast_max: int = GRAM_BROADCAST_MAX):
    """Per-document mean token rarity — the CCNet-perplexity-proxy
    quality signal made INTEGER-EXACT (same trick as tfidf_topk: a
    monotone integer surrogate instead of ULP-fragile logarithms):

        rarity_e6 = (Σ_occurrences total_tokens·10⁶ // cnt(term)) // n

    High scores = rare vocabulary (low unigram likelihood — candidate
    gibberish/OOV-heavy docs); low = stopword-heavy boilerplate. Both
    tails are the ones a quality gate trims. Tokenization is single-space
    split with empties dropped == DuckDB ``string_split(text, ' ')``;
    docs with zero tokens are excluded (no mean exists).

    Pass 1 builds global occurrence counts with a vocabulary-bounded
    combiner (per-batch value_counts → coarse cogroup sum); ``total``
    is a scalar Sum over that counts dataset. Pass 2 is count-gated
    like tfidf_topk: ≤ ``broadcast_max`` distinct terms ships the count
    map by closure; past it, ``_rarity_joined`` runs term-keyed +
    doc-keyed cogroups with no driver vocabulary map. int64 bound:
    ``total·10⁶`` must stay < 2⁶³ (total < 9.2e12 tokens); past that,
    drop the scale constant to 10³ — documented, not silent."""
    from ..common import cache_if_small

    # multi-pass source: one shared materialization below the budget
    docs_ds_factory = cache_if_small(docs_ds_factory)
    from ..common import cogroup_agg

    def _cnt_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
        flat = pc.list_flatten(toks).to_pandas()
        vc = flat[flat != ""].value_counts(sort=False)
        return pa.table(
            {
                "term": pa.array(vc.index, type=pa.string()),
                "c": pa.array(vc.to_numpy(np.int64)),
            }
        )

    def _cnt_ds():
        return cogroup_agg(
            docs_ds_factory().map_batches(
                _cnt_partial, batch_format="pyarrow",
                zero_copy_batch=True, batch_size=65536,
            ),
            "term", {"c": ("c", "sum")},
        )

    counts = _cnt_ds().materialize()  # vocab-cardinality; reused twice
    total = int(counts.sum("c") or 0)
    if total == 0:
        from ..common import typed_empty

        return typed_empty(doc_id=pa.int64(), n_tokens=pa.int64(),
                           rarity_e6=pa.int64())
    if counts.count() > broadcast_max:
        return _rarity_joined(docs_ds_factory, counts, total)

    cnt_map = dict(zip(*(
        counts.to_pandas()[c] for c in ("term", "c")
    )))

    def _score(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(b.column("text"), ""), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dd = pd.DataFrame({"p": parent, "term": flat.to_pandas()})
        dd = dd[dd["term"] != ""]
        if dd.empty:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tokens": pa.array([], type=pa.int64()),
                 "rarity_e6": pa.array([], type=pa.int64())}
            )
        c = dd["term"].map(cnt_map).to_numpy(np.int64)
        dd = dd.assign(occ=total * 1_000_000 // c)
        agg = dd.groupby("p", sort=True).agg(
            s=("occ", "sum"), n=("occ", "size")
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[agg.index.to_numpy()]),
                "n_tokens": pa.array(agg["n"].to_numpy(np.int64)),
                "rarity_e6": pa.array(
                    agg["s"].to_numpy(np.int64) // agg["n"].to_numpy(np.int64)
                ),
            }
        )

    return docs_ds_factory().map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=65536,
    )


def source_overlap(docs_ds, n: int = 3, coalesce: int = 4):
    """Cross-source duplication matrix — for every unordered source pair
    (a < b), the number of DISTINCT word ``n``-grams appearing in both
    sources. The corpus-lineage staple of multi-source training-data
    curation ("how much of source A is already in source B?") that
    decides dedup ordering and mixture weights between crawls/dumps.

    Shape: per-batch DISTINCT (gram, source) collapse (exact within-doc,
    a doc never splits across batches; cross-batch dups collapse at the
    cogroup), then ONE gram-keyed hash cogroup where each gram's distinct
    source set expands to pairs via a vectorized self-merge — fanout per
    gram is bounded by the SOURCE DIMENSION (a handful of crawls), never
    by corpus size — and pair counts pre-combine per partition before a
    tiny source-pair aggregate. Only (gram, source) pairs ever shuffle;
    the output is source-pair cardinality. Tokenization matches
    ``dup_phrases``: single-space split (empties kept inside grams), docs
    with < n tokens contribute nothing."""
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        seen = set()
        for t, s in zip(b.column("text").to_pylist(),
                        b.column("source").to_pylist()):
            toks = (t or "").split(" ")
            if len(toks) < n or s is None:
                continue
            for g in {" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)}:
                seen.add((g, s))
        if not seen:
            return pa.table(
                {"gram": pa.array([], type=pa.string()),
                 "source": pa.array([], type=pa.string()),
                 "gpart": pa.array([], type=pa.int32())}
            )
        grams = pd.Series([g for g, _ in seen])
        return pa.table(
            {
                "gram": pa.array(grams, type=pa.string()),
                "source": pa.array([s for _, s in seen], type=pa.string()),
                "gpart": pa.array(_gpart(grams)),
            }
        )

    def _pairs(g: pd.DataFrame) -> pa.Table:
        dd = g.drop_duplicates(["gram", "source"])[["gram", "source"]]
        m = dd.merge(dd, on="gram")
        m = m[m["source_x"] < m["source_y"]]
        if m.empty:
            return pa.table(
                {"source_a": pa.array([], type=pa.string()),
                 "source_b": pa.array([], type=pa.string()),
                 "partial": pa.array([], type=pa.int64())}
            )
        vc = m.groupby(["source_x", "source_y"], sort=False).size()
        idx = vc.index.to_frame(index=False)
        return pa.table(
            {
                "source_a": pa.array(idx["source_x"], type=pa.string()),
                "source_b": pa.array(idx["source_y"], type=pa.string()),
                "partial": pa.array(vc.to_numpy(np.int64)),
            }
        )

    return (
        docs_ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65536,
        )
        .repartition(_GRAM_PARTS // 4)
        .groupby("gpart")
        .map_groups(_pairs, batch_format="pandas")
        # source-pair cardinality is dimension² — tiny; coalesce keeps the
        # engine aggregate's sort ranges non-empty (heavy_hitters rule)
        .repartition(coalesce)
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("partial", alias_name="n_shared_grams"))
        .sort(["source_a", "source_b"])
    )
