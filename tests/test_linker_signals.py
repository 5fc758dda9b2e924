"""Independent verification of the linker's corpus-dependent signals.

tests/test_linker_golden.py locks exact/fuzzy/context against the
reference's golden sample but can only assert cosine_similarity and
term_overlap structurally (the reference's full taxonomy isn't shipped,
so their df statistics aren't reproducible there — its scope note).

This file closes that gap from the other direction: a self-contained
taxonomy whose cosine TF-IDF (ref pdf_image_segmentation.py:2445-2583)
and term-overlap x IDF (ref :2402-2443) scores are recomputed here with
plain dict/loop arithmetic — no shared vector code with the production
linker, which precomputes a dense matrix and scores via one matvec
(linker/concepts.py). Any drift between the optimized path and the
reference formulas fails these asserts.
"""
import math

import pytest

from synapta_tpu.config import LinkerConfig
from synapta_tpu.linker.concepts import (
    ConceptLinker,
    extract_terms,
    parse_concept_name,
)

TAX = [
    # Chosen so several concepts score strictly BELOW the reference's
    # min(score/max, 1.0) clamp (partial primary hits, sparse context
    # hits) — clamped-at-1 rows can't distinguish weight drift.
    {"Level": "1", "Concept": "Portfolio Diversification",
     "Tag(s)": "hedging spreading", "Page(s)": "10"},
    {"Level": "2", "Concept": "Expected Return",
     "Tag(s)": "mean probability", "Page(s)": "11"},
    {"Level": "1", "Concept": "Risk-Free Rate",
     "Tag(s)": "treasury baseline", "Page(s)": "12"},
    {"Level": "3", "Concept": "Efficient Frontier",
     "Tag(s)": "variance minimization", "Page(s)": "13"},
    {"Level": "2", "Concept": "Capital Allocation Line",
     "Tag(s)": "slope reward", "Page(s)": "14"},
    {"Level": "2", "Concept": "Sharpe Performance Measure",
     "Tag(s)": "slope variability", "Page(s)": "15"},
]

CTX = {
    "caption": "Figure 7.1 Portfolio risk and expected outcomes",
    "summary": "Spreading wealth lowers variance; the risk-free rate "
               "anchors the capital line.",
    "ocr": "expected value % portfolio variance",
    "nearby": "The slope of the line reflects reward per unit of risk.",
}
CTX["combined_text"] = " ".join(
    CTX[k] for k in ("caption", "summary", "ocr", "nearby")
)


def _naive_stats(cfg):
    """Recompute df / idf / per-concept term sets with plain loops."""
    concepts = []
    for row in TAX:
        parsed = parse_concept_name(row["Concept"])
        primary = extract_terms(parsed["main"])
        context = extract_terms(row["Tag(s)"])
        all_terms = set(primary) | set(context) | set(parsed["acronyms"])
        for alias in parsed["aliases"]:
            all_terms |= extract_terms(alias)
        concepts.append(
            {"name": row["Concept"], "primary": primary,
             "context": context, "all": all_terms}
        )
    df = {}
    for c in concepts:
        for t in c["all"]:
            df[t] = df.get(t, 0) + 1

    def idf(term):
        # ref :2572-2583: log((N+1)/(df+1)) + 1, df default 1
        return math.log((len(concepts) + 1) / (df.get(term, 1) + 1)) + 1.0

    return concepts, idf


def _naive_cosine(cfg, concepts, idf):
    """Reference cosine TF-IDF (ref :2445-2541): weighted search TF over
    caption/summary/ocr/nearby, concept TF primary 2.0 / context 1.0,
    both x IDF; full-vector norms (search norm includes out-of-vocab
    terms); dot over shared terms."""
    counts = {}
    for field, w in zip(("caption", "summary", "ocr", "nearby"),
                        cfg.context_weights):
        for t in extract_terms(CTX[field]):
            counts[t] = counts.get(t, 0.0) + w
    total = sum(counts.values())
    svec = {t: (n / total) * idf(t) for t, n in counts.items()}
    snorm = math.sqrt(sum(v * v for v in svec.values()))
    out = []
    for c in concepts:
        cc = {}
        for t in c["primary"]:
            cc[t] = cc.get(t, 0.0) + cfg.concept_primary_weight
        for t in c["context"]:
            cc[t] = cc.get(t, 0.0) + cfg.concept_context_weight
        ctotal = sum(cc.values())
        cvec = {t: (n / ctotal) * idf(t) for t, n in cc.items()}
        cnorm = math.sqrt(sum(v * v for v in cvec.values()))
        dot = sum(v * cvec.get(t, 0.0) for t, v in svec.items())
        cos = dot / (snorm * cnorm) if snorm and cnorm else 0.0
        out.append(min(max(cos, 0.0), 1.0))
    return out


def _naive_overlap(cfg, concepts, idf):
    """Reference term overlap x IDF (ref :2402-2443): primary hit 1.0,
    context hit 0.5, normalized by the sum of primary IDFs."""
    search = extract_terms(CTX["combined_text"])
    out = []
    for c in concepts:
        score = 0.0
        for t in c["primary"]:
            if t in search:
                score += 1.0 * idf(t)
        for t in c["context"]:
            if t in search and t not in c["primary"]:
                score += 0.5 * idf(t)
        denom = sum(idf(t) for t in c["primary"])
        out.append(min(score / denom, 1.0) if denom else 0.0)
    return out


@pytest.fixture(scope="module")
def linked():
    cfg = LinkerConfig()
    linker = ConceptLinker(TAX, cfg)
    # score_threshold 0 so every concept's breakdown is observable
    linker.cfg = type(cfg)(**{**cfg.__dict__, "score_threshold": 0.0})
    matches = linker.link_context(dict(CTX))
    return cfg, {m["concept_name"]: m["match_details"] for m in matches}


def test_cosine_matches_naive_reference_formula(linked):
    cfg, by_name = linked
    concepts, idf = _naive_stats(cfg)
    expected = _naive_cosine(cfg, concepts, idf)
    checked = 0
    for c, want in zip(concepts, expected):
        got = by_name.get(c["name"])
        if got is None:  # generic-term gate may drop a concept
            continue
        assert got["cosine_similarity"] == pytest.approx(
            want * cfg.cosine_weight, abs=1e-9
        ), c["name"]
        checked += 1
    assert checked >= 4


def test_overlap_matches_naive_reference_formula(linked):
    cfg, by_name = linked
    concepts, idf = _naive_stats(cfg)
    expected = _naive_overlap(cfg, concepts, idf)
    checked = 0
    for c, want in zip(concepts, expected):
        got = by_name.get(c["name"])
        if got is None:
            continue
        assert got["term_overlap"] == pytest.approx(
            want * cfg.overlap_weight, abs=1e-9
        ), c["name"]
        checked += 1
    assert checked >= 4


def test_signals_nontrivial(linked):
    """The fixture must actually exercise both signals (nonzero spread)."""
    _, by_name = linked
    cosines = sorted(d["cosine_similarity"] for d in by_name.values())
    overlaps = sorted(d["term_overlap"] for d in by_name.values())
    assert cosines[-1] > 0 and cosines[-1] != cosines[0]
    assert overlaps[-1] > 0 and overlaps[-1] != overlaps[0]
