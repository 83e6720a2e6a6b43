"""Blocking recall (VERDICT r2 item 1): the fuzzy key scheme must be
COMPLETE for the verification predicate — every pair the verifier would
match must be generated as a candidate (candidates ⊇ verified pairs), so
the engine resolves exactly what the reference's ES term-expansion
(``match`` + ``fuzziness``) would reach.

Covers: the catherine/katherine scenario (single-token, divergent first
letter) for fuzzy AND jaro_winkler, plus a randomized recall property over
adversarial edit patterns (first-letter edits, interior class-changing
edits, space deletion/insertion, 2-edit combos) at every length band of
the deletion/gram key scheme.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import clusters_of, make_docs
from zentity_spark.model import Model
from zentity_spark.pipeline import ResolutionJob
from zentity_spark.plans.compiler import Scope


def _model_one_attr(matcher_json: str) -> Model:
    return Model.parse("""
    {
      "attributes": {"name": {"type": "string", "params": {"normalizer": "name"}}},
      "resolvers": {"r": {"attributes": ["name"]}},
      "matchers": {"m": %s},
      "indices": {"a": {"fields": {"nm": {"attribute": "name", "matcher": "m"}}}}
    }
    """ % matcher_json)


FUZZY = '{"clause": {"match": {"{{ field }}": {"query": "{{ value }}", "fuzziness": "auto"}}}}'
JW = '{"type": "jaro_winkler", "params": {"threshold": 0.9}}'


def _docs(spark, values):
    return make_docs(spark, [
        (f"a-{i:06d}", [("nm", v)]) for i, v in enumerate(values)])


# ---------------------------------------------------------------------------
# scenario: single-token pair with a divergent first letter resolves
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("matcher", [FUZZY, JW], ids=["fuzzy", "jw"])
def test_catherine_katherine_resolves(spark, matcher):
    """JW ≈ 0.926, lev = 1 — the reference's fuzzy/jw semantics match this
    pair; round-2's key emission never paired it (VERDICT r2 missing #1)."""
    job = ResolutionJob(spark, _docs(spark, ["catherine", "katherine"]),
                        _model_one_attr(matcher), scope=Scope())
    cl = clusters_of(job.clusters())
    assert frozenset({"a-000000", "a-000001"}) in cl


def test_carton_carson_resolves_fuzzy(spark):
    """interior class-changing edit (t→s): shared no token, no exact key,
    different phonetic codes — only the deletion-neighborhood keys pair it."""
    job = ResolutionJob(spark, _docs(spark, ["carton", "carson"]),
                        _model_one_attr(FUZZY), scope=Scope())
    cl = clusters_of(job.clusters())
    assert frozenset({"a-000000", "a-000001"}) in cl


# ---------------------------------------------------------------------------
# property: fuzzy candidates ⊇ verified pairs on adversarial random edits
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lev_auto_match(a: str, b: str) -> bool:
    """the verification predicate (dialect.lev_within_auto): allowed edits
    by the SHORTER operand's length: <3 → 0, 3-5 → 1, ≥6 → 2."""
    n = min(len(a), len(b))
    k = 0 if n < 3 else (1 if n < 6 else 2)
    return _lev(a, b) <= k


def _mutate(rng: random.Random, v: str, n_edits: int) -> str:
    """n random single-char edits anywhere — including the first letter and
    spaces (token merge/split), the cases heuristic key schemes miss."""
    alpha = "abcdefghijklmnopqrstuvwxyz "
    for _ in range(n_edits):
        if not v:
            break
        op = rng.choice(["sub", "ins", "del"])
        pos = rng.randrange(len(v))
        c = rng.choice(alpha)
        if op == "sub":
            v = v[:pos] + c + v[pos + 1:]
        elif op == "ins":
            v = v[:pos] + c + v[pos:]
        else:
            v = v[:pos] + v[pos + 1:]
    # re-normalize like the 'name' normalizer would (collapse/trim spaces)
    return " ".join(v.split())


def test_fuzzy_blocking_recall_property(spark):
    """exhaustive ground truth vs blocked candidates on a corpus spanning
    every band of the key scheme (len 3-5 / 6-8 / 9+, cross-band pairs)."""
    rng = random.Random(20260817)
    bases = ["kim", "lee", "anna", "maria", "carton", "barton", "vasquez",
             "catherine", "montgomery", "john smith", "maria garcia lopez",
             "ab", "xu", "harrington",
             # len-12+ values: exercise the long-value f4 gram band and
             # its seam with f3 (VERDICT r3 next #1, re-cut round 5)
             "christopherson", "anastasia petrova", "constantinopolis",
             "alexandra fitzgerald montague"]
    values = []
    for b in bases:
        values.append(b)
        for n_edits in (1, 1, 2, 2):
            values.append(_mutate(rng, b, n_edits))
    values = sorted(set(v for v in values if v))
    docs = _docs(spark, values)
    job = ResolutionJob(spark, docs, _model_one_attr(FUZZY), scope=Scope())

    ids = {v: f"a-{i:06d}" for i, v in enumerate(values)}
    expected = set()
    for i, va in enumerate(values):
        for vb in values[i + 1:]:
            if _lev_auto_match(va, vb):
                expected.add(tuple(sorted((ids[va], ids[vb]))))

    got = {(r["doc_id_a"], r["doc_id_b"])
           for r in job.candidate_pairs().collect()}
    missing = expected - got
    assert not missing, f"blocking missed verified-matchable pairs: {sorted(missing)[:10]}"

    # and the verified edges agree exactly with the Python predicate
    edges = {(r["doc_id_a"], r["doc_id_b"])
             for r in job.match_edges().select("doc_id_a", "doc_id_b").collect()}
    assert edges == expected


def test_fixed_fuzziness_recall(spark):
    """fixed fuzziness bands: k=1 (all lengths) and k=2 (del≤2 ∪ grams).

    The explicit straddle values pin ADVICE r3 (high): fz=2 pairs with
    min len 4-5 vs max len 6-7 — e.g. 'abcde'/'abcdef' (lev 1) and
    'abcd'/'abcdef' (lev 2) — must share e2 deletion keys; round 3's
    del≤2 band [2,5] left them with zero shared key space (f2 grams
    start at len 6)."""
    straddle = {1: [], 2: ["abcd", "abcde", "abcdef", "abcdefg"]}
    for fz, k in (("1", 1), ("2", 2)):
        matcher = ('{"clause": {"match": {"{{ field }}": {"query": '
                   '"{{ value }}", "fuzziness": "{{ params.fuzziness }}"}}}, '
                   '"params": {"fuzziness": "%s"}}') % fz
        rng = random.Random(7 + k)
        bases = ["io", "ann", "olivia", "fernanda", "maximilian opal"]
        values = sorted({m for b in bases
                         for m in [b, _mutate(rng, b, 1), _mutate(rng, b, k)]
                         if m} | set(straddle[k]))
        job = ResolutionJob(spark, _docs(spark, values),
                            _model_one_attr(matcher), scope=Scope())
        ids = {v: f"a-{i:06d}" for i, v in enumerate(values)}
        expected = {tuple(sorted((ids[a], ids[b])))
                    for i, a in enumerate(values) for b in values[i + 1:]
                    if _lev(a, b) <= k}
        got = {(r["doc_id_a"], r["doc_id_b"])
               for r in job.candidate_pairs().collect()}
        assert expected <= got, f"fz={fz}: missing {sorted(expected - got)[:5]}"


def test_f2_band_boundaries_and_duplicate_grams(spark):
    """adversarial pins for the banded gram branches: the q-gram lemma
    with SET semantics (char_ngrams dedups) holds because
    set-disjointness destroys every POSITIONAL gram — each edit touches
    at most n of them, so zero shared gram strings forces
    lev > (min_len-n+1)/n >= 3 > 2 at each band's lower edge.  These are
    the cases where that argument is tightest: repeated-gram values, and
    pairs straddling every emission-band seam — e1/f2 (len 5/6), f2/f3
    (len 7-8), f3/f4 (len 14-15) — plus interior lengths of each band."""
    cases = [
        ("aaaaaa", "aaaaab"),        # dup grams: a emits only {aa}
        ("aaaaaa", "aabaab"),        # dup grams, 2 interior subs
        ("abcde", "zbcde"),          # len 5/5: k=1, e1 band only
        ("abcdef", "zbcdef"),        # len 6/6 first-letter sub: f2 must pair
        ("abcde", "abcdef"),         # 5 vs 6 cross e1-band pair (k=1 ins)
        ("abcdefghi", "abcdefghijk"),  # 9 vs 11: min 9 -> k=2, f3 shared
        ("abcdefgh", "abcdefghij"),    # 8 vs 10: f2 band both ends
        ("abcdefghij", "zzcdefghij"),  # len 10/10: 2 subs at f2 upper edge
        # f3 interior + the round-5 f3/f4 seam at len 14-15
        ("abcdefghijk", "abcdefghijklm"),    # 11 vs 13: f3 band [7,15]
        ("abcdefghijklm", "zzcdefghijklm"),  # 13/13 2 subs: f3 interior
        ("abcdefghijkl", "abcdefghijklmn"),  # 12 vs 14: f3 band both ends
        ("abcdefghijklm", "abcdefghijklmno"),   # 13 vs 15: f3 band seam
        ("abcdefghijklmn", "abcdefghijklmnop"),  # 14 vs 16: f4 band [14,∞)
        ("abcdefghijklmno", "abcdefghijklmnoqq"),  # 15 vs 17: f4 shared
        ("abcdefghijklmnop", "zzcdefghijklmnop"),  # 16/16 2 subs: f4 only
        ("abcdefghijklmnopqr", "abcdefghijklmnopqrtt"),  # 18 vs 20: f4 only
        # dup-gram adversary at the f4 lower edge (emits few distinct grams)
        ("aaaaaaaaaaaaaaaa", "aaaaaaaabaaaaaaab"),
    ]
    values = sorted({v for pair in cases for v in pair})
    job = ResolutionJob(spark, _docs(spark, values),
                        _model_one_attr(FUZZY), scope=Scope())
    ids = {v: f"a-{i:06d}" for i, v in enumerate(values)}
    got = {(r["doc_id_a"], r["doc_id_b"])
           for r in job.candidate_pairs().collect()}
    for a, b in cases:
        if not _lev_auto_match(a, b):
            continue
        pair = tuple(sorted((ids[a], ids[b])))
        assert pair in got, f"blocking missed {a!r} vs {b!r}"
