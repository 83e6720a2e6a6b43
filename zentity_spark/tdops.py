"""Training-data pipeline operators over the driver's ``documents`` and
``embeddings`` tables: deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard), text analysis (stats, quality, language-ID, fingerprinting), and
embedding similarity search (brute-force cosine top-k baseline, sign-LSH
bucketed ANN as the scale path, IVF as the handoff once the LSH table cap
binds — measured in BENCH/ann_recall.json).

Every op is a dual-dialect SQL builder (like plans/compiler.py): the Spark
query and the DuckDB oracle render from the same code, and all hashing goes
through ``dialect.md5_int64`` so the two engines agree bit-for-bit.  All
floating-point outputs are either ratios of integers or products/sums
rendered in a fixed fold order, so doubles agree bitwise too.

Scale notes (10^12-doc thinking, SURVEY §5.3 applies):
  * MinHash/SimHash candidate generation is LSH-bucketed — candidate pairs
    come from equi-joins on band/chunk keys (shuffle on key), never from a
    cross join.  Only the brute-force cosine top-k baseline is quadratic,
    and it exists as the small-scale oracle for the ANN path.
  * Shingle explosion is bounded: DISTINCT shingles per doc, K hash reps.
  * All expressions are native SQL (JVM codegen on Spark) — no Python.
"""

from __future__ import annotations

import hashlib
import math

from zentity_spark import dialect as D

MINHASH_K = 16          # ORACLE-TIER minhash permutations (kept small so
                        # the DuckDB side-by-side stays cheap; candidate
                        # recall at j = τ is only ~0.28 — a parity demo)
MINHASH_BANDS = 8       # → rows-per-band r = K / BANDS = 2
MINHASH_K_PROD = 128    # PRODUCTION tier: 128 permutations
MINHASH_BANDS_PROD = 64 # → r = 2, b = 64.  Candidate P(j) = 1-(1-j²)^64:
                        # 0.93 at j = 0.2 (= τ), ≈1.0 at j ≥ 0.3.  NOTE
                        # r = 4 / b = 32 (same K) would give P(0.2) ≈ 0.05
                        # — banding must target the verify threshold
                        # (S-curve midpoint (1/b)^(1/r) = 0.125 < τ), so
                        # more bands of 2 rows, not fewer of 4.
JACCARD_TAU = 0.2       # verify threshold for near-dup pairs
MINHASH_K_LOWBG = 864     # LOW-BACKGROUND tier (BENCH/MINHASH_SCALE.md
MINHASH_BANDS_LOWBG = 288 # remedy, priced round 4): r = 3, b = 288 keeps
                          # recall at the verify threshold — P(j=0.2) =
                          # 1-(1-0.2³)^288 = 0.90 — while suppressing the
                          # measured j≈0.03 background admissions 7.2×
                          # (P(0.03): r=2/b=64 0.056 → r=3/b=288 0.0077).
MINHASH_SHINGLE_W_LOWBG = 5  # 5-token shingles kill the superlinear
                          # template-text candidate term at its source: a
                          # shared 3-gram inside boilerplate is no longer a
                          # shared shingle unless 5 consecutive tokens match.
NGRAM_DF_CAP = 100      # shingles in more docs than this are not candidate
                        # keys (a boilerplate shingle shared by 10⁶ docs
                        # would otherwise make a 10¹² pair block); verify
                        # still uses FULL shingle sets, so only pairs whose
                        # EVERY shared shingle is hot lose recall
SIMHASH_BITS = 48       # md5_int64 yields 60 usable bits; 48 keeps the
                        # chunk weights in BIGINT and halves the collision
                        # rate of a 32-bit signature at 10⁹+ docs
SIMHASH_CHUNKS = 8      # 6-bit chunks: ham ≤ 6 over 8 chunks leaves ≥ 2
                        # chunks intact (pigeonhole) → guaranteed recall,
                        # not the heuristic a 4-chunk split gave
SIMHASH_MAXHAM = 6
FP_K = 4                # bottom-k fingerprint size
TOPK = 5                # neighbors per vector
ANN_TABLES = 4          # banded sign-LSH: independent hash tables; a pair
                        # is a candidate if it collides in ANY table —
                        # multi-probe recall a single 12-bit table lacks
ANN_BITS = 10           # hyperplanes per table → 1024 buckets per table
ANN_COS_TAU = 0.0       # report all in-bucket pairs above this cosine
IVF_TARGET_CELL_ROWS = 256  # IVF: expected home-assignment rows per cell
IVF_MAX_CELLS = 65536   # flat IVF: beyond ~16.7M rows occupancy grows
                        # linearly with N again; past that the declared
                        # handoff is sql_embed_ivf2 (hierarchical IVF —
                        # per-level cell caps multiply, and assignment
                        # work drops from N·K to N·(k1 + nprobe1·k2))
IVF_MAX_PROBE = 16      # query-side multi-probe ceiling (raised r5: the
                        # 1M tier needs nprobe=16 for recall ≥ 0.9 —
                        # measured 0.9234 at 0.82% of brute-force work)
IVF_DEEP_PROBE_ROWS = 300_000  # above this, boundary-pair mass at fixed
                        # occupancy erodes recall: measured nprobe=8 recall
                        # 0.99/0.97 at 20k/100k but 0.86 at 1M, so sizing
                        # doubles the probe depth past this tier
IVF_LLOYD_ITERS = 2     # default Lloyd refinements (measured at identical
                        # candidate work: N=100k recall .857→.944→.966,
                        # N=1M .673→.782→.862 for 0/1/2 iterations)

STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "on", "for", "with")
LANG_STOPS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
}


def _sty(dialect: str) -> str:
    return "VARCHAR" if dialect == D.DUCKDB else "STRING"


def _toks(c: str, dialect: str) -> str:
    return D.tokens(c, dialect)


def _shingle_list(tk: str, dialect: str, w: int = 3) -> str:
    """``w``-token shingles of a token array (w = 3 default; the low-
    background MinHash tier uses w = 5)."""
    offs = range(w)
    if dialect == D.DUCKDB:
        elem = lambda i: f"{tk}[CAST({i} AS INTEGER)]"
        body = " || ' ' || ".join(elem(f"i + {o}") if o else elem("i")
                                  for o in offs)
        return (f"CASE WHEN len({tk}) < {w} THEN [] ELSE "
                f"list_transform(range(1, len({tk}) - {w - 2}), i -> "
                f"{body}) END")
    elem = lambda i: f"element_at({tk}, {i})"
    body = ", ' ', ".join(elem(f"i + {o}") if o else elem("i") for o in offs)
    return (f"CASE WHEN size({tk}) < {w} THEN array() ELSE "
            f"transform(sequence(1, size({tk}) - {w - 1}), i -> "
            f"concat({body})) END")


def _contains(lst: tuple, item: str, dialect: str) -> str:
    lits = ", ".join(f"'{w}'" for w in lst)
    if dialect == D.DUCKDB:
        return f"list_contains([{lits}], {item})"
    return f"array_contains(array({lits}), {item})"


def _count_in(tk: str, words: tuple, dialect: str) -> str:
    if dialect == D.DUCKDB:
        return f"len(list_filter({tk}, w -> {_contains(words, 'w', dialect)}))"
    return f"size(filter({tk}, w -> {_contains(words, 'w', dialect)}))"


def _seq(n: int, dialect: str) -> str:
    """0..n-1 as a one-column relation named j."""
    if dialect == D.DUCKDB:
        return f"SELECT unnest(range(0, {n})) AS j"
    return f"SELECT explode(sequence(0, {n - 1})) AS j"


def _explode(list_sql: str, src: str, alias: str, dialect: str) -> str:
    ex = "unnest" if dialect == D.DUCKDB else "explode"
    return f"SELECT doc_id, {ex}({list_sql}) AS {alias} FROM {src}"


def _with(ctes: list, select: str) -> str:
    body = ",\n".join(f"{n} AS ({s})" for n, s in ctes)
    return f"WITH {body}\n{select}" if ctes else select


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def sql_text_stats(rel: str, dialect: str) -> str:
    """per-doc token/char counts + a BPE-ish subtoken count (runs of
    lowercase letters or digits, the regex stand-in for a learned-merge
    tokenizer)."""
    tk = _toks("text", dialect)
    size = "len" if dialect == D.DUCKDB else "size"
    dist = "list_distinct" if dialect == D.DUCKDB else "array_distinct"
    return (
        f"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        f"CAST({size}({tk}) AS BIGINT) AS n_tokens, "
        f"CAST({size}({dist}({tk})) AS BIGINT) AS n_uniq_tokens, "
        f"CAST({D.regexp_count('text', '[a-z]+|[0-9]+', dialect)} AS BIGINT) AS n_subtokens "
        f"FROM {rel}"
    )


def sql_text_quality(rel: str, dialect: str) -> str:
    """quality signals: stopword ratio, mean token length, repetition ratio
    (1 - uniq/total).  All ratios of integers → bit-identical doubles."""
    tk = _toks("text", dialect)
    size = "len" if dialect == D.DUCKDB else "size"
    dist = "list_distinct" if dialect == D.DUCKDB else "array_distinct"
    n = f"CAST({size}({tk}) AS DOUBLE)"
    nstop = f"CAST({_count_in(tk, STOPWORDS, dialect)} AS DOUBLE)"
    nuniq = f"CAST({size}({dist}({tk})) AS DOUBLE)"
    return (
        f"SELECT doc_id, "
        f"({nstop} / {n}) AS stopword_ratio, "
        f"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / {n}) AS mean_token_len, "
        f"(1.0 - {nuniq} / {n}) AS repetition_ratio "
        f"FROM {rel} WHERE {size}({tk}) > 0"
    )


def sql_lang_id(rel: str, dialect: str) -> str:
    """n-gram-free heuristic language ID: stopword hit counts per language,
    argmax with lexicographic tie-break."""
    tk = _toks("text", dialect)
    cs = {lang: _count_in(tk, words, dialect)
          for lang, words in LANG_STOPS.items()}
    return (
        "SELECT doc_id, CASE "
        f"WHEN c_en >= c_de AND c_en >= c_fr THEN 'en' "
        f"WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS lang_pred, "
        "CAST(c_en AS BIGINT) AS n_hits_en FROM ("
        f"SELECT doc_id, {cs['en']} AS c_en, {cs['de']} AS c_de, "
        f"{cs['fr']} AS c_fr FROM {rel})"
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def sql_exact_dupes(rel: str, dialect: str) -> str:
    """exact dedup: hash-groupBy on md5(text); canonical = min doc_id of the
    group (at scale: one shuffle on the hash, no pairs materialized)."""
    return (
        "SELECT doc_id, text_hash, "
        "min(doc_id) OVER (PARTITION BY text_hash) AS canonical_id FROM ("
        f"SELECT doc_id, md5(text) AS text_hash FROM {rel})"
    )


def _shingle_ctes(rel: str, dialect: str, w: int = 3) -> list:
    tk = _toks("text", dialect)
    return [
        ("toks", f"SELECT doc_id, {tk} AS tk FROM {rel}"),
        ("sh", "SELECT DISTINCT doc_id, shingle FROM ("
               + _explode(_shingle_list("tk", dialect, w), "toks", "shingle",
                          dialect)
               + ")"),
    ]


def _jaccard_verify_sql(dialect: str) -> list:
    """cand(a, b) + sh → verified pairs with exact shingle-set Jaccard."""
    return [
        ("nsh", "SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id"),
        ("inter", "SELECT c.a, c.b, count(*) AS ninter FROM cand c "
                  "JOIN sh sa ON sa.doc_id = c.a "
                  "JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle "
                  "GROUP BY c.a, c.b"),
        ("verified",
         "SELECT i.a AS doc_id_a, i.b AS doc_id_b, "
         "(CAST(i.ninter AS DOUBLE) / CAST(na.n + nb.n - i.ninter AS DOUBLE)) AS jaccard "
         "FROM inter i JOIN nsh na ON na.doc_id = i.a "
         "JOIN nsh nb ON nb.doc_id = i.b"),
    ]


def _minhash_cand_ctes(dialect: str, k: int, bands: int) -> list:
    """sh → LSH candidate pairs (cand): K hash reps → bands of r = K/bands
    rows → band-key equi-join.  The band key is an order-insensitive XOR of
    per-(rep, minhash) hashes, so banding needs no ordered string-agg
    (portable + shuffle-friendly)."""
    sty = _sty(dialect)
    h = D.md5_int64(f"(shingle || '#' || CAST(j AS {sty}))", dialect)
    bk = D.md5_int64(f"(CAST(j AS {sty}) || ':' || CAST(h AS {sty}))", dialect)
    r = k // bands
    return [
        ("js", _seq(k, dialect)),
        ("mh", f"SELECT doc_id, j, min({h}) AS h "
               "FROM sh CROSS JOIN js GROUP BY doc_id, j"),
        ("bands", f"SELECT doc_id, CAST(floor(j / {r}) AS INT) AS band, "
                  f"bit_xor({bk}) AS band_key FROM mh GROUP BY doc_id, "
                  f"CAST(floor(j / {r}) AS INT)"),
        ("cand", "SELECT DISTINCT a.doc_id AS a, b.doc_id AS b "
                 "FROM bands a JOIN bands b ON a.band = b.band "
                 "AND a.band_key = b.band_key AND a.doc_id < b.doc_id"),
    ]


def sql_shingles(rel: str, dialect: str, w: int = 3) -> str:
    """per-doc DISTINCT ``w``-token shingles — the per-document stage an
    incremental fold can append (stage(D ∪ Δ) = stage(D) ∪ stage(Δ))."""
    return _with(_shingle_ctes(rel, dialect, w),
                 "SELECT doc_id, shingle FROM sh")


def sql_minhash_bands(rel: str, dialect: str, k: int = MINHASH_K,
                      bands: int = MINHASH_BANDS, shingle_w: int = 3) -> str:
    """per-doc LSH band keys (doc_id, band, band_key) — corpus-independent
    per-document derivation, so an incremental fold's Δ band keys equal
    the batch computation's rows for those docs exactly."""
    ctes = (_shingle_ctes(rel, dialect, shingle_w)
            + _minhash_cand_ctes(dialect, k, bands))
    keep = [c for c in ctes if c[0] != "cand"]   # all-pairs join not needed
    return _with(keep, "SELECT doc_id, band, band_key FROM bands")


def sql_minhash_pairs(rel: str, dialect: str, k: int = MINHASH_K,
                      bands: int = MINHASH_BANDS,
                      tau: float = JACCARD_TAU, shingle_w: int = 3) -> str:
    """MinHash + LSH near-dup pairs: LSH candidates (``_minhash_cand_ctes``)
    → exact-Jaccard verify ≥ tau.  Defaults are the cheap oracle tier;
    production deployments pass k = MINHASH_K_PROD / bands =
    MINHASH_BANDS_PROD (candidate recall ≥ 0.9 at j = τ, pinned by
    tests/test_tdops.py::test_minhash_prod_candidate_recall)."""
    ctes = (_shingle_ctes(rel, dialect, shingle_w)
            + _minhash_cand_ctes(dialect, k, bands)
            + _jaccard_verify_sql(dialect))
    return _with(ctes, "SELECT doc_id_a, doc_id_b, jaccard FROM verified "
                       f"WHERE jaccard >= {tau!r}")


def sql_minhash_prod_pairs(rel: str, dialect: str) -> str:
    """production-tier MinHash near-dup pairs (K=128, b=64, r=2)."""
    return sql_minhash_pairs(rel, dialect, k=MINHASH_K_PROD,
                             bands=MINHASH_BANDS_PROD)


def sql_minhash_lowbg_pairs(rel: str, dialect: str) -> str:
    """LOW-BACKGROUND MinHash tier — BENCH/MINHASH_SCALE.md's priced remedy
    for the measured superlinear candidate admissions on template-heavy text,
    shipped as a first-class op: (K=864, b=288, r=3) holds candidate recall
    ≥ 0.9 at j = τ = 0.2 while cutting j≈0.03 background band admissions
    7.2× vs the r=2 prod tier, and w=5-token shingles remove the shared-
    boilerplate N² candidate term at its source.  Jaccard here is over the
    5-shingle sets (a strictly sharper near-dup notion than the 3-shingle
    tiers — boilerplate overlap scores lower, true near-dups barely move)."""
    return sql_minhash_pairs(rel, dialect, k=MINHASH_K_LOWBG,
                             bands=MINHASH_BANDS_LOWBG,
                             shingle_w=MINHASH_SHINGLE_W_LOWBG)


def sql_ngram_jaccard_pairs(rel: str, dialect: str,
                            df_cap: int = NGRAM_DF_CAP) -> str:
    """n-gram Jaccard near-dup: candidates from any shared NON-HOT shingle
    (inverted-index join — the blocking key IS the shingle), verified ≥ tau
    over the FULL shingle sets.

    The document-frequency cap bounds the inverted-index join: a shingle in
    d docs contributes ≤ d²/2 candidate rows, so hot boilerplate shingles
    (d ~ 10⁶ at corpus scale) are excluded from candidate generation.
    Recall loss is confined to pairs ALL of whose shared shingles are hot —
    near-dups share many shingles, so a true near-dup pair is lost only if
    every one of them exceeds the cap."""
    ctes = _shingle_ctes(rel, dialect) + [
        ("sh_cold", "SELECT shingle FROM sh GROUP BY shingle "
                    f"HAVING count(*) <= {df_cap}"),
        ("cand", "SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b "
                 "FROM sh sa JOIN sh_cold c ON c.shingle = sa.shingle "
                 "JOIN sh sb ON sb.shingle = sa.shingle "
                 "AND sa.doc_id < sb.doc_id"),
    ] + _jaccard_verify_sql(dialect)
    return _with(ctes, "SELECT doc_id_a, doc_id_b, jaccard FROM verified "
                       f"WHERE jaccard >= {JACCARD_TAU!r}")


def _simhash_ctes(rel: str, dialect: str) -> list:
    h = D.md5_int64("shingle", dialect)
    bit = f"({D.shiftright('h', 'j', dialect)} & 1)"
    w = D.shiftleft("CAST(1 AS BIGINT)", "j", dialect)
    return _shingle_ctes(rel, dialect) + [
        ("shh", f"SELECT doc_id, {h} AS h FROM sh"),
        ("js", _seq(SIMHASH_BITS, dialect)),
        ("bitsum", f"SELECT doc_id, j, "
                   f"{D.sum_bigint(f'CASE WHEN {bit} = 1 THEN 1 ELSE -1 END', dialect)} AS s "
                   "FROM shh CROSS JOIN js GROUP BY doc_id, j"),
        ("simh", f"SELECT doc_id, "
                 f"{D.sum_bigint(f'CASE WHEN s >= 0 THEN {w} ELSE 0 END', dialect)} "
                 "AS simhash FROM bitsum GROUP BY doc_id"),
    ]


def sql_simhash(rel: str, dialect: str) -> str:
    return _with(_simhash_ctes(rel, dialect),
                 "SELECT doc_id, simhash FROM simh")


def sql_simhash_pairs(rel: str, dialect: str) -> str:
    """SimHash near-dup pairs: LSH block on 8-bit chunks of the signature
    (a pair within hamming ≤ 6 of a 32-bit hash shares ≥1 exact chunk only
    heuristically — chunking is the standard recall/cost trade), verify
    hamming ≤ max."""
    cw = SIMHASH_BITS // SIMHASH_CHUNKS
    chunk = f"({D.shiftright('simhash', f'({cw} * c)', dialect)} & {(1 << cw) - 1})"
    ham = f"bit_count({D.bxor('a.simhash', 'b.simhash', dialect)})"
    ctes = _simhash_ctes(rel, dialect) + [
        ("cs", _seq(SIMHASH_CHUNKS, dialect).replace(" AS j", " AS c")),
        ("chunks", f"SELECT doc_id, simhash, c, {chunk} AS chunk_val "
                   "FROM simh CROSS JOIN cs"),
        ("cand", "SELECT DISTINCT a.doc_id AS a, a.simhash, b.doc_id AS b, "
                 "b.simhash AS simhash_b FROM chunks a JOIN chunks b "
                 "ON a.c = b.c AND a.chunk_val = b.chunk_val "
                 "AND a.doc_id < b.doc_id"),
    ]
    return _with(ctes,
                 "SELECT a AS doc_id_a, b AS doc_id_b, CAST(hamming AS INT) AS hamming FROM ("
                 f"SELECT DISTINCT a, b, bit_count({D.bxor('simhash', 'simhash_b', dialect)}) AS hamming "
                 f"FROM cand) WHERE hamming <= {SIMHASH_MAXHAM}")


def sql_fingerprint(rel: str, dialect: str) -> str:
    """bottom-k document fingerprint (winnowing-style sketch): the k
    smallest shingle hashes per doc, exploded as (doc_id, rank, fp)."""
    h = D.md5_int64("shingle", dialect)
    ctes = _shingle_ctes(rel, dialect) + [
        ("shh", f"SELECT DISTINCT doc_id, {h} AS h FROM sh"),
        ("ranked", "SELECT doc_id, h, row_number() OVER "
                   "(PARTITION BY doc_id ORDER BY h) AS rn FROM shh"),
    ]
    return _with(ctes,
                 f"SELECT doc_id, CAST(rn AS INT) AS rank, h AS fp "
                 f"FROM ranked WHERE rn <= {FP_K}")


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------

def _dot(ea: str, eb: str, dialect: str) -> str:
    """double-precision dot product with a FIXED left-fold order so Spark
    and DuckDB produce bit-identical doubles."""
    if dialect == D.DUCKDB:
        prods = (f"list_transform(range(1, len({ea}) + 1), i -> "
                 f"CAST({ea}[CAST(i AS INTEGER)] AS DOUBLE) * "
                 f"CAST({eb}[CAST(i AS INTEGER)] AS DOUBLE))")
        return f"list_reduce({prods}, (x, y) -> x + y)"
    return (f"aggregate(zip_with({ea}, {eb}, (x, y) -> "
            f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def _norm_cte(rel: str, dialect: str):
    return ("vecs", f"SELECT vec_id, embedding, "
                    f"sqrt({_dot('embedding', 'embedding', dialect)}) AS nrm "
                    f"FROM {rel}")


def sql_embed_topk(rel: str, dialect: str) -> str:
    """brute-force cosine top-k — the quadratic baseline/oracle.  The scale
    path is sql_embed_ann below; this one exists to verify it."""
    dot = _dot("a.embedding", "b.embedding", dialect)
    ctes = [
        _norm_cte(rel, dialect),
        ("cos", f"SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
                f"({dot} / (a.nrm * b.nrm)) AS cosine "
                "FROM vecs a JOIN vecs b ON a.vec_id <> b.vec_id"),
        ("ranked", "SELECT vec_id, neighbor_id, cosine, row_number() OVER "
                   "(PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) "
                   "AS rn FROM cos"),
    ]
    return _with(ctes,
                 f"SELECT vec_id, neighbor_id, cosine, CAST(rn AS INT) AS rank "
                 f"FROM ranked WHERE rn <= {TOPK}")


def _rademacher(table: int, bit: int, dim: int) -> list:
    """deterministic ±1 hyperplane from md5 — same constants in both
    dialect renders."""
    out = []
    for i in range(dim):
        hx = hashlib.md5(f"ann/{table}/{bit}/{i}".encode()).hexdigest()
        out.append(1.0 if int(hx[:2], 16) & 1 else -1.0)
    return out


def ann_params_for(n_rows: int, cos_tau: float = 0.7, miss: float = 0.25,
                   target_bucket_rows: int = 32, min_bits: int = 6,
                   max_bits: int = 24, max_tables: int = 32) -> tuple:
    """(tables, bits) sizing for sql_embed_ann at a given corpus size
    (VERDICT r3 weak #3: bits/table must grow with N, and recall must be
    re-bought with tables as it does).

    bits: hold expected bucket occupancy ≈ target_bucket_rows, i.e.
    bits = log2(N / target) — per-table candidate work stays
    ~tables · N · target/2 instead of growing quadratically.
    tables: a pair at cosine θ agrees on one hyperplane with
    p = 1 − acos(θ)/π, survives one table with p^bits, and is MISSED by
    all L tables with (1 − p^bits)^L ≤ miss ⇒
    L = ceil(ln miss / ln(1 − p^bits)).

    Both are capped (bits ≤ 24, tables ≤ 32): beyond that, plain
    sign-LSH is table-hungry — at 10⁹+ rows the honest scale path is
    multiprobe (flip the weakest-margin bits) or a coarse IVF partition
    feeding this same verify stage; the caps keep the plan bounded and
    the docstring keeps the limitation explicit."""
    frac = max(n_rows, 1) / float(target_bucket_rows)
    bits = max(min_bits, min(max_bits,
                             math.ceil(math.log2(frac)) if frac > 1
                             else min_bits))
    p = 1.0 - math.acos(cos_tau) / math.pi
    keep = p ** bits
    if keep >= 1.0:
        return 1, bits
    tables = math.ceil(math.log(miss) / math.log(1.0 - keep))
    return max(1, min(max_tables, tables)), bits


def sql_embed_ann(rel: str, dialect: str, dim: int,
                  tables: int = ANN_TABLES, bits: int = ANN_BITS) -> str:
    """banded multi-table sign-LSH ANN: ``tables`` independent sets of
    ``bits`` Rademacher hyperplanes → per-table bucket codes → candidate =
    collides in ANY table (union of per-table bucket equi-joins, deduped) →
    exact cosine verify once per candidate pair.

    Scale shape: each table spreads N vectors over 2^bits buckets, so
    in-bucket work is ~tables · N²/2^bits — the single-table variant had no
    recall fallback (a near pair split by one hyperplane was lost); with L
    tables a pair at cosine θ survives with 1-(1-p^bits)^L, p = 1-θ/π.
    Needs the embedding dim at plan time (hyperplanes are literal arrays)."""
    def code_expr(t: int) -> str:
        parts = []
        for b in range(bits):
            r = _rademacher(t, b, dim)
            lits = ", ".join(repr(v) for v in r)
            arr = f"[{lits}]" if dialect == D.DUCKDB else f"array({lits})"
            proj = _dot("embedding", f"{arr}", dialect)
            parts.append(f"CASE WHEN ({proj}) >= 0 THEN {1 << b} ELSE 0 END")
        return "CAST(" + " + ".join(parts) + " AS BIGINT)"

    ctes = [_norm_cte(rel, dialect)]
    unions = []
    for t in range(tables):
        ctes.append((f"coded_{t}",
                     f"SELECT vec_id, {code_expr(t)} AS bucket FROM vecs"))
        unions.append(
            f"SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b "
            f"FROM coded_{t} a JOIN coded_{t} b ON a.bucket = b.bucket "
            "AND a.vec_id < b.vec_id")
    dot = _dot("va.embedding", "vb.embedding", dialect)
    ctes += [
        ("cand_ids", "SELECT DISTINCT vec_id_a, vec_id_b FROM ("
                     + " UNION ALL ".join(unions) + ")"),
        ("cand", "SELECT c.vec_id_a, c.vec_id_b, "
                 f"({dot} / (va.nrm * vb.nrm)) AS cosine FROM cand_ids c "
                 "JOIN vecs va ON va.vec_id = c.vec_id_a "
                 "JOIN vecs vb ON vb.vec_id = c.vec_id_b"),
    ]
    return _with(ctes,
                 "SELECT vec_id_a, vec_id_b, cosine FROM cand "
                 f"WHERE cosine >= {ANN_COS_TAU!r}")


def ivf_params_for(n_rows: int, target_cell_rows: int = IVF_TARGET_CELL_ROWS,
                   min_cells: int = 4, max_cells: int = IVF_MAX_CELLS,
                   max_probe: int = IVF_MAX_PROBE) -> tuple:
    """(k_cells, nprobe) sizing for sql_embed_ivf at a given corpus size.

    k_cells holds expected home occupancy ≈ target_cell_rows, so the
    candidate join stays ~nprobe · N · target rows — LINEAR in N with
    constant parameters, which is exactly what sign-LSH loses once its
    table cap binds (measured: recall 0.598 at N = 1M,
    BENCH/ann_recall.json).  nprobe buys boundary recall: a pair split
    across cells is still found when either side's home cell is among
    the other's nprobe nearest.  Probe depth is N-adaptive (VERDICT r4
    weak #4): at fixed per-cell occupancy the fraction of ≥τ pairs that
    straddle cell boundaries grows with the cell count, so recall at
    nprobe=8 decays 0.991 → 0.966 → 0.862 across 20k/100k/1M; doubling
    to 16 past IVF_DEEP_PROBE_ROWS restores 0.9234 at the 1M handoff
    tier for 0.82% of brute-force candidate work (BENCH/ann_recall.json,
    lloyd_iters=2)."""
    k = max(min_cells, min(max_cells,
                           math.ceil(max(n_rows, 1) / target_cell_rows)))
    depth = max_probe if n_rows > IVF_DEEP_PROBE_ROWS else min(8, max_probe)
    nprobe = max(2, min(depth, k // 2))
    return k, nprobe


IVF_FIXED_SCALE = 1048576.0  # 2^20: fixed-point Lloyd accumulator scale


def sql_embed_ivf(rel: str, dialect: str, dim: int = None,
                  k_cells: int = 8, nprobe: int = 2, n_iter: int = 0,
                  tau: float = ANN_COS_TAU) -> str:
    """IVF (inverted-file) ANN — the declared handoff once sign-LSH's
    table cap binds (``ann_params_for`` docstring; measured at N = 1M in
    BENCH/ann_recall.json).

    Stages, all dual-dialect SQL:
      1. seed centroids = the k_cells vectors with the smallest
         md5_int64(vec_id) — a deterministic uniform sample both engines
         agree on (the coreset-free IVF bootstrap).
      2. ``n_iter`` Lloyd refinements (requires ``dim``): assign every
         vector to its nearest centroid, recompute each cell's mean.
         The mean is accumulated in FIXED-POINT BIGINT (floor(x·2²⁰+.5))
         because integer addition is exactly associative — a plain
         SUM(double) depends on partition order and would break the
         bit-identical Spark==DuckDB parity the driver gate pins.
         Measured effect (BENCH/ann_recall.json) at IDENTICAL candidate
         work: N = 100k recall 0.857 → 0.944 → 0.966 and N = 1M
         0.673 → 0.782 → 0.862 for 0/1/2 iterations — sampled seeds
         are near-equidistant noise in high dim, mean steps snap them
         onto the data manifold.
      3. assignment: every vector ranks the final centroids by cosine
         (fixed-fold dot product → bit-identical doubles → identical
         ranks); rank 1 is the HOME cell, ranks ≤ nprobe are the PROBE
         set.  On Spark this is a broadcast cross-join against k_cells
         rows + one window per vec_id — no all-pairs anything.
      4. candidates: probe ⋈ home on cell (asymmetric, the true IVF
         search semantics — a query visits nprobe inverted lists, lists
         hold home assignments), canonicalized with least/greatest and
         deduped.  Join size ~ nprobe · N · target_cell_rows.
      5. exact cosine verify ≥ tau, identical to sql_embed_ann.

    Scale shape: each assignment pass is N · k_cells dot products
    (embarrassingly parallel, centroids broadcast); the Lloyd sums
    shuffle N · dim rows into k_cells · dim groups; candidate work is
    linear in N at fixed (target, nprobe).  The quadratic brute force
    survives only as the small-scale oracle (sql_embed_topk)."""
    if n_iter > 0 and dim is None:
        raise ValueError("Lloyd refinement (n_iter > 0) needs dim")
    sty = _sty(dialect)
    h = D.md5_int64(f"CAST(vec_id AS {sty})", dialect)
    dot = _dot("va.embedding", "vb.embedding", dialect)

    def cos_vc(cents: str) -> str:
        return (f"({_dot('v.embedding', 'c.cemb', dialect)}"
                f" / (v.nrm * c.cnrm))")

    def ranked_sql(cents: str, max_rk) -> str:
        return (f"SELECT vec_id, cell, rk FROM ("
                f"SELECT v.vec_id, c.cell, row_number() OVER ("
                f"PARTITION BY v.vec_id ORDER BY {cos_vc(cents)} DESC, "
                f"c.cell) AS rk "
                f"FROM vecs v CROSS JOIN {cents} c) r WHERE rk <= {max_rk}")

    ctes = [
        _norm_cte(rel, dialect),
        ("cents_0",
         f"SELECT rn - 1 AS cell, embedding AS cemb, nrm AS cnrm FROM ("
         f"SELECT embedding, nrm, row_number() OVER (ORDER BY {h}, vec_id) "
         f"AS rn FROM vecs) t WHERE rn <= {k_cells}"),
    ]
    for i in range(n_iter):
        if dialect == D.DUCKDB:
            elem = "v.embedding[CAST(j + 1 AS INTEGER)]"
            arr = ("list_transform(list_sort(list({'j': j, 'm': m})), "
                   "x -> x.m)")
        else:
            elem = "element_at(v.embedding, CAST(j + 1 AS INT))"
            arr = "transform(array_sort(collect_list(struct(j, m))), x -> x.m)"
        fx = (f"CAST(floor(CAST({elem} AS DOUBLE) * {IVF_FIXED_SCALE!r} "
              f"+ 0.5) AS BIGINT)")
        ctes += [
            (f"js_{i}", _seq(dim, dialect)) if i == 0 else None,
            (f"home_{i}", ranked_sql(f"cents_{i}", 1)),
            (f"sums_{i}",
             f"SELECT a.cell, j, sum({fx}) AS s, count(*) AS c "
             f"FROM home_{i} a JOIN vecs v ON v.vec_id = a.vec_id "
             f"CROSS JOIN js_0 GROUP BY a.cell, j"),
            (f"cents_{i + 1}",
             f"SELECT cell, cemb, "
             f"sqrt({_dot('cemb', 'cemb', dialect)}) AS cnrm FROM ("
             f"SELECT cell, {arr} AS cemb FROM ("
             f"SELECT cell, j, CAST(s AS DOUBLE) / (CAST(c AS DOUBLE) "
             f"* {IVF_FIXED_SCALE!r}) AS m FROM sums_{i}) u "
             f"GROUP BY cell) g"),
        ]
    ctes = [c for c in ctes if c is not None]
    ctes += [
        ("ranked", ranked_sql(f"cents_{n_iter}", nprobe)),
        ("cand_ids",
         "SELECT DISTINCT least(p.vec_id, h.vec_id) AS vec_id_a, "
         "greatest(p.vec_id, h.vec_id) AS vec_id_b "
         "FROM ranked p JOIN ranked h ON h.cell = p.cell AND h.rk = 1 "
         "AND h.vec_id <> p.vec_id"),
        ("cand", "SELECT c.vec_id_a, c.vec_id_b, "
                 f"({dot} / (va.nrm * vb.nrm)) AS cosine FROM cand_ids c "
                 "JOIN vecs va ON va.vec_id = c.vec_id_a "
                 "JOIN vecs vb ON vb.vec_id = c.vec_id_b"),
    ]
    return _with(ctes,
                 "SELECT vec_id_a, vec_id_b, cosine FROM cand "
                 f"WHERE cosine >= {tau!r}")


def ivf2_params_for(n_rows: int,
                    target_cell_rows: int = IVF_TARGET_CELL_ROWS,
                    min_cells: int = 2, max_cells: int = IVF_MAX_CELLS,
                    coarse_probe: int = 8,
                    max_probe: int = IVF_MAX_PROBE) -> tuple:
    """(k1, k2, nprobe1, nprobe2) sizing for sql_embed_ivf2.

    Fine-cell count K = k1·k2 ≈ N / target_cell_rows holds occupancy, as
    in the flat sizing — but split √K × √K so each level's centroid table
    stays small: per-level caps MULTIPLY (K ≤ 65,536² ≈ 4.3B fine cells,
    i.e. ~10¹² rows at target 256 — the 10¹²-doc tier the flat cap cannot
    reach), and assignment cost drops from N·K dot products to
    N·(k1 + nprobe1·k2).  nprobe2 follows the flat depth rule (8, deepened
    to 16 past IVF_DEEP_PROBE_ROWS); nprobe1 coarse probes bound the
    level-1 boundary loss — measured at 1M (BENCH/ann_recall.json):
    recall 0.720 → 0.791 for nprobe1 4 → 8 at identical candidate work
    (nprobe1 costs assignment compute only, never join volume; the
    default 8 buys the 0.07 for ~4% assignment wall), and 0.853 at
    nprobe2=32 / 1.6% work.  The residual gap to flat IVF's 0.923 at
    equal work is the structural price of the hierarchy, paid only where
    flat assignment (N·K dots) is unpayable — the op's design regime."""
    kk = max(1, math.ceil(max(n_rows, 1) / target_cell_rows))
    k1 = max(min_cells, min(max_cells, math.ceil(math.sqrt(kk))))
    k2 = max(min_cells, min(max_cells, math.ceil(kk / k1)))
    p1 = max(2, min(coarse_probe, k1))
    depth = max_probe if n_rows > IVF_DEEP_PROBE_ROWS else min(8, max_probe)
    p2 = max(2, min(depth, (k1 * k2) // 2))
    return k1, k2, p1, p2


def sql_embed_ivf2(rel: str, dialect: str, dim: int = None,
                   k1: int = 4, k2: int = 4, nprobe1: int = 2,
                   nprobe2: int = 2, n_iter: int = 0,
                   tau: float = ANN_COS_TAU) -> str:
    """Hierarchical (two-level) IVF ANN — the declared handoff once the
    flat IVF cell cap binds (IVF_MAX_CELLS: past ~16.7M rows flat
    occupancy grows linearly again, and flat assignment is N·K dot
    products — 10¹² × 65,536 is unpayable).

    Structure (all dual-dialect SQL, same determinism machinery as
    sql_embed_ivf — md5-ordered seeds, fixed-point BIGINT Lloyd sums,
    fixed-fold dot products, total-ordered rank windows):

      1. level 1: k1 coarse cells — seeds + ``n_iter`` Lloyd exactly as
         the flat op; every vector gets a coarse HOME (rk=1) and
         nprobe1 coarse PROBES.
      2. level 2: within each coarse cell independently, k2 sub-cells —
         seeds are the k2 smallest-md5 members of the cell, then
         ``n_iter`` Lloyd refinements with composite (cell, sub) group
         keys; a vector's level-2 Lloyd assignment stays inside its
         coarse home (standard hierarchical IVF training).
      3. search: each vector ranks the sub-centroids of its nprobe1
         probed coarse cells; rank 1 is its fine HOME list, ranks
         ≤ nprobe2 its fine probe set.  Candidates = probe ⋈ home on
         (cell, sub); exact cosine verify ≥ tau.

    Scale shape: assignment/search is N·(k1 + nprobe1·k2) dot products
    vs the flat op's N·K — at N = 16.7M/target 256 (K = 65,536:
    k1 = k2 = 256, nprobe1 = 4) that is ~51× less work, and the per-level
    cell caps multiply to ~4.3B fine cells ≈ 10¹² rows at constant
    occupancy.  Candidate-join volume stays ~nprobe2 · N · target rows,
    linear in N at fixed parameters.  Empty coarse cells simply have no
    sub-table rows (probing them yields nothing); sub-cells emptied by a
    Lloyd step drop out of the regrouped centroid table exactly as in
    the flat op."""
    if n_iter > 0 and dim is None:
        raise ValueError("Lloyd refinement (n_iter > 0) needs dim")
    sty = _sty(dialect)
    h = D.md5_int64(f"CAST(vec_id AS {sty})", dialect)
    hv = D.md5_int64(f"CAST(v.vec_id AS {sty})", dialect)
    dot = _dot("va.embedding", "vb.embedding", dialect)
    cos1 = (f"({_dot('v.embedding', 'c.cemb', dialect)} / (v.nrm * c.cnrm))")
    cos2 = (f"({_dot('v.embedding', 's.cemb', dialect)} / (v.nrm * s.cnrm))")

    def ranked1_sql(cents: str, max_rk) -> str:
        return (f"SELECT vec_id, cell, rk FROM ("
                f"SELECT v.vec_id, c.cell, row_number() OVER ("
                f"PARTITION BY v.vec_id ORDER BY {cos1} DESC, "
                f"c.cell) AS rk "
                f"FROM vecs v CROSS JOIN {cents} c) r WHERE rk <= {max_rk}")

    if dialect == D.DUCKDB:
        elem = "v.embedding[CAST(j + 1 AS INTEGER)]"
        arr = ("list_transform(list_sort(list({'j': j, 'm': m})), "
               "x -> x.m)")
    else:
        elem = "element_at(v.embedding, CAST(j + 1 AS INT))"
        arr = "transform(array_sort(collect_list(struct(j, m))), x -> x.m)"
    fx = (f"CAST(floor(CAST({elem} AS DOUBLE) * {IVF_FIXED_SCALE!r} "
          f"+ 0.5) AS BIGINT)")

    ctes = [
        _norm_cte(rel, dialect),
        ("c1_0",
         f"SELECT rn - 1 AS cell, embedding AS cemb, nrm AS cnrm FROM ("
         f"SELECT embedding, nrm, row_number() OVER (ORDER BY {h}, vec_id) "
         f"AS rn FROM vecs) t WHERE rn <= {k1}"),
    ]
    if n_iter > 0:
        ctes.append(("js_0", _seq(dim, dialect)))
    for i in range(n_iter):
        ctes += [
            (f"h1_{i}", ranked1_sql(f"c1_{i}", 1)),
            (f"s1_{i}",
             f"SELECT a.cell, j, sum({fx}) AS s, count(*) AS c "
             f"FROM h1_{i} a JOIN vecs v ON v.vec_id = a.vec_id "
             f"CROSS JOIN js_0 GROUP BY a.cell, j"),
            (f"c1_{i + 1}",
             f"SELECT cell, cemb, "
             f"sqrt({_dot('cemb', 'cemb', dialect)}) AS cnrm FROM ("
             f"SELECT cell, {arr} AS cemb FROM ("
             f"SELECT cell, j, CAST(s AS DOUBLE) / (CAST(c AS DOUBLE) "
             f"* {IVF_FIXED_SCALE!r}) AS m FROM s1_{i}) u "
             f"GROUP BY cell) g"),
        ]
    ctes += [
        ("ranked1", ranked1_sql(f"c1_{n_iter}", nprobe1)),
        ("home1", "SELECT vec_id, cell FROM ranked1 WHERE rk = 1"),
        ("sub_0",
         f"SELECT cell, rn - 1 AS sub, cemb, cnrm FROM ("
         f"SELECT hh.cell, v.embedding AS cemb, v.nrm AS cnrm, "
         f"row_number() OVER (PARTITION BY hh.cell ORDER BY {hv}, "
         f"v.vec_id) AS rn "
         f"FROM home1 hh JOIN vecs v ON v.vec_id = hh.vec_id) t "
         f"WHERE rn <= {k2}"),
    ]
    for i in range(n_iter):
        ctes += [
            (f"h2_{i}",
             f"SELECT vec_id, cell, sub FROM ("
             f"SELECT hh.vec_id, s.cell, s.sub, row_number() OVER ("
             f"PARTITION BY hh.vec_id ORDER BY {cos2} DESC, s.sub) AS rk "
             f"FROM home1 hh JOIN sub_{i} s ON s.cell = hh.cell "
             f"JOIN vecs v ON v.vec_id = hh.vec_id) r WHERE rk = 1"),
            (f"s2_{i}",
             f"SELECT a.cell, a.sub, j, sum({fx}) AS s, count(*) AS c "
             f"FROM h2_{i} a JOIN vecs v ON v.vec_id = a.vec_id "
             f"CROSS JOIN js_0 GROUP BY a.cell, a.sub, j"),
            (f"sub_{i + 1}",
             f"SELECT cell, sub, cemb, "
             f"sqrt({_dot('cemb', 'cemb', dialect)}) AS cnrm FROM ("
             f"SELECT cell, sub, {arr} AS cemb FROM ("
             f"SELECT cell, sub, j, CAST(s AS DOUBLE) / (CAST(c AS DOUBLE) "
             f"* {IVF_FIXED_SCALE!r}) AS m FROM s2_{i}) u "
             f"GROUP BY cell, sub) g"),
        ]
    ctes += [
        ("fsub",
         f"SELECT vec_id, cell, sub, rk FROM ("
         f"SELECT p.vec_id, s.cell, s.sub, row_number() OVER ("
         f"PARTITION BY p.vec_id ORDER BY {cos2} DESC, s.cell, s.sub) "
         f"AS rk "
         f"FROM ranked1 p JOIN sub_{n_iter} s ON s.cell = p.cell "
         f"JOIN vecs v ON v.vec_id = p.vec_id) r WHERE rk <= {nprobe2}"),
        ("cand_ids",
         "SELECT DISTINCT least(p.vec_id, h.vec_id) AS vec_id_a, "
         "greatest(p.vec_id, h.vec_id) AS vec_id_b "
         "FROM fsub p JOIN fsub h ON h.cell = p.cell AND h.sub = p.sub "
         "AND h.rk = 1 AND h.vec_id <> p.vec_id"),
        ("cand", "SELECT c.vec_id_a, c.vec_id_b, "
                 f"({dot} / (va.nrm * vb.nrm)) AS cosine FROM cand_ids c "
                 "JOIN vecs va ON va.vec_id = c.vec_id_a "
                 "JOIN vecs vb ON vb.vec_id = c.vec_id_b"),
    ]
    return _with(ctes,
                 "SELECT vec_id_a, vec_id_b, cosine FROM cand "
                 f"WHERE cosine >= {tau!r}")


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

DOC_OPS = {
    "td_text_stats": sql_text_stats,
    "td_text_quality": sql_text_quality,
    "td_lang_id": sql_lang_id,
    "td_exact_dupes": sql_exact_dupes,
    "td_minhash_pairs": sql_minhash_pairs,
    "td_minhash_prod_pairs": sql_minhash_prod_pairs,
    "td_minhash_lowbg_pairs": sql_minhash_lowbg_pairs,
    "td_ngram_jaccard_pairs": sql_ngram_jaccard_pairs,
    "td_simhash": sql_simhash,
    "td_simhash_pairs": sql_simhash_pairs,
    "td_fingerprint": sql_fingerprint,
}

EMB_OPS = {
    "td_embed_topk": sql_embed_topk,
    # td_embed_ann (dim + N-adaptive) and td_embed_ivf (N-adaptive) are
    # parameterized at plan time; wired explicitly in __spark_entry__
}
