"""Deterministic synthesis of the interleaved text+media documents corpus.

Implements FIXTURES.md §1-§5 (seed=42, no external data): an Iceberg-shaped
table ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
per BASELINE.json ``input_hint``, plus ground truth (``persons``,
``doc_truth``, ``labeled_pairs``).

Correctness-by-construction guarantees (these make pairwise F1 = 1.0
achievable and are relied on by tests):
  * distinct persons' DOBs are globally ≥ 5 days apart → the ±2d date-window
    matcher can never bridge two persons via ``r_name_dob``;
  * phones and emails are unique per person → ``r_name_phone`` / ``r_email``
    can never bridge two persons;
  * every non-anchor doc keeps at least one full resolver path to its
    person's anchor doc (email, or name-within-matcher-reach + dob/phone);
  * ~5% of persons share the full name "john smith" (FIXTURES §4 skew knob)
    → hot exact/phonetic name blocks, uniqueness preserved via dob/phone.

Media spans are interleaved pseudo-randomly and carry no attribute values;
the per-row span-sequence invariant (kind, text, media_ref, order) is
checked end-to-end (BASELINE.md).

Parquet written with pyarrow (not Spark) so Spark and the DuckDB oracle read
byte-identical files.
"""

from __future__ import annotations

import hashlib
import os
import random
from datetime import date, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

_FIRST_SYL = ["jo", "ma", "an", "el", "sa", "da", "lu", "mi", "ka", "ro",
              "be", "ni", "ta", "vi", "le", "so", "fa", "ha", "pe", "ga"]
_FIRST_END = ["n", "ra", "ria", "nna", "son", "la", "mes", "vid", "sha",
              "mon", "lly", "rk", "th", "rio", "ne", "sta", "bel", "dir",
              "x", "m"]
_LAST_SYL = ["smi", "gar", "nel", "bro", "tay", "and", "mar", "tho", "jac",
             "whi", "har", "cla", "lew", "rob", "wal", "you", "all", "kin",
             "wri", "sco"]
_LAST_END = ["th", "cia", "son", "wn", "lor", "erson", "tinez", "mas",
             "kson", "te", "ris", "rk", "is", "erts", "ker", "ng", "en",
             "sley", "ght", "tt"]

_CITY_POOL = [a + b for a in ["spring", "river", "oak", "maple", "cedar",
                              "lake", "hill", "stone", "ash", "elm"]
              for b in ["field", "ton", "ville", "port", "dale"]]

_VOWELS = "aeiou"
_CONSONANTS = "bcdfgklmnprst"

HOT_NAME = "john smith"
HOT_FRACTION = 0.05

TIERS = {
    "sf0.001": (150, 2, 6),
    "sf0.01": (1500, 2, 6),
    "sf0.1": (150000, 2, 6),
    # larger tiers for the two-parallelism scaling protocol: per-stage
    # compute must dwarf fixed stage-barrier latency to measure scaling.
    # sf1 scales docs-per-person, not persons: the ≥5-day DOB-spacing
    # invariant (correctness-by-construction) caps persons at ~580k
    # within the valid date range.
    "sf0.3": (450000, 2, 6),
    "sf1": (450000, 6, 14),
}


def _name_pools():
    rng = random.Random(SEED)
    firsts = sorted({a + b for a in _FIRST_SYL for b in _FIRST_END})
    lasts = sorted({a + b for a in _LAST_SYL for b in _LAST_END})
    rng.shuffle(firsts)
    rng.shuffle(lasts)
    return firsts[:200], lasts[:200]


def _typo(rng: random.Random, name: str) -> str:
    """one edit (sub/insert/delete of a consonant), never the first char of a
    token → within levenshtein-auto reach of the original."""
    toks = name.split(" ")
    ti = rng.randrange(len(toks))
    t = toks[ti]
    if len(t) < 4:
        return name
    pos = rng.randrange(1, len(t))
    op = rng.choice(["sub", "ins", "del"])
    c = rng.choice(_CONSONANTS)
    if op == "sub":
        t = t[:pos] + c + t[pos + 1:]
    elif op == "ins":
        t = t[:pos] + c + t[pos:]
    else:
        t = t[:pos] + t[pos + 1:]
    toks[ti] = t
    return " ".join(toks)


def _first_typo(rng: random.Random, name: str) -> str:
    """catherine/katherine-class mutation: substitute the FIRST letter of
    one token AND a mid-token consonant of the other (lev = 2, within
    fuzzy-auto reach for names ≥ 6 chars) — shares NO token, NO exact key,
    and different phonetic codes with the original, so resolving it
    requires the complete deletion/gram blocking keys (VERDICT r2 #1).
    Applied only to two-token names ≥ 11 chars (keeps lev-auto k = 2)."""
    toks = name.split(" ")
    if len(toks) != 2 or len(name) < 11 or min(map(len, toks)) < 4:
        return name
    a, b = toks
    c0 = rng.choice([x for x in _CONSONANTS if x != a[0]])
    a = c0 + a[1:]
    pos = rng.randrange(1, len(b))
    c1 = rng.choice([x for x in _CONSONANTS if x != b[pos]])
    b = b[:pos] + c1 + b[pos + 1:]
    return f"{a} {b}"


def _phonetic_variant(rng: random.Random, name: str) -> str:
    """swap one non-initial vowel for another → same phonetic code (vowels
    are class-0, dropped) AND one edit (also within fuzzy reach)."""
    toks = name.split(" ")
    order = list(range(len(toks)))
    rng.shuffle(order)
    for ti in order:
        t = toks[ti]
        idxs = [i for i in range(1, len(t)) if t[i] in _VOWELS]
        if idxs:
            i = rng.choice(idxs)
            repl = rng.choice([v for v in _VOWELS if v != t[i]])
            toks[ti] = t[:i] + repl + t[i + 1:]
            return " ".join(toks)
    return name


def _format_phone(rng: random.Random, digits: str) -> str:
    styles = [
        lambda d: d,
        lambda d: f"+{d[0]} ({d[1:4]}) {d[4:7]}-{d[7:]}",
        lambda d: f"{d[0]}-{d[1:4]}-{d[4:7]}-{d[7:]}",
        lambda d: f"+{d[0]} {d[1:4]} {d[4:7]} {d[7:]}",
    ]
    return rng.choice(styles)(digits)


def _media_ref(doc_id: str, i: int) -> str:
    return "media://" + hashlib.sha1(f"{doc_id}/{i}".encode()).hexdigest()[:8]


def generate(n_persons: int, seed: int = SEED, docs_lo: int = 2,
             docs_hi: int = 6):
    """Generate (persons, docs, labeled_pairs) as lists of dicts.

    Deterministic for a given (n_persons, docs range, seed).
    """
    rng = random.Random((seed, n_persons).__repr__())
    firsts, lasts = _name_pools()

    n_hot = max(2, int(n_persons * HOT_FRACTION))
    epoch = date(1950, 1, 1)

    persons = []
    for pid in range(n_persons):
        if pid < n_hot:
            name = HOT_NAME
        else:
            name = f"{rng.choice(firsts)} {rng.choice(lasts)}"
        # global ≥5-day spacing between distinct persons' DOBs (see module doc)
        dob = epoch + timedelta(days=pid * 5)
        phone = "1555" + f"{pid:07d}"
        email = f"user{pid:06d}@ex{pid % 7}.example"
        city = _CITY_POOL[rng.randrange(len(_CITY_POOL))]
        persons.append({
            "person_id": f"p-{pid:06d}", "name": name,
            "dob": dob.isoformat(), "phone": phone,
            "email": email, "city": city,
        })

    seq = {s: 0 for s in "abcd"}
    docs = []          # dict: doc_id, person_id, fields(list[(field, raw)])
    for p in persons:
        n_docs = rng.randint(docs_lo, docs_hi)
        pid_docs = []
        for di in range(n_docs):
            if di == 0:
                src = rng.choice("abc")
                op = "none"
            else:
                src = rng.choice("abcd")
                op = rng.choice(
                    ["none", "typo", "phonetic", "dob_shift", "drop_attr",
                     "alt_field", "first_typo"])
            doc_id = f"{src}-{seq[src]:06d}"
            seq[src] += 1

            name, dob, phone, email, city = (p["name"], p["dob"], p["phone"],
                                             p["email"], p["city"])
            name_field = "full_name"
            dropped = None
            if src == "d":
                fields = [("email", email), ("tel", _format_phone(rng, phone))]
            else:
                if op == "typo":
                    name = _typo(rng, name)
                elif op == "first_typo":
                    # the name is only reachable via the fuzzy matcher
                    # (bound to full_name_alt), and with email dropped the
                    # doc's ONLY resolution paths are r_name_dob /
                    # r_name_phone through that fuzzy leaf — end-to-end
                    # evidence for the complete fuzzy blocking keys
                    name_field = "full_name_alt"
                    name = _first_typo(rng, name)
                    dropped = "email"
                elif op == "phonetic":
                    name = _phonetic_variant(rng, name)
                elif op == "dob_shift":
                    d = date.fromisoformat(dob)
                    dob = (d + timedelta(days=rng.choice([-1, 1]))).isoformat()
                elif op == "drop_attr":
                    dropped = rng.choice(["city", "dob", "phone", "email"])
                elif op == "alt_field":
                    name_field = "full_name_alt"
                    if rng.random() < 0.5:
                        name = _typo(rng, name)
                fields = [(name_field, name.title() if rng.random() < 0.3 else name)]
                if dropped != "dob":
                    fields.append(("birth_date", dob))
                if dropped != "phone":
                    fields.append(("tel", _format_phone(rng, phone)))
                if dropped != "email":
                    fields.append(("email", email))
                if dropped != "city":
                    fields.append(("city", city))
                # occasional multi-valued phone: a reformatted duplicate
                if dropped != "phone" and rng.random() < 0.15:
                    fields.append(("tel", _format_phone(rng, phone)))
            pid_docs.append({
                "doc_id": doc_id, "person_id": p["person_id"],
                "source": src, "fields": fields, "op": op,
            })
        docs.extend(pid_docs)

    # labeled pairs: all intra-person pairs (positives) + hot-name
    # cross-person pairs (hard negatives sharing the name block key)
    labeled = []
    by_person = {}
    for d in docs:
        by_person.setdefault(d["person_id"], []).append(d["doc_id"])
    for p in persons:
        ids = sorted(by_person[p["person_id"]])
        key = "name_exact:" + p["name"]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                labeled.append({"doc_id_a": ids[i], "doc_id_b": ids[j],
                                "label": 1, "block_key": key})
    hot_pids = [p["person_id"] for p in persons[:n_hot]]
    for i in range(min(len(hot_pids) - 1, 200)):
        a = sorted(by_person[hot_pids[i]])[0]
        b = sorted(by_person[hot_pids[i + 1]])[0]
        x, y = (a, b) if a < b else (b, a)
        labeled.append({"doc_id_a": x, "doc_id_b": y, "label": 0,
                        "block_key": "name_exact:" + HOT_NAME})

    return persons, docs, labeled


def docs_to_rows(docs, seed: int = SEED):
    """Render docs to interleaved (doc_id, spans) rows with media spans."""
    rows = []
    for d in docs:
        rng = random.Random((seed, d["doc_id"]).__repr__())
        spans = []
        n_media = rng.randint(0, 3)
        media_slots = sorted(rng.randrange(len(d["fields"]) + 1)
                             for _ in range(n_media))
        mi = 0
        media_i = 0
        for fi, (fld, raw) in enumerate(d["fields"]):
            while media_i < n_media and media_slots[media_i] == fi:
                spans.append(("media", "", _media_ref(d["doc_id"], mi)))
                mi += 1
                media_i += 1
            spans.append(("text", f"{fld}={raw}", ""))
        while media_i < n_media:
            spans.append(("media", "", _media_ref(d["doc_id"], mi)))
            mi += 1
            media_i += 1
        rows.append({
            "doc_id": d["doc_id"],
            "spans": [{"kind": k, "text": t, "media_ref": m, "offset": i}
                      for i, (k, t, m) in enumerate(spans)],
        })
    rows.sort(key=lambda r: r["doc_id"])
    return rows


def write_corpus(out_dir: str, n_persons: int, seed: int = SEED,
                 docs_lo: int = 2, docs_hi: int = 6) -> dict:
    """Write documents/persons/doc_truth/labeled_pairs parquet into out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    persons, docs, labeled = generate(n_persons, seed, docs_lo, docs_hi)
    rows = docs_to_rows(docs, seed)

    # small row groups: parquet splits at row-group boundaries, and a
    # single-row-group file caps every downstream Spark scan at ONE task
    pq.write_table(
        pa.Table.from_pylist(rows, schema=DOCS_SCHEMA),
        os.path.join(out_dir, "docs_spans.parquet"),
        row_group_size=16384)
    pq.write_table(
        pa.Table.from_pylist(persons),
        os.path.join(out_dir, "persons.parquet"))
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": d["doc_id"], "person_id": d["person_id"],
              "source": d["source"], "op": d["op"]} for d in docs]),
        os.path.join(out_dir, "doc_truth.parquet"))
    pq.write_table(
        pa.Table.from_pylist(labeled),
        os.path.join(out_dir, "labeled_pairs.parquet"))
    return {"persons": len(persons), "docs": len(rows), "pairs": len(labeled)}


# ---------------------------------------------------------------------------
# second corpus: "account" entities exercising jaro_winkler / ngram matchers,
# number + boolean attributes, and a non-ISO (dd/MM/yyyy) date format
# ---------------------------------------------------------------------------

_CO_STEM = ["acme", "globex", "initech", "vandelay", "wexler", "dunmore",
            "calloway", "brighton", "fairview", "lakewood", "northgate",
            "redwood", "sterling", "harbor", "pinnacle", "summit"]
_CO_KIND = ["holdings", "industries", "logistics", "ventures", "systems",
            "partners", "trading", "capital"]
_CO_SUFF = ["incorporated", "limited", "corporation", "group"]

TIERS2 = {"sf0.001": 80, "sf0.01": 800}


def _jw_typo(rng: random.Random, name: str) -> str:
    """substitute one character in the BACK half of the longest token —
    Jaro-Winkler prefix weighting keeps similarity comfortably above the
    model's 0.92 threshold for name-length strings."""
    toks = name.split(" ")
    ti = max(range(len(toks)), key=lambda i: len(toks[i]))
    t = toks[ti]
    pos = rng.randrange(max(1, len(t) * 2 // 3), len(t))
    c = rng.choice([x for x in _CONSONANTS if x != t[pos]])
    toks[ti] = t[:pos] + c + t[pos + 1:]
    return " ".join(toks)


def generate2(n_accounts: int, seed: int = SEED):
    """(accounts, docs) for the account-entity corpus.  Correctness by
    construction: opened dates ≥ 5 days apart across accounts (±2d window
    can't bridge) and balances unique per account — so each resolver
    (holder+opened, company+balance) carries a uniqueness anchor."""
    rng = random.Random(("accounts", seed, n_accounts).__repr__())
    firsts, lasts = _name_pools()
    epoch = date(1970, 1, 1)
    seq = {"e": 0, "f": 0}
    docs = []
    accounts = []
    for i in range(n_accounts):
        holder = f"{rng.choice(firsts)} {rng.choice(lasts)}"
        company = (f"{rng.choice(_CO_STEM)} {rng.choice(_CO_KIND)} "
                   f"{rng.choice(_CO_SUFF)}")
        opened = epoch + timedelta(days=i * 5)
        cents = 100000 * (1 + i % 7) + i * 137 + i % 97  # unique per account
        active = "true" if i % 3 == 0 else "false"
        accounts.append({"account_id": f"acct-{i:06d}", "holder": holder,
                         "company": company, "opened": opened.isoformat(),
                         "balance_cents": cents})
        for di in range(rng.randint(2, 4)):
            src = rng.choice("ef")
            doc_id = f"{src}-{seq[src]:06d}"
            seq[src] += 1
            op = "none" if di == 0 else rng.choice(
                ["none", "jw_typo", "ng_edit", "date_shift", "num_fmt",
                 "bool_case", "drop_holder", "drop_company"])
            h, c, o, a = holder, company, opened, active
            bal = f"{cents // 100}.{cents % 100:02d}"
            if op == "jw_typo":
                h = _jw_typo(rng, holder)
            elif op == "ng_edit":
                # clip the suffix word — shares most 3-grams (jaccard > 0.5)
                c = company.rsplit(" ", 1)[0] + " " + company.rsplit(" ", 1)[1][:3]
            elif op == "date_shift":
                o = opened + timedelta(days=rng.choice([-1, 1]))
            elif op == "num_fmt":
                bal = f"{cents // 100}.{cents % 100:02d}0"  # trailing zero
            elif op == "bool_case":
                a = a.title() if rng.random() < 0.5 else a.upper()
            fields = []
            if op != "drop_holder":
                fields.append(("holder_name", h))
                fields.append(("opened", o.strftime("%d/%m/%Y")))
            if op != "drop_company":
                fields.append(("company", c))
                fields.append(("balance", bal))
            fields.append(("active", a))
            docs.append({"doc_id": doc_id, "person_id": f"acct-{i:06d}",
                         "source": src, "fields": fields, "op": op})
    return accounts, docs


def write_corpus2(out_dir: str, n_accounts: int, seed: int = SEED) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    accounts, docs = generate2(n_accounts, seed)
    rows = docs_to_rows(docs, seed)
    pq.write_table(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA),
                   os.path.join(out_dir, "docs2_spans.parquet"),
                   row_group_size=16384)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "account_id": d["person_id"],
          "source": d["source"], "op": d["op"]} for d in docs]),
        os.path.join(out_dir, "docs2_truth.parquet"))
    return {"accounts": len(accounts), "docs": len(rows)}


def corpus2_dir(tier: str, base: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if base is None:
        base = os.path.join(repo, "fixtures")
    tier = tier if tier in TIERS2 else "sf0.01"
    out = os.path.join(base, tier)
    if not os.path.exists(os.path.join(out, "docs2_spans.parquet")):
        write_corpus2(out, TIERS2[tier])
    return out


def corpus_dir(tier: str, base: str | None = None) -> str:
    """Path of the fixture corpus for a tier; generate if missing.

    Committed tiers (sf0.001, sf0.01) live under fixtures/; sf0.1 is
    generated on demand into .cache/ (gitignored).
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if base is None:
        base = os.path.join(
            repo, "fixtures" if tier in ("sf0.001", "sf0.01") else ".cache")
    out = os.path.join(base, tier)
    marker = os.path.join(out, "docs_spans.parquet")
    if not os.path.exists(marker):
        n, lo, hi = TIERS[tier]
        write_corpus(out, n, docs_lo=lo, docs_hi=hi)
    return out


def corpus_dir_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our fixture corpus."""
    tier = os.path.basename(os.path.normpath(sf_dir))
    if tier not in TIERS:
        tier = "sf0.01"
    return corpus_dir(tier)
