"""Dual-dialect expression agreement: every builder in zentity_spark.dialect
must produce identical results in Spark SQL and DuckDB on the same inputs —
this is what makes the DuckDB oracles (`__spark_entry__.oracle_sql`) a real
correctness gate rather than a parallel reimplementation.
"""

import duckdb
import pytest

from zentity_spark import dialect as D

SAMPLES = [
    "john smith",
    "jon smith",
    "jhon  SMITH!!",
    "maria garcia-lopez",
    "x",
    "",
    "ab",
    "anna",
]

DATES = ["1984-03-02", "1984-03-04", "1984-03-09", "1970-01-01", "2024-12-31"]

PHONES = ["+1 (555) 123-4567", "1-555-123-4567", "15551234567", "555.123"]


def _spark_eval(spark, expr_sql, values):
    rows = ", ".join("('" + v.replace("'", "''") + "')" for v in values)
    df = spark.sql(f"SELECT {expr_sql} AS v FROM (VALUES {rows}) AS t(c)")
    return [r["v"] for r in df.collect()]


def _duck_eval(expr_sql, values):
    con = duckdb.connect()
    rows = ", ".join("('" + v.replace("'", "''") + "')" for v in values)
    return [r[0] for r in con.execute(
        f"SELECT {expr_sql} AS v FROM (VALUES {rows}) AS t(c)").fetchall()]


def _agree(spark, build, values, unary=True):
    s_expr = build("c", D.SPARK)
    d_expr = build("c", D.DUCKDB)
    sv = _spark_eval(spark, s_expr, values)
    dv = _duck_eval(d_expr, values)
    assert sv == dv, f"\nspark={sv}\nduck ={dv}\nexpr_s={s_expr}\nexpr_d={d_expr}"
    return sv


@pytest.mark.parametrize("norm", sorted(D.NORMALIZERS))
def test_normalizers_agree(spark, norm):
    vals = DATES if norm == "date" else SAMPLES + PHONES
    _agree(spark, D.NORMALIZERS[norm], vals)


def test_norm_name_semantics(spark):
    got = _spark_eval(spark, D.norm_name("c", D.SPARK), ["  Jhon  SMITH!! ", "A-b_c"])
    assert got == ["jhon smith", "abc"]


def test_norm_phone_semantics(spark):
    got = _spark_eval(spark, D.norm_phone("c", D.SPARK), PHONES)
    assert got == ["15551234567", "15551234567", "15551234567", "555123"]


def test_phonetic_code_agree_and_semantics(spark):
    got = _agree(spark, D.phonetic_code, ["smith", "smyth", "smithe", "jon",
                                          "john", "robert", "rupert", "x", "aeiou"])
    # smith/smyth/smithe share a code; classic soundex R163 for robert/rupert
    assert got[0] == got[1] == got[2] == "S530"
    assert got[3] == got[4] == "J500"
    assert got[5] == got[6] == "R163"


def test_tokens_agree(spark):
    got = _agree(spark, D.tokens, SAMPLES)
    assert got[0] == ["john", "smith"]
    assert got[5] == []  # empty string → no tokens


@pytest.mark.parametrize("n", [2, 3])
def test_char_ngrams_agree(spark, n):
    got = _agree(spark, lambda c, d: D.char_ngrams(c, n, d),
                 ["abcde", "ab", "a", ""])
    assert got[0] == ["abcde"[i:i + n] for i in range(5 - n + 1)]
    # shorter than n → empty list in both dialects
    assert got[-1] == []


def test_epoch_day_agree(spark):
    got = _agree(spark, D.epoch_day, DATES)
    assert got[3] == 0
    assert got[1] - got[0] == 2


def test_md5_int64_agree(spark):
    _agree(spark, D.md5_int64, SAMPLES)


def _pair_eval(spark, build_pair, pairs):
    s_rows = ", ".join(
        "('" + a.replace("'", "''") + "', '" + b.replace("'", "''") + "')"
        for a, b in pairs)
    s = [r["v"] for r in spark.sql(
        f"SELECT {build_pair('a', 'b', D.SPARK)} AS v "
        f"FROM (VALUES {s_rows}) AS t(a, b)").collect()]
    con = duckdb.connect()
    d = [r[0] for r in con.execute(
        f"SELECT {build_pair('a', 'b', D.DUCKDB)} AS v "
        f"FROM (VALUES {s_rows}) AS t(a, b)").fetchall()]
    assert s == d, f"spark={s} duck={d}"
    return s


def test_lev_within_auto(spark):
    # ES auto parity: <3 chars → 0 edits, 3-5 → 1, ≥6 → 2 (SURVEY §3 row 9)
    got = _pair_eval(spark, D.lev_within_auto, [
        ("john smith", "jon smith"),   # 1 edit, len≥6 → True
        ("john smith", "jan smyth"),   # 3 edits → False
        ("anna", "ana"),               # 1 edit, len 3-5 → True
        ("anna", "aa"),                # shorter side <3 → 0 edits → False
        ("ab", "ab"),                  # equal → True
    ])
    assert got == [True, False, True, False, True]


def test_token_overlap(spark):
    got = _pair_eval(spark, D.token_overlap, [
        ("john smith", "smith house"),
        ("john smith", "maria garcia"),
    ])
    assert got == [True, False]


def test_phonetic_token_eq(spark):
    got = _pair_eval(spark, D.phonetic_token_eq, [
        ("john smith", "jon smyth"),
        ("john smith", "maria garcia"),
    ])
    assert got == [True, False]


def test_date_within(spark):
    got = _pair_eval(spark, lambda a, b, d: D.date_within(a, b, 2, d), [
        ("1984-03-02", "1984-03-04"),
        ("1984-03-02", "1984-03-09"),
        ("1984-03-02", "1984-03-02"),
    ])
    assert got == [True, False, True]
