"""Column-level field-grammar expressions — the JVM-side (whole-stage
codegen) analogs of the simple extraction kernels (SURVEY.md §2.3
"Spark analog" column).  These are the fast path for the grammars whose
semantics are a single regex + character repair; the order-sensitive
label-anchored extractors stay kernel-in-UDF (byte-identical contract).

| here | kernel | reference |
|---|---|---|
| pan_strict_col        | F1  | app.py:593  |
| pan_relaxed_repair_col| F2  | app.py:589-597, 252-271 |
| dob_col + dob_norm    | F3/F5 | app.py:600, 347-353 |
| ifsc_strict_col       | F10 | app.py:321  |
| ifsc_global_repair_col| F12 | app.py:1806-1810 |
| micr_col              | F17 | app.py:328  |
| account_col           | F19 | app.py:335  |
| aadhaar_spaced_col    | F9  | app.py:5733-5746 |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pan_strict_col(c: Column) -> Column:
    return F.regexp_extract(c, r"[A-Z]{5}[0-9]{4}[A-Z]", 0)


def pan_relaxed_repair_col(c: Column) -> Column:
    """Relaxed match, then S→5/A→4/T→7 repair on the digit block, then
    strict re-validation — the columnar form of correct_pan_number
    limited to the common case (whole-token repair)."""
    relaxed = F.regexp_extract(c, r"[A-Z]{5}[0-9A-Z]{4}[A-Z]", 0)
    repaired = F.concat(
        F.substring(relaxed, 1, 5),
        F.translate(F.substring(relaxed, 6, 4), "SAT", "547"),
        F.substring(relaxed, 10, 1),
    )
    return F.when(repaired.rlike(r"^[A-Z]{5}[0-9]{4}[A-Z]$"), repaired).otherwise(F.lit(""))


def dob_col(c: Column) -> Column:
    return F.regexp_extract(c, r"\d{2}[-/]\d{2}[-/]\d{4}", 0)


def dob_norm_col(c: Column) -> Column:
    """Effective normalize_dob_format: / → - then strip '-'."""
    return F.regexp_replace(F.regexp_replace(c, "/", "-"), r"^-+|-+$", "")


def ifsc_strict_col(c: Column) -> Column:
    return F.regexp_extract(c, r"[A-Z]{4}0[A-Z0-9]{6}", 0)


def ifsc_global_repair_col(c: Column) -> Column:
    """F12: whole-text 8→B, O→0 then strict re-search."""
    return F.regexp_extract(F.translate(c, "8O", "B0"), r"\b[A-Z]{4}0[A-Z0-9]{6}\b", 0)


def micr_col(c: Column) -> Column:
    return F.regexp_extract(c, r"\b\d{9}\b", 0)


def account_col(c: Column) -> Column:
    return F.regexp_extract(c, r"\b\d{10,16}\b", 0)


def aadhaar_spaced_col(c: Column) -> Column:
    """F9: O→0, I→1, |→1 repair then the spaced 12-digit grammar."""
    return F.regexp_extract(F.translate(c, "OI|", "011"), r"\b\d{4}\s?\d{4}\s?\d{4}\b", 0)
