"""Tenant access gate (reference ``check_auth``, app.py:163-194; J6).

The reference does a per-request MySQL lookup: access flag for the
requested doc type, credits left, negative-credit policy.  Distributed
form: a broadcast join against the ``accounts`` dim table plus a filter
— admitted rows continue, rejected rows carry the reference's reason
strings.

Reference decision table (app.py:170-190):
    no account row          → deny  "unauthorized access"
    access flag != 1        → deny  " {doc_type} not provided "
    credits < 0 and not negative-allowed → deny "credit not avilable"
    otherwise               → allow " access granted"
(The misspellings are the reference's response strings, kept verbatim.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_access(requests: DataFrame, accounts: DataFrame, company_col: str = "company") -> DataFrame:
    """requests × broadcast accounts(company, access_flag, credits_left,
    is_negative_credit_allowed) → adds ``access_granted`` boolean and
    ``access_reason`` string."""
    acc = F.broadcast(
        accounts.select(
            F.col("company").alias("__acc_company"),
            F.col("access_flag").alias("__acc_flag"),
            F.col("credits_left").alias("__acc_credits"),
            F.col("is_negative_credit_allowed").alias("__acc_neg"),
        )
    )
    joined = requests.join(acc, requests[company_col] == acc["__acc_company"], "left")
    granted = (
        F.col("__acc_company").isNotNull()
        & (F.col("__acc_flag") == 1)
        & ((F.col("__acc_credits") >= 0) | (F.col("__acc_neg") == 1))
    )
    reason = (
        F.when(F.col("__acc_company").isNull(), F.lit("unauthorized access"))
        .when(F.col("__acc_flag") != 1, F.concat(F.lit(" "), F.col("doc_type"), F.lit(" not provided ")))
        .when((F.col("__acc_credits") < 0) & (F.col("__acc_neg") != 1), F.lit("credit not avilable"))
        .otherwise(F.lit(" access granted"))
    )
    return (
        joined.withColumn("access_granted", granted)
        .withColumn("access_reason", reason)
        .drop("__acc_company", "__acc_flag", "__acc_credits", "__acc_neg")
    )


def admitted(requests: DataFrame, accounts: DataFrame, company_col: str = "company") -> DataFrame:
    """Only the rows the gate lets through (left-semi shape)."""
    return with_access(requests, accounts, company_col).where(F.col("access_granted"))


def credit_decrements(admitted_requests: DataFrame, company_col: str = "company") -> DataFrame:
    """Per-company usage counts — the batch form of the reference's
    SELECT→minus-1→UPDATE per request (app.py:2251-2256); MERGE this
    into the accounts table per batch."""
    return admitted_requests.groupBy(company_col).agg(F.count("*").alias("credits_used"))
