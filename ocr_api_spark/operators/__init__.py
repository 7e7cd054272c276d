"""Spark operators: Arrow-batched UDF stages and distributed text ops."""
