"""Scalar helpers mirroring the reference's per-row utility functions
(SURVEY.md §2.5): HMAC signing (log_analytics output), gzip handled by
writer options, templating in collector_spark.oracle.variable_replace."""

from collector_spark.functions.signing import hmac_sha256_b64, log_analytics_signature  # noqa: F401
