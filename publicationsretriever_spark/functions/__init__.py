"""Scalar/column-level functions: URL algebra, filter battery, mime and
retry classification. Everything here is either a native Catalyst column
expression (regexp_*, when-chains — JVM-side, codegen'd) or a vectorized
Arrow UDF (full RFC-3986 canonicalization only)."""
