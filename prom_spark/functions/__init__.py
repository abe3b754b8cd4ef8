"""Scalar column-expression library (JVM-side, whole-stage-codegen friendly).

Every function here returns a pyspark Column built from built-in
``pyspark.sql.functions`` — no Python UDFs. These are the distributed
re-expressions of the reference's row-at-a-time scalar helpers.

Import from the submodules directly (``prom_spark.functions.text``,
``.similarity``, ``.embedding``) — the package ``__init__`` deliberately
re-exports nothing, so importing one submodule (e.g. ``embedding`` on
the KG hot path) does not drag the others into the process or into the
benchmark code-hash closure (tools/scaling_bench._git_rev).
"""
