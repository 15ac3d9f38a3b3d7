"""SQL surface for the distance/score functions: Spark 4 SQL UDFs
(``CREATE FUNCTION ... RETURN <expr>``), which inline into the calling
query's plan — whole-stage codegen, no Python, unlike
``spark.udf.register``.

The reference exposes distances only through its Java API
(util/Distances.java:31-153); this gives ``spark.sql`` users the same
kernels with the same semantics (C1-C6 in SURVEY §2.7), including the
zero-norm cosine guard and the L2 score = -distance convention.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
_L2SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
    "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, v) -> acc + v)"
)

_FUNCTIONS: dict[str, str] = {
    "vs_dot": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vs_dot(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN {_DOT.format(a="a", b="b")}
    """,
    "vs_l2_squared": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vs_l2_squared(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN {_L2SQ.format(a="a", b="b")}
    """,
    "vs_l2": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vs_l2(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN sqrt({_L2SQ.format(a="a", b="b")})
    """,
    "vs_norm": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vs_norm(a ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN sqrt({_DOT.format(a="a", b="a")})
    """,
    "vs_cosine": f"""
        CREATE OR REPLACE TEMPORARY FUNCTION vs_cosine(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN CASE
            WHEN sqrt({_DOT.format(a="a", b="a")}) = 0D
              OR sqrt({_DOT.format(a="b", b="b")}) = 0D THEN 0D
            ELSE {_DOT.format(a="a", b="b")}
                 / (sqrt({_DOT.format(a="a", b="a")}) * sqrt({_DOT.format(a="b", b="b")}))
        END
    """,
    # clamped at 0 like distance_for_metric: fp error can put a
    # self-pair's similarity at 1+1ulp, and a raw −2e-16 distance rounds
    # to −0.0 in sign-preserving engines (functions/distances.py)
    "vs_cosine_distance": """
        CREATE OR REPLACE TEMPORARY FUNCTION vs_cosine_distance(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
        RETURNS DOUBLE RETURN greatest(1D - vs_cosine(a, b), 0D)
    """,
}


import weakref

# weak refs: a GC'd session drops out, so a new session that happens to
# reuse the old object's id is never wrongly skipped
_REGISTERED_SESSIONS: "weakref.WeakSet" = weakref.WeakSet()


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the vs_* SQL functions on the session; returns names.
    Safe to call repeatedly — a session THIS module already registered
    is skipped outright, so repeated calls (every workload entry routes
    through here) don't flood driver logs with
    ``SimpleFunctionRegistry`` replace-warnings and real warnings stay
    visible (r12 VERDICT #8). The skip is keyed on the session, not on
    ``functionExists`` (r13 ADVICE): a pre-existing same-named function
    someone else registered must be REPLACED with the canonical
    definition, which CREATE OR REPLACE does."""
    if spark not in _REGISTERED_SESSIONS:
        for ddl in _FUNCTIONS.values():
            spark.sql(ddl)
        _REGISTERED_SESSIONS.add(spark)
    return sorted(_FUNCTIONS)
