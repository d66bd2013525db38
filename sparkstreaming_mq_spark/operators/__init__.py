"""Engine operators, one module per SURVEY.md §2 family.

Each public operator is a function ``(spark, sf_dir, **params) ->
DataFrame`` registered in the query/oracle registry; the DataFrame it
returns is a *logical plan* — Catalyst/Tungsten/AQE pick the physical
strategy (SURVEY.md §4: zero custom rules required).
"""
