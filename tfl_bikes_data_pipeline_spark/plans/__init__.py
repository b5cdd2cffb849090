"""Pipeline builders and the analyst query surface.

Each module re-expresses one slice of the reference's compute
(``spark/transform_load.py`` stages, ``sql/aggregations.sql`` /
``sql/make_view.sql`` queries) as idiomatic Spark DataFrame/SQL plans
over the synthetic test tables.
"""
