"""Catalog query modules — one per SURVEY.md §2B category.

Importing a module registers its queries in ``rabbithole_spark.catalog``.
"""
