"""Relational operator library (SURVEY.md §2).

Each module groups one operator family; every public function is a
pure DataFrame→DataFrame transform (or a (spark, sf_dir)→DataFrame
query wrapper in ``registry.py``), so Catalyst sees one declarative
plan end-to-end.
"""
