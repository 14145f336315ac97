"""Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the data-processing capabilities of
Log-Tools/commerce-logs-pipeline (reference at /root/reference, read-only)
expressed as idiomatic ``ray.data.Dataset`` pipelines over zero-copy Arrow
batches. See SURVEY.md for the structural analysis and the mapping of every
reference operator to its Ray Data expression.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, CLI, or test fixture).
"""

__version__ = "0.1.0"
