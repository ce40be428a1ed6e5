"""Structured Streaming surface (SURVEY.md §2 S — extension; the
reference is batch-only).  Built batch-first: the window/dedup
builders in :mod:`shadems_spark.streaming.windows` take any DataFrame,
so the identical expressions run under ``spark.readStream`` with a
watermark for the streaming path.
"""
