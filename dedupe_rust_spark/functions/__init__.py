"""Scalar/vectorized function library (the engine's "expression" layer).

Pure-Python cores live in textcore/sigcore/scorecore so they are unit-testable
without a SparkSession; the *_udf modules wrap them as Arrow pandas UDFs.
"""
