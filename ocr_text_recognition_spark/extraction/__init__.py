"""Spark-facing extraction layer: HTML main-content heuristics, Arrow-batched
kernel UDFs, the distributed pipeline, salting, checkpointing, metrics."""
