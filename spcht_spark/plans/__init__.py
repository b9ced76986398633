"""Checkpointed stage plans: the reference's work-order state machine
(/root/reference/Spcht/Core/WorkOrder.py) re-expressed as idempotent
Spark stages writing parquet + a lineage/metrics table."""
